"""Segment worker for `Library.update_library_recycled`.

Analyzes ONE segment of paths into an existing library database, then
exits — reclaiming every byte the process' PJRT client retained. See
`Library.update_library_recycled` for why recycling exists (some PJRT
transports retain a host copy of every byte ever uploaded for the
client's lifetime; PERF.md §44).

Invoked as:

    python -m bliss_tpu.io.ingest_worker CONFIG_PATH LIST_PATH \
        [--decoder module:ClassName] [--progress]

LIST_PATH is a newline-separated file of song paths (one segment).
The worker runs the ordinary incremental `update_library` on it with
``delete_everything_else=False`` — the parent owns deletions — so a
retried segment re-analyzes only what its first attempt didn't land
(set-difference, reference src/library.rs:1000-1093).
"""

import importlib
import os
import pathlib
import sys


def _apply_env_platform() -> None:
    """Honor JAX_PLATFORMS / JAX_ENABLE_X64 from the environment.

    The sandbox's sitecustomize pre-imports jax and then forces
    ``jax_platforms="axon,cpu"`` via jax.config — so env vars alone are
    ignored in every child process (the same gotcha tests/conftest.py
    handles). Re-apply the caller's intent explicitly: this is what
    keeps CPU-backend test runs of the recycled driver off the
    accelerator."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
    if os.environ.get("JAX_ENABLE_X64", "").lower() in ("1", "true"):
        import jax

        jax.config.update("jax_enable_x64", True)


def _resolve_decoder(spec: str):
    mod_name, _, cls_name = spec.partition(":")
    return getattr(importlib.import_module(mod_name), cls_name)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    config_path, list_path = argv[0], argv[1]
    decoder_cls = None
    if "--decoder" in argv:
        decoder_cls = _resolve_decoder(argv[argv.index("--decoder") + 1])
    show_progress = "--progress" in argv
    gate = None
    if "--gate" in argv:
        gate = argv[argv.index("--gate") + 1]

    _apply_env_platform()
    from ..library import Library

    lib = Library.from_config_path(config_path, decoder_cls)
    paths = [
        line
        for line in pathlib.Path(list_path).read_text().splitlines()
        if line
    ]
    if gate is not None:
        # Pre-spawned overlap (update_library_recycled): this worker was
        # started while the PREVIOUS segment still owns the device, to
        # hide the 10-20 s warm restart behind the previous drain. Do
        # every startup cost now — imports, DB open (above) and, unless
        # opted out, the PJRT client handshake (enumeration only; no
        # upload/execute, so the one-process-executes rule holds) — then
        # idle until the parent signals the device is free.
        import time

        if os.environ.get("BLISS_GATE_PREWARM", "1") != "0":
            import jax

            jax.devices()
        deadline = time.time() + 7200.0
        while not os.path.exists(gate):
            if time.time() > deadline:
                print("ingest worker: gate never opened", file=sys.stderr)
                return 3
            time.sleep(0.2)
    lib.update_library(paths, False, show_progress)
    return 0


if __name__ == "__main__":
    sys.exit(main())
