"""`utils/retry.py` — transient-only retry policy for the tunneled
transport (used by the batch driver's dispatch and the analyzer's
remote-compile path).

The soak's --inject-wedge flag exercises the same policy end-to-end
through `analyze_paths_batched`; these are the fast unit-level checks
of the classification and the retry/raise semantics.
"""

import pytest

from bliss_tpu.utils.retry import is_transient_error, retry_transient


@pytest.mark.parametrize(
    "msg",
    [
        "response body closed before all bytes were read",
        "gRPC error: UNAVAILABLE: connection reset by peer",
        "DATA_LOSS: truncated stream",
        "deadline exceeded while awaiting response",
        "transport is closing",
        "remote_compile RPC failed",
    ],
)
def test_transient_markers(msg):
    assert is_transient_error(RuntimeError(msg))


@pytest.mark.parametrize(
    "msg",
    [
        "Invalid argument: incompatible shapes for dot",
        "RESOURCE_EXHAUSTED: out of memory allocating 8G",
        "error: unsupported operand",
        "",
    ],
)
def test_deterministic_errors_not_transient(msg):
    assert not is_transient_error(ValueError(msg))


def test_retry_recovers_from_transient(monkeypatch):
    import bliss_tpu.utils.retry as retry_mod

    sleeps = []
    monkeypatch.setattr(retry_mod.time, "sleep", sleeps.append)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("connection reset mid-flight")
        return "ok"

    assert retry_transient(flaky, attempts=3) == "ok"
    assert calls["n"] == 3
    assert len(sleeps) == 2  # slept between tries, linear backoff
    assert sleeps[1] > sleeps[0]


def test_retry_raises_deterministic_immediately(monkeypatch):
    import bliss_tpu.utils.retry as retry_mod

    monkeypatch.setattr(
        retry_mod.time,
        "sleep",
        lambda s: pytest.fail("must not sleep on deterministic errors"),
    )
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("incompatible shapes")

    with pytest.raises(ValueError):
        retry_transient(broken, attempts=3)
    assert calls["n"] == 1  # no retries masked the real error


def test_retry_exhausts_then_raises(monkeypatch):
    import bliss_tpu.utils.retry as retry_mod

    monkeypatch.setattr(retry_mod.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def always_down():
        calls["n"] += 1
        raise RuntimeError("UNAVAILABLE: socket closed")

    with pytest.raises(RuntimeError, match="socket closed"):
        retry_transient(always_down, attempts=3)
    assert calls["n"] == 3
