"""Retry policy for the tunneled-TPU transport.

The axon tunnel's remote-compile/execute path occasionally drops a
connection mid-flight (observed: "response body closed before all bytes
were read", gRPC UNAVAILABLE/DATA_LOSS). Those are worth retrying on a
fresh dispatch; everything else (shape errors, XLA compile errors, OOM)
is deterministic and must surface immediately — re-running it three
times with sleeps only masks the real error and triples its latency.
"""

from __future__ import annotations

import time

#: Substrings seen in transient tunnel/transport failures. Deliberately
#: message-based: the exceptions arrive as jaxlib.XlaRuntimeError (one
#: type for everything), so the class alone cannot discriminate.
_TRANSIENT_MARKERS = (
    "response body closed",
    "connection reset",
    "connection refused",
    "connection closed",
    "broken pipe",
    "unavailable",
    "data_loss",
    "deadline exceeded",
    "socket closed",
    "transport",
    "remote_compile",
)


def is_transient_error(exc: BaseException) -> bool:
    msg = str(exc).lower()
    return any(marker in msg for marker in _TRANSIENT_MARKERS)


def retry_transient(fn, attempts: int = 3, base_sleep: float = 1.0):
    """Run `fn()`; retry only transient transport errors, up to
    `attempts` total tries with a linear backoff."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:
            if attempt == attempts - 1 or not is_transient_error(exc):
                raise
            time.sleep(base_sleep + attempt)
