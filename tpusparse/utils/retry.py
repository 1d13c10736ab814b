"""Transient-failure detection and retry.

The reference has no failure handling at all (SURVEY.md §5.3 — errors
throw and the process dies). Production TPU jobs see transient runtime
faults (preempted donuts, dropped tunnel connections, compile-service
hiccups) that succeed on retry; this wraps any callable with detection
of *transient* error signatures — permanent errors (shape mismatches,
OOM) re-raise immediately — plus exponential backoff.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence, Tuple, Type

TRANSIENT_SIGNATURES: Tuple[str, ...] = (
    "is not in the list of known backends",  # tunnel dropped mid-session
    "remote_compile",  # compile-service round trip failed
    "HTTP 500",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "Connection reset",
)

PERMANENT_SIGNATURES: Tuple[str, ...] = (
    "Ran out of memory",
    "RESOURCE_EXHAUSTED",
)


def is_transient(exc: BaseException) -> bool:
    msg = str(exc)
    if any(sig in msg for sig in PERMANENT_SIGNATURES):
        return False
    return any(sig in msg for sig in TRANSIENT_SIGNATURES)


def with_retries(
    fn: Callable,
    retries: int = 2,
    backoff_s: float = 1.0,
    exceptions: Sequence[Type[BaseException]] = (Exception,),
    on_retry: Callable[[BaseException, int], None] | None = None,
) -> Callable:
    """Wrap fn so transient runtime faults are retried with backoff.

    Only exceptions matching `is_transient` are retried; anything else
    (and the final failed attempt) propagates unchanged.
    """

    def wrapped(*args, **kwargs):
        attempt = 0
        while True:
            try:
                return fn(*args, **kwargs)
            except tuple(exceptions) as exc:  # noqa: B030
                if attempt >= retries or not is_transient(exc):
                    raise
                if on_retry is not None:
                    on_retry(exc, attempt)
                time.sleep(backoff_s * (2**attempt))
                attempt += 1

    return wrapped
