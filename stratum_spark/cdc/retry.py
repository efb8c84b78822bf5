"""Retry policy + circuit breaker around epoch application.

Mirrors the reference's reliability pair: RetryPolicy (fixed attempts,
exponential backoff -- crates/engine-processing/src/retry.rs, 110 LoC) and
CircuitBreaker (opens after 4 consecutive failures, backoff 1s -> 30s cap --
crates/engine-processing/src/cb.rs, docs/architecture.md:177-180).

Because the lake commit is atomic and epoch-idempotent, a failed/partial
apply can always be retried blindly: either the epoch committed (replay is
skipped) or it did not (replay redoes it) -- stratum's resume rules
collapsed onto one retry wrapper.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


class CircuitOpen(RuntimeError):
    pass


@dataclass
class CircuitBreaker:
    failure_threshold: int = 4
    base_backoff_s: float = 1.0
    max_backoff_s: float = 30.0
    consecutive_failures: int = 0
    open_until: float = 0.0
    sleep: Callable[[float], None] = field(default=time.sleep)

    def check(self) -> None:
        now = time.monotonic()
        if self.consecutive_failures >= self.failure_threshold and now < self.open_until:
            raise CircuitOpen(
                f"circuit open for {self.open_until - now:.1f}s after "
                f"{self.consecutive_failures} consecutive failures"
            )

    def record_success(self) -> None:
        self.consecutive_failures = 0
        self.open_until = 0.0

    def record_failure(self) -> None:
        self.consecutive_failures += 1
        backoff = min(
            self.max_backoff_s, self.base_backoff_s * (2 ** (self.consecutive_failures - 1))
        )
        self.open_until = time.monotonic() + backoff


def with_retry(
    fn: Callable[[], object],
    attempts: int = 3,
    base_backoff_s: float = 0.2,
    breaker: CircuitBreaker | None = None,
    retryable: tuple[type[Exception], ...] = (Exception,),
) -> object:
    """Run fn with bounded retries + exponential backoff, consulting the
    circuit breaker. Raises the last error (or CircuitOpen)."""
    last: Exception | None = None
    for attempt in range(attempts):
        if breaker is not None:
            breaker.check()
        try:
            out = fn()
            if breaker is not None:
                breaker.record_success()
            return out
        except CircuitOpen:
            raise
        except retryable as e:  # noqa: PERF203
            last = e
            if breaker is not None:
                breaker.record_failure()
            if attempt < attempts - 1:
                (breaker.sleep if breaker is not None else time.sleep)(
                    base_backoff_s * (2**attempt)
                )
    assert last is not None
    raise last
