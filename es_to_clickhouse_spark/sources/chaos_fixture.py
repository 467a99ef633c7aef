"""Deterministic fault injection for the loopback fixtures (VERDICT
r10 item 8): a seeded per-request decision — serve / drop the
connection mid-exchange / serve slowly — shared by the ES, Mongo and
ClickHouse fakes so the chaos tests can drive the drains' partial-rows
+ watermark contracts under repeatable adversity.

Deterministic by construction (md5 of ``seed:counter``): the same seed
replays the same fault schedule, so a chaos failure is a reproducible
test case, not a flake. The counter is process-wide per Chaos instance
and thread-safe — concurrent slices/ranges draw distinct ticks, and
WHICH request draws which fault varies with scheduling, which is
exactly the adversity wanted; what stays fixed is the fault RATE and
the schedule of tick outcomes."""

from __future__ import annotations

import hashlib
import threading
import time


class Chaos:
    """Seeded fault schedule. ``decide()`` returns one of ``"ok"``,
    ``"reset"`` (caller must drop the connection without replying) or
    ``"slow"`` (caller sleeps ``slow_s`` then serves normally)."""

    def __init__(
        self,
        seed: str,
        reset_prob: float = 0.0,
        slow_prob: float = 0.0,
        slow_s: float = 0.05,
        immune: int = 0,
    ):
        self.seed = seed
        self.reset_prob = reset_prob
        self.slow_prob = slow_prob
        self.slow_s = slow_s
        self.immune = immune  # first N requests always healthy
        self._n = 0
        self._lock = threading.Lock()
        self.faults = 0  # observability: how many non-ok decisions fired

    def decide(self) -> str:
        with self._lock:
            n = self._n
            self._n += 1
        if n < self.immune:
            return "ok"
        u = (
            int(
                hashlib.md5(f"{self.seed}:{n}".encode()).hexdigest()[:8], 16
            )
            / 0xFFFFFFFF
        )
        if u < self.reset_prob:
            with self._lock:
                self.faults += 1
            return "reset"
        if u < self.reset_prob + self.slow_prob:
            with self._lock:
                self.faults += 1
            return "slow"
        return "ok"

    def maybe_sleep(self) -> None:
        time.sleep(self.slow_s)
