"""Phase timers.

The reference stamps every loop phase with gtimer (`evaluation sampling`,
`exploration sampling`, `data storing`, `training`, `saving`, `logging` —
rlkit/core/batch_rl_algorithm.py:110-143) and aggregates them into
``time/<phase> (s)`` epoch columns (rlkit/core/rl_algorithm.py:12-22), plus a
standalone start/stop Timer (rlkit/core/timer.py:6-51). We provide both,
without the gtimer dependency, and add a `jax.block_until_ready`-aware stamp
for honest on-device timings.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from contextlib import contextmanager
from typing import Any, Dict, Iterator


class PhaseTimer:
    """Accumulates wall-time per named phase within an epoch."""

    def __init__(self) -> None:
        self._epoch_times: "OrderedDict[str, float]" = OrderedDict()
        self._total_times: "OrderedDict[str, float]" = OrderedDict()
        self._last_stamp = time.monotonic()
        self._epoch_start = self._last_stamp
        self._run_start = self._last_stamp

    def stamp(self, phase: str, sync: Any = None) -> float:
        """Charge the time since the previous stamp to ``phase``.

        Pass a jax array/pytree as ``sync`` to block on async dispatch first,
        so device work is charged to the phase that launched it.
        """
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        now = time.monotonic()
        dt = now - self._last_stamp
        self._last_stamp = now
        self._epoch_times[phase] = self._epoch_times.get(phase, 0.0) + dt
        self._total_times[phase] = self._total_times.get(phase, 0.0) + dt
        return dt

    @contextmanager
    def phase(self, name: str) -> Iterator[None]:
        self._last_stamp = time.monotonic()
        try:
            yield
        finally:
            self.stamp(name)

    def end_epoch(self) -> Dict[str, float]:
        """Return the `time/` columns for this epoch and reset epoch counters.

        Layout mirrors rlkit/core/rl_algorithm.py:12-22.
        """
        now = time.monotonic()
        out: "OrderedDict[str, float]" = OrderedDict()
        for phase, t in self._epoch_times.items():
            out[f"time/{phase} (s)"] = t
        out["time/epoch (s)"] = now - self._epoch_start
        out["time/total (s)"] = now - self._run_start
        self._epoch_times.clear()
        self._epoch_start = now
        self._last_stamp = now
        return out

    def totals(self) -> Dict[str, float]:
        return dict(self._total_times)


class Timer:
    """Simple start/stop timer (reference: rlkit/core/timer.py:6-51)."""

    def __init__(self, return_global_times: bool = False) -> None:
        self.return_global_times = return_global_times
        self.reset()

    def reset(self) -> None:
        self.stamps: "OrderedDict[str, float]" = OrderedDict()
        self.global_stamps: "OrderedDict[str, float]" = OrderedDict()
        self._start: Dict[str, float] = {}
        self.epoch_start = time.monotonic()
        self.global_start = self.epoch_start

    def start_timer(self, name: str, unique: bool = True) -> None:
        if unique:
            assert name not in self._start, f"timer {name!r} already running"
        self._start[name] = time.monotonic()

    def stop_timer(self, name: str) -> float:
        dt = time.monotonic() - self._start.pop(name)
        self.stamps[name] = self.stamps.get(name, 0.0) + dt
        self.global_stamps[name] = self.global_stamps.get(name, 0.0) + dt
        return dt

    def get_times(self) -> Dict[str, float]:
        times = dict(self.stamps)
        times["epoch_time"] = time.monotonic() - self.epoch_start
        if self.return_global_times:
            times.update({f"global/{k}": v for k, v in self.global_stamps.items()})
            times["global/total_time"] = time.monotonic() - self.global_start
        return times

    def start_epoch(self) -> None:
        self.stamps.clear()
        self.epoch_start = time.monotonic()
