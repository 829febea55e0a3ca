"""Profiling hooks.

Capability contract (SURVEY §5.1 TPU plan): keep the reference's gtimer-
style phase table (s2p_tpu.utils.timer) and ADD jax.profiler traces plus
per-step compiled-vs-wall accounting — the tools the reference lacks."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """jax.profiler trace scope → TensorBoard-readable artifacts."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def time_compiled_fn(
    fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs
) -> Dict[str, float]:
    """Compile-vs-steady-state timing for a jitted callable.

    Returns {'compile_s', 'steady_s_per_call', 'calls_per_s'}; results are
    materialized via device_get (block_until_ready is not a reliable sync
    on every backend — see bench.py)."""

    def run() -> None:
        out = fn(*args, **kwargs)
        jax.tree_util.tree_map(
            lambda x: jax.device_get(x) if hasattr(x, "dtype") else x, out
        )

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        run()
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    steady = (time.perf_counter() - t0) / iters
    return {
        "compile_s": compile_s,
        "steady_s_per_call": steady,
        "calls_per_s": 1.0 / steady if steady > 0 else float("inf"),
    }
