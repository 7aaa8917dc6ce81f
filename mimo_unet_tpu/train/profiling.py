"""Profiling / tracing utilities.

The reference's only performance tooling is CUDA-event timing in
measure_inference_speed.py (reference :25-47).  TPU-native equivalents:
``jax.profiler`` traces (viewable in TensorBoard/Perfetto), XLA cost
analysis (FLOPs / bytes per compiled step), and a throughput meter built on
the relay-safe differential timing protocol (see bench.py — on some PJRT
relays ``block_until_ready`` returns before execution finishes).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace around a block of work."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *example_args) -> Dict[str, float]:
    """FLOPs / bytes of the compiled ``fn`` at the example shapes."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    ca = compiled.cost_analysis() or {}
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }


def timed_per_exec(
    fn: Callable,
    *args,
    reps: int = 20,
    materialize: Optional[Callable] = None,
) -> float:
    """Seconds per execution via the differential protocol.

    ``fn`` should return something cheap to materialize (a scalar is best);
    ``materialize`` defaults to ``float`` on the result.
    """
    mat = materialize or (lambda r: float(r))
    mat(fn(*args))  # compile + warm

    def run_k(k: int) -> float:
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        mat(r)
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def throughput_report(fn: Callable, *args, batch_size: int, reps: int = 20) -> dict:
    """Per-exec seconds, items/sec, and achieved FLOP/s + bytes/s."""
    per_exec = timed_per_exec(fn, *args, reps=reps)
    costs = cost_analysis(fn, *args)
    return {
        "sec_per_exec": per_exec,
        "items_per_sec": batch_size / per_exec,
        "tflops_per_sec": costs["flops"] / per_exec / 1e12,
        "gbytes_per_sec": costs["bytes_accessed"] / per_exec / 1e9,
    }
