"""Tracing / profiling utilities (SURVEY.md section 5.1).

The reference has no profiling at all (timing intent only hinted in a
comment, ecckd_rfmip_sw.F90:104-105); here we provide wall timers bracketed
by ``block_until_ready``, a jax.profiler trace context for TensorBoard-
compatible device traces, and a throughput meter for the columns/sec metric.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Iterator, Optional

import jax


@dataclasses.dataclass
class Timing:
    label: str
    seconds: float

    @property
    def ms(self) -> float:
        return self.seconds * 1e3


@contextlib.contextmanager
def device_timer(label: str, result_holder: Optional[list] = None
                 ) -> Iterator[None]:
    """Wall timer that waits for all pending device work at exit."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        (jax.effects_barrier if hasattr(jax, "effects_barrier")
         else (lambda: None))()
        dt = time.perf_counter() - t0
        if result_holder is not None:
            result_holder.append(Timing(label, dt))


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Steady-state seconds/call of a jitted function (post-compile)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def throughput_metrics(ncol: int, seconds_per_step: float,
                       n_devices: int = 1) -> Dict[str, float]:
    cols_per_sec = ncol / seconds_per_step
    return {
        "columns_per_sec": cols_per_sec,
        "columns_per_sec_per_chip": cols_per_sec / max(n_devices, 1),
        "step_ms": seconds_per_step * 1e3,
    }
