"""Tracing / profiling utilities (SURVEY.md section 5.1).

The reference has no profiling at all (timing intent only hinted in a
comment, ecckd_rfmip_sw.F90:104-105); here we provide wall timers with a
VALUE-FETCH completion barrier, a jax.profiler trace context for
TensorBoard-compatible device traces, and a throughput meter for the
columns/sec metric.

Completion barriers: on the relayed dev-TPU transport,
``jax.block_until_ready`` can return before the device has actually
executed (bench.py documents the measured case; CLAUDE.md hard-won
rule), and ``jax.effects_barrier`` only awaits EFFECTFUL computations
(callbacks/debug prints), not pure jitted work.  The only reliable
barrier is FETCHING A VALUE derived from the outputs — ``barrier_fetch``
below — which is what every timer here uses.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def barrier_fetch(outputs) -> float:
    """Device-completion barrier: fetch one element of every array leaf
    of ``outputs`` to the host and combine them.  The transfer cannot
    complete before the computation defining each buffer has executed,
    so this bounds the device work — unlike ``block_until_ready`` on the
    relayed transport (can return early) or ``jax.effects_barrier``
    (pure computations are not effects and are not awaited)."""
    acc = 0.0
    for leaf in jax.tree_util.tree_leaves(outputs):
        if hasattr(leaf, "ravel"):
            acc += float(np.asarray(jax.device_get(leaf.ravel()[0])))
    return acc


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
    """Wall timer for a block of device work.

    The block MUST end with a value fetch of its outputs (e.g.
    ``barrier_fetch(out)`` or ``float(out[...])``) — a context manager
    cannot see the block's outputs, and no output-blind barrier exists
    that awaits pure jitted computations (see the module docstring), so
    the timer itself only measures the host span of the block."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
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
    """Steady-state seconds/call of a jitted function (post-compile).
    Uses the value-fetch barrier (module docstring): block_until_ready
    under-measures on the relayed chip transport."""
    for _ in range(warmup):
        barrier_fetch(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    barrier_fetch(out)
    return (time.perf_counter() - t0) / iters


def throughput_metrics(ncol: int, seconds_per_step: float,
                       n_devices: int = 1) -> Dict[str, float]:
    cols_per_sec = ncol / seconds_per_step
    return {
        "columns_per_sec": cols_per_sec,
        "columns_per_sec_per_chip": cols_per_sec / max(n_devices, 1),
        "step_ms": seconds_per_step * 1e3,
    }
