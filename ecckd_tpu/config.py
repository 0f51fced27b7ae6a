"""Precision policy and global configuration.

The reference chain computes in Fortran double precision (rte-rrtmgp's default
``wp``).  On TPU the fast path is float32; float64 is available for validation
by enabling JAX x64 mode *before* importing anything that builds arrays.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    """Working precision for the compute path."""

    dtype: jnp.dtype

    @property
    def eps(self) -> float:
        return float(jnp.finfo(self.dtype).eps)


F32 = Precision(jnp.dtype(jnp.float32))


def default_precision() -> Precision:
    """float64 when x64 mode is enabled, else float32."""
    if jax.config.read("jax_enable_x64"):
        return Precision(jnp.dtype(jnp.float64))
    return F32


def enable_f64_validation_mode() -> None:
    """Switch JAX to x64 so results can be compared against the Fortran
    double-precision chain.  Call before constructing models."""
    jax.config.update("jax_enable_x64", True)


def set_mxu_precision(mode: str) -> None:
    """Select the fused kernels' MXU contraction mode BEFORE tracing.

    ``bf16x3`` (default): ~f32-exact 3-pass split — the accuracy-faithful
    path.  ``bf16``: 1-pass fast mode, ~1e-4 broadband-flux error (inside
    the ckd models' own 0.05 K/day heating-rate tolerance), ~1.3x faster.
    ``highest``: Mosaic 6-pass f32 (validation experiments).  Equivalent
    to setting ECCKD_MXU_PRECISION before import; this setter also works
    after import as long as no jit trace has happened yet.
    """
    if mode not in ("bf16x3", "bf16", "highest", "default"):
        raise ValueError(f"unknown MXU precision mode: {mode!r}")
    from ecckd_tpu.ops.pallas import common
    common._MXU_MODE = mode
