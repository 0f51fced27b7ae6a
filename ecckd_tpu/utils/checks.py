"""Numerical-safety checks (SURVEY.md section 5.2).

The reference's closest analogue is the CI debug build flags
(-fbounds-check -finit-real=nan, continuous-integration.yml:15).  Here:

* ``validate_inputs`` — host-side fail-fast checks of physical ranges,
  mirroring the fail-fast ``stop_on_err`` error model
  (mo_simple_netcdf.F90:331-339);
* ``assert_all_finite`` — device-side finiteness guard usable under jit
  (jax.debug-based), plus NaN debugging via ``enable_nan_debugging``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class InputValidationError(ValueError):
    pass


def validate_inputs(plev: np.ndarray, tlay: np.ndarray,
                    tlev: Optional[np.ndarray] = None,
                    press_min: Optional[float] = None,
                    press_max: Optional[float] = None) -> None:
    """Fail fast on unphysical driver inputs (host-side, pre-jit)."""
    plev = np.asarray(plev)
    tlay = np.asarray(tlay)
    if plev.ndim != 2 or tlay.ndim != 2 or plev.shape[1] != tlay.shape[1] + 1:
        raise InputValidationError(
            f"plev must be (ncol, nlay+1) and tlay (ncol, nlay); got "
            f"{plev.shape} and {tlay.shape}")
    if not np.isfinite(plev).all() or not np.isfinite(tlay).all():
        raise InputValidationError("non-finite pressures or temperatures")
    dp = np.diff(plev, axis=1)
    if not ((dp > 0).all() or (dp < 0).all()):
        raise InputValidationError(
            "level pressures must be strictly monotonic in the same "
            "direction for every column")
    if (tlay <= 0).any():
        raise InputValidationError("non-positive layer temperatures")
    if tlev is not None and (np.asarray(tlev) <= 0).any():
        raise InputValidationError("non-positive level temperatures")
    # Tolerance: one f32 ulp of press_min, NOT a fixed 1e-12 relative —
    # clamp_top_pressure stores press_min + eps into an f32 array, and in
    # binades where the f32 ulp exceeds 2*eps the stored value legally
    # rounds up to 0.5 ulp BELOW press_min; a 1e-12 tolerance would then
    # reject inputs the clamp itself produced.
    if press_min is not None:
        floor = np.float64(np.nextafter(np.float32(press_min),
                                        np.float32(0.0)))
        if plev.min() < floor:
            raise InputValidationError(
                f"pressure {plev.min():g} Pa below table minimum "
                f"{press_min:g} Pa; apply clamp_top_pressure first")
    if press_max is not None and plev.max() > press_max * (1 + 0.25):
        raise InputValidationError(
            f"pressure {plev.max():g} Pa far above table maximum "
            f"{press_max:g} Pa")


def assert_all_finite(x: jax.Array, name: str = "array") -> jax.Array:
    """Jit-compatible finiteness check via debug callback.

    NOTE the async contract: under jit the callback runs on the host
    AFTER dispatch returns, so the FloatingPointError surfaces at a
    LATER synchronization point (typically wrapped in an
    XlaRuntimeError), not at the call site — a local
    ``try/except FloatingPointError`` around the jitted call will NOT
    catch it.  Use this as a loud tripwire, not a control-flow guard;
    for eager/host-side guards use ``np.isfinite`` directly, and for
    op-level localization use ``enable_nan_debugging``."""
    ok = jnp.isfinite(x).all()

    def _report(ok_val):
        if not ok_val:
            raise FloatingPointError(f"non-finite values in {name}")

    jax.debug.callback(_report, ok)
    return x


def enable_nan_debugging() -> None:
    """Turn on JAX NaN checking (equivalent of -finit-real=nan poisoning):
    every op result is checked and errors at the producing op."""
    jax.config.update("jax_debug_nans", True)
