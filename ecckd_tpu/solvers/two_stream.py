"""Two-stream layer reflectance/transmittance (shortwave).

Meador & Weaver (1980) two-stream solutions with Zdunkowski PIFM coupling
coefficients — the standard formulation used by the external ``rte_sw``
solver whose behavior the reference depends on (SURVEY.md section 2.3).
Computes, per (column, layer, g-point):

  Rdif, Tdif   : reflectance/transmittance for diffuse incidence
  Rdir, Tdir   : reflectance / *diffuse* transmittance for direct incidence
  Tnoscat      : direct-beam transmittance exp(-tau/mu0)

All expressions are elementwise (VPU work); the layer-coupling recurrences
live in solvers/sw.py.  Energy-safety clamps keep Rdir + Tdir + Tnoscat <= 1
so single-precision rounding cannot create energy.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TwoStream(NamedTuple):
    r_dif: jax.Array
    t_dif: jax.Array
    r_dir: jax.Array
    t_dir: jax.Array
    t_noscat: jax.Array


def two_stream(tau: jax.Array, ssa: jax.Array, g: jax.Array,
               mu0: jax.Array) -> TwoStream:
    """Args: tau/ssa/g (ncol, nlay, ngpt); mu0 (ncol,) cosine zenith angle."""
    dtype = tau.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    mu0b = mu0[:, None, None]

    # Zdunkowski practical-improved-flux-method coupling coefficients.
    gamma1 = (8.0 - ssa * (5.0 + 3.0 * g)) * 0.25
    gamma2 = 3.0 * (ssa * (1.0 - g)) * 0.25
    gamma3 = (2.0 - 3.0 * mu0b * g) * 0.25
    gamma4 = 1.0 - gamma3
    alpha1 = gamma1 * gamma4 + gamma2 * gamma3
    alpha2 = gamma1 * gamma3 + gamma2 * gamma4

    k = jnp.sqrt(jnp.maximum((gamma1 - gamma2) * (gamma1 + gamma2), 1e-12))
    exp_mktau = jnp.exp(-k * tau)
    exp_m2ktau = exp_mktau * exp_mktau

    # Diffuse R/T, written to avoid cancellation between k and gamma1 terms.
    rt_term = 1.0 / (k * (1.0 + exp_m2ktau) + gamma1 * (1.0 - exp_m2ktau))
    r_dif = rt_term * gamma2 * (1.0 - exp_m2ktau)
    t_dif = rt_term * 2.0 * k * exp_mktau

    t_noscat = jnp.exp(-tau / mu0b)

    # Direct-beam R / diffuse-T (Meador-Weaver eqs 14-15), with the resonance
    # denominator 1 - (k*mu0)^2 guarded against division by ~0.
    k_mu = k * mu0b
    k_g3 = k * gamma3
    k_g4 = k * gamma4
    denom = 1.0 - k_mu * k_mu
    denom = jnp.where(jnp.abs(denom) >= eps, denom, eps)
    rt2 = ssa * rt_term / denom
    r_dir = rt2 * ((1.0 - k_mu) * (alpha2 + k_g3)
                   - (1.0 + k_mu) * (alpha2 - k_g3) * exp_m2ktau
                   - 2.0 * (k_g3 - alpha2 * k_mu) * exp_mktau * t_noscat)
    t_dir = -rt2 * ((1.0 + k_mu) * (alpha1 + k_g4) * t_noscat
                    - (1.0 - k_mu) * (alpha1 - k_g4) * exp_m2ktau * t_noscat
                    - 2.0 * (k_g4 + alpha1 * k_mu) * exp_mktau)

    # Energy safety: the direct beam is either reflected, transmitted
    # unscattered, or transmitted diffusely; the rest is absorbed.
    r_dir = jnp.clip(r_dir, 0.0, 1.0 - t_noscat)
    t_dir = jnp.clip(t_dir, 0.0, 1.0 - t_noscat - r_dir)

    return TwoStream(r_dif=r_dif, t_dif=t_dif, r_dir=r_dir, t_dir=t_dir,
                     t_noscat=t_noscat)
