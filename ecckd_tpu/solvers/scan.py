"""Layer-recurrence primitives for the flux solvers.

The radiative-transfer sweeps are first-order linear recurrences over the
layer axis: x[k+1] = a[k] * x[k] + b[k].  On TPU we evaluate them with
``lax.associative_scan`` over composed affine maps — depth log2(nlay) (~6 for
the 60-layer RFMIP atmosphere) instead of nlay sequential steps, with the
column x g-point axes staying fully vectorized.  The composition
(a2, b2) o (a1, b1) = (a1*a2, a2*b1 + b2) is exact (no divisions, no
cumulative-product underflow tricks).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _compose(c1: Tuple[jax.Array, jax.Array], c2: Tuple[jax.Array, jax.Array]
             ) -> Tuple[jax.Array, jax.Array]:
    a1, b1 = c1
    a2, b2 = c2
    return a1 * a2, a2 * b1 + b2


def affine_scan(a: jax.Array, b: jax.Array, init: jax.Array,
                axis: int) -> jax.Array:
    """All n+1 states of x[k+1] = a[k] * x[k] + b[k] with x[0] = init.

    Args:
      a, b: per-step coefficients with n entries along ``axis``.
      init: initial state (shape of a with ``axis`` removed).
    Returns:
      states with n+1 entries along ``axis`` (x[0] == init first).
    """
    cum_a, cum_b = lax.associative_scan(_compose, (a, b), axis=axis)
    init_e = jnp.expand_dims(init, axis)
    states = cum_a * init_e + cum_b
    return jnp.concatenate([init_e, states], axis=axis)


def affine_scan_reverse(a: jax.Array, b: jax.Array, init: jax.Array,
                        axis: int) -> jax.Array:
    """All n+1 states of x[k] = a[k] * x[k+1] + b[k] with x[n] = init."""
    flip = lambda x: jnp.flip(x, axis=axis)
    return flip(affine_scan(flip(a), flip(b), init, axis))
