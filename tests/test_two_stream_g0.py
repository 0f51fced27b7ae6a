"""Unit test for the fused kernels' tau-scaled two-stream helper.

common.two_stream_g0 is the divide-eliminated rescaling of
solvers/two_stream.two_stream specialized to g == 0 (the only case the
ecckd pipeline produces, gas_optics_ecckd.f90:461).  It is pure jnp, so
it can be checked directly against the XLA-path forms over a dense
(tau, ssa, mu0) grid including the edge cases the rescaling must not
break: the conservative limit (ssa -> 1, the k-floor clamp), the
k*mu0 = 1 resonance guard, zero-thickness padded layers (tau == 0), and
optically thick layers.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ecckd_tpu.ops.pallas import common
from ecckd_tpu.solvers.two_stream import two_stream


def _grid():
    tau = np.array([0.0, 1e-12, 1e-8, 1e-6, 1e-3, 0.05, 0.3, 1.0, 5.0,
                    30.0, 300.0], np.float32)
    ssa = np.array([0.0, 1e-6, 0.1, 0.5, 0.9, 0.999, 1.0 - 1e-7, 1.0],
                   np.float32)
    mu0 = np.array([0.05, 0.3, 0.5, 0.86603, 1.0], np.float32)
    tt, ss, mm = np.meshgrid(tau, ssa, mu0, indexing="ij")
    return (tt.ravel().astype(np.float32), ss.ravel().astype(np.float32),
            mm.ravel().astype(np.float32))


def test_two_stream_g0_matches_xla_forms():
    tau, ssa, mu0 = _grid()
    u = (tau * ssa).astype(np.float32)  # tau_ray

    got = common.two_stream_g0(jnp.asarray(tau), jnp.asarray(u),
                               jnp.asarray(mu0),
                               jnp.asarray(1.0 / mu0, jnp.float32))
    # XLA reference: (ncol, nlay, ngpt) shape contract with mu0 (ncol,).
    ref = two_stream(jnp.asarray(tau)[:, None, None],
                     jnp.asarray(ssa)[:, None, None],
                     jnp.zeros_like(jnp.asarray(tau))[:, None, None],
                     jnp.asarray(mu0))
    names = ("r_dif", "t_dif", "r_dir", "t_dir", "t_noscat")
    for name, g, r in zip(names, got, ref):
        g = np.asarray(g).ravel()
        r = np.asarray(r).ravel()
        assert np.isfinite(g).all(), f"{name}: non-finite"
        # All outputs are bounded in [0, 1]-ish; absolute comparison.
        bad = np.abs(g - r) > 5e-5
        assert not bad.any(), (
            f"{name}: max |d| {np.abs(g - r).max():.2e} at "
            f"tau={tau[bad][:4]}, ssa={ssa[bad][:4]}, mu0={mu0[bad][:4]}")


def test_two_stream_g0_zero_thickness_exact():
    """Padded rows (dp == 0 => tau == 0) must give the exact transparent
    layer: T_dif ~ 1, everything else ~ 0, T_noscat == 1."""
    z = jnp.zeros((4,), jnp.float32)
    mu0 = jnp.asarray([0.1, 0.5, 0.9, 1.0], jnp.float32)
    r_dif, t_dif, r_dir, t_dir, t = common.two_stream_g0(
        z, z, mu0, 1.0 / mu0)
    np.testing.assert_array_equal(np.asarray(t), 1.0)
    np.testing.assert_allclose(np.asarray(t_dif), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_dif), 0.0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(r_dir), 0.0)
    np.testing.assert_array_equal(np.asarray(t_dir), 0.0)


def test_two_stream_g0_conservative_closure():
    """Pure scattering (ssa = 1): no absorption, so R_dif + T_dif = 1 to
    f32 roundoff — the cancellation-free property the complement forms
    exist for (docs/DESIGN.md)."""
    tau = jnp.asarray(np.logspace(-6, 1.2, 64), jnp.float32)
    u = tau  # ssa == 1
    mu0 = jnp.full_like(tau, 0.7)
    r_dif, t_dif, r_dir, t_dir, t = common.two_stream_g0(
        tau, u, mu0, 1.0 / mu0)
    closure = np.asarray(r_dif + t_dif)
    np.testing.assert_allclose(closure, 1.0, atol=5e-6)
    # Direct beam: everything not transmitted unscattered is reflected or
    # transmitted diffusely (energy conservation at ssa = 1).
    total = np.asarray(r_dir + t_dir + t)
    np.testing.assert_allclose(total, 1.0, atol=5e-6)
