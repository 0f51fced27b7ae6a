"""Shortwave solver vs scalar oracle + conservation/analytic limits."""
import numpy as np
import pytest

import oracle
from conftest import RFMIP_VMRS, make_atmosphere
from ecckd_tpu.gases import GasConcs
from ecckd_tpu.models.gas_optics import gas_optics_sw
from ecckd_tpu.optics import OpticalProps2str
from ecckd_tpu.solvers.sw import rte_sw
from ecckd_tpu.solvers.two_stream import two_stream


def random_problem(ncol=3, nlay=12, ngpt=6, seed=0, g_max=0.0):
    rng = np.random.default_rng(seed)
    tau = 10.0 ** rng.uniform(-4, 0.5, (ncol, nlay, ngpt))
    ssa = rng.uniform(0.0, 1.0, (ncol, nlay, ngpt))
    g = rng.uniform(0.0, g_max, (ncol, nlay, ngpt))
    mu0 = rng.uniform(0.2, 1.0, ncol)
    toa = rng.uniform(5.0, 50.0, (ncol, ngpt))
    alb_dir = rng.uniform(0.0, 0.6, (ncol, ngpt))
    alb_dif = rng.uniform(0.0, 0.6, (ncol, ngpt))
    return tau, ssa, g, mu0, toa, alb_dir, alb_dif


@pytest.mark.parametrize("seed,g_max", [(0, 0.0), (1, 0.0), (2, 0.85)])
def test_sw_vs_oracle(seed, g_max):
    tau, ssa, g, mu0, toa, a_dir, a_dif = random_problem(seed=seed,
                                                         g_max=g_max)
    up, dn, dirf = rte_sw(OpticalProps2str(tau=tau, ssa=ssa, g=g), mu0, toa,
                          a_dir, a_dif)
    up_ref, dn_ref, dir_ref = oracle.sw_fluxes(tau, ssa, g, mu0, toa,
                                               a_dir, a_dif)
    np.testing.assert_allclose(np.asarray(up), up_ref, rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(dn), dn_ref, rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(dirf), dir_ref, rtol=1e-10)


def test_two_stream_energy_partition():
    """For each layer: Rdir + Tdir + Tnoscat <= 1 (rest absorbed), and
    conservative scattering (ssa=1) absorbs nothing."""
    tau, ssa, g, mu0, *_ = random_problem(seed=3)
    ts = two_stream(tau, ssa, g, mu0)
    total = np.asarray(ts.r_dir + ts.t_dir + ts.t_noscat)
    assert (total <= 1.0 + 1e-12).all()
    ts1 = two_stream(tau, np.ones_like(ssa), g, mu0)
    total1 = np.asarray(ts1.r_dir + ts1.t_dir + ts1.t_noscat)
    np.testing.assert_allclose(total1, 1.0, atol=5e-7)
    tdif_sum = np.asarray(ts1.r_dif + ts1.t_dif)
    np.testing.assert_allclose(tdif_sum, 1.0, atol=5e-7)


def test_sw_conservative_atmosphere_no_absorption():
    """Pure scattering (ssa=1): net in == net out at TOA with non-reflecting
    surface accounted for."""
    ncol, nlay, ngpt = 2, 10, 4
    rng = np.random.default_rng(4)
    tau = 10.0 ** rng.uniform(-3, 0, (ncol, nlay, ngpt))
    ssa = np.ones_like(tau)
    g = np.zeros_like(tau)
    mu0 = np.array([0.9, 0.4])
    toa = np.full((ncol, ngpt), 100.0)
    alb = np.zeros((ncol, ngpt))
    up, dn, _ = rte_sw(OpticalProps2str(tau=tau, ssa=ssa, g=g), mu0, toa,
                       alb, alb)
    up, dn = np.asarray(up), np.asarray(dn)
    # Energy budget: TOA_dn - TOA_up = surface absorption (alb=0 -> sfc_dn).
    np.testing.assert_allclose(dn[:, 0] - up[:, 0], dn[:, -1] - up[:, -1],
                               rtol=1e-6)
    np.testing.assert_allclose(up[:, -1], 0.0, atol=1e-9)


def test_sw_conservative_f32_energy_closure():
    """Conservative limit at SINGLE precision: pure scattering over a
    perfectly reflecting surface returns all energy to space.  The naive
    Meador-Weaver forms lose ~eps/(k*tau) here (a 2% f32 energy error);
    the complement/expm1 regrouping in solvers/two_stream.py must hold
    closure to a few f32 ulps."""
    ncol, nlay, ngpt = 4, 30, 8
    rng = np.random.default_rng(9)
    f32 = np.float32
    tau = (10.0 ** rng.uniform(-5, -0.5, (ncol, nlay, ngpt))).astype(f32)
    ssa = np.ones_like(tau)
    g = np.zeros_like(tau)
    mu0 = np.array([1.0, 0.7, 0.3, 0.05], f32)
    toa = np.full((ncol, ngpt), 100.0, f32)
    alb = np.ones((ncol, ngpt), f32)
    up, dn, _ = rte_sw(OpticalProps2str(tau=tau, ssa=ssa, g=g), mu0, toa,
                       alb, alb)
    up, dn = np.asarray(up), np.asarray(dn)
    assert up.dtype == np.float32
    np.testing.assert_allclose(up[:, 0], dn[:, 0], rtol=2e-6)


def test_sw_vacuum_beam():
    """tau -> 0: direct beam passes through untouched; no diffuse."""
    ncol, nlay, ngpt = 2, 8, 3
    tau = np.full((ncol, nlay, ngpt), 1e-12)
    ssa = np.full_like(tau, 0.5)
    g = np.zeros_like(tau)
    mu0 = np.array([1.0, 0.5])
    toa = np.full((ncol, ngpt), 200.0)
    alb = np.zeros((ncol, ngpt))
    up, dn, dirf = rte_sw(OpticalProps2str(tau=tau, ssa=ssa, g=g), mu0, toa,
                          alb, alb)
    expect = mu0[:, None] * 200.0 * ngpt
    np.testing.assert_allclose(np.asarray(dn), expect[:, None].repeat(
        nlay + 1, 1).reshape(ncol, nlay + 1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(up), 0.0, atol=1e-6)


def test_sw_top_at_1_false_matches_flipped():
    tau, ssa, g, mu0, toa, a_dir, a_dif = random_problem(seed=6)
    up_a, dn_a, dir_a = rte_sw(OpticalProps2str(tau=tau, ssa=ssa, g=g), mu0,
                               toa, a_dir, a_dif)
    flip = lambda x: np.flip(x, axis=1)
    up_b, dn_b, dir_b = rte_sw(
        OpticalProps2str(tau=flip(tau), ssa=flip(ssa), g=flip(g)), mu0, toa,
        a_dir, a_dif, top_at_1=False)
    np.testing.assert_allclose(np.asarray(up_b), flip(np.asarray(up_a)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dn_b), flip(np.asarray(dn_a)),
                               rtol=1e-12)


def test_sw_rfmip_like_full_column(sw_model):
    """End-to-end SW with gas optics + TSI renormalization vs oracle."""
    atm = make_atmosphere(ncol=2, nlay=30, seed=12)
    items = [(g, RFMIP_VMRS[g]) for g in ("co2", "ch4", "n2o", "o2")]
    items += [("h2o", atm["h2o"]), ("o3", atm["o3"])]
    concs = GasConcs.create(items)
    props, toa = gas_optics_sw(sw_model, atm["plev"], atm["tlay"], concs)
    # Driver-side TSI renormalization (ecckd_rfmip_sw.F90:125-133).
    tsi_target = 1361.0
    toa = np.asarray(toa)
    toa = toa * tsi_target / toa.sum(-1, keepdims=True)
    mu0 = np.array([0.86, 0.35])
    alb = np.full((2, sw_model.ngpt), 0.07)
    up, dn, dirf = rte_sw(props, mu0, toa, alb, alb)
    up_ref, dn_ref, dir_ref = oracle.sw_fluxes(
        np.asarray(props.tau), np.asarray(props.ssa), np.asarray(props.g),
        mu0, toa, alb, alb)
    np.testing.assert_allclose(np.asarray(up), up_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(dn), dn_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(dn)[:, 0], mu0 * tsi_target,
                               rtol=1e-9)


def test_sw_night_columns_zero_not_nan():
    """mu0 <= 0 (sun below the horizon, a routine real-sky input) must
    return ZERO fluxes, not the Inf/NaN the tau/mu0 exponentials would
    produce; day columns in the same batch are unaffected."""
    tau, ssa, g, mu0, toa, a_dir, a_dif = random_problem(seed=12)
    day_up, day_dn, day_dir = rte_sw(
        OpticalProps2str(tau=tau, ssa=ssa, g=g), mu0, toa, a_dir, a_dif)
    mu0_mixed = mu0.copy()
    mu0_mixed[0] = 0.0
    mu0_mixed[1] = -0.17      # ~100 degree zenith
    up, dn, dirf = rte_sw(OpticalProps2str(tau=tau, ssa=ssa, g=g),
                          mu0_mixed, toa, a_dir, a_dif)
    for arr in (up, dn, dirf):
        assert np.isfinite(np.asarray(arr)).all()
        np.testing.assert_array_equal(np.asarray(arr)[:2], 0.0)
    # Remaining (day) columns bitwise-match the all-day run.
    np.testing.assert_array_equal(np.asarray(up)[2:],
                                  np.asarray(day_up)[2:])
    np.testing.assert_array_equal(np.asarray(dn)[2:],
                                  np.asarray(day_dn)[2:])
