"""Longwave solver vs scalar oracle + analytic limits."""
import numpy as np
import pytest

import oracle
from conftest import RFMIP_VMRS, make_atmosphere
from ecckd_tpu.gases import GasConcs
from ecckd_tpu.models.gas_optics import gas_optics_lw
from ecckd_tpu.optics import OpticalProps1scl, SourceFuncLW
from ecckd_tpu.solvers.lw import rte_lw

SIGMA = 5.670374419e-8


def random_problem(ncol=3, nlay=14, ngpt=8, seed=0):
    rng = np.random.default_rng(seed)
    tau = 10.0 ** rng.uniform(-4, 1, (ncol, nlay, ngpt))
    lay = rng.uniform(0.5, 5.0, (ncol, nlay, ngpt))
    lev = rng.uniform(0.5, 5.0, (ncol, nlay + 1, ngpt))
    sfc = rng.uniform(0.5, 5.0, (ncol, ngpt))
    emis = rng.uniform(0.8, 1.0, (ncol, ngpt))
    src = SourceFuncLW(lay_source=lay, lev_source_inc=lev[:, 1:],
                       lev_source_dec=lev[:, :-1], sfc_source=sfc)
    return tau, src, emis


@pytest.mark.parametrize("n_angles", [1, 2, 3])
def test_lw_vs_oracle(n_angles):
    tau, src, emis = random_problem(seed=n_angles)
    up, dn = rte_lw(OpticalProps1scl(tau=tau), src, emis,
                    n_gauss_angles=n_angles)
    up_ref, dn_ref = oracle.lw_fluxes(
        tau, np.asarray(src.lay_source), np.asarray(src.lev_source_inc),
        np.asarray(src.lev_source_dec), np.asarray(src.sfc_source),
        emis, n_angles=n_angles)
    np.testing.assert_allclose(np.asarray(up), up_ref, rtol=1e-11)
    np.testing.assert_allclose(np.asarray(dn), dn_ref, rtol=1e-11)


def test_lw_tiny_tau_series_branch():
    """Optically thin layers exercise the 2nd-order series expansion."""
    ncol, nlay, ngpt = 2, 6, 4
    tau = np.full((ncol, nlay, ngpt), 1e-9)
    _, src, emis = random_problem(ncol, nlay, ngpt, seed=9)
    up, dn = rte_lw(OpticalProps1scl(tau=tau), src, emis)
    up_ref, dn_ref = oracle.lw_fluxes(
        tau, np.asarray(src.lay_source), np.asarray(src.lev_source_inc),
        np.asarray(src.lev_source_dec), np.asarray(src.sfc_source), emis)
    np.testing.assert_allclose(np.asarray(up), up_ref, rtol=1e-11)
    np.testing.assert_allclose(np.asarray(dn), dn_ref, rtol=1e-11)
    assert np.isfinite(np.asarray(up)).all()


def test_lw_top_at_1_false_matches_flipped():
    tau, src, emis = random_problem(seed=5)
    up_a, dn_a = rte_lw(OpticalProps1scl(tau=tau), src, emis)
    flip = lambda x: np.flip(x, axis=1)
    src_f = SourceFuncLW(lay_source=flip(src.lay_source),
                         lev_source_inc=flip(src.lev_source_dec),
                         lev_source_dec=flip(src.lev_source_inc),
                         sfc_source=src.sfc_source)
    up_b, dn_b = rte_lw(OpticalProps1scl(tau=flip(tau)), src_f, emis,
                        top_at_1=False)
    np.testing.assert_allclose(np.asarray(up_b), flip(np.asarray(up_a)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dn_b), flip(np.asarray(dn_a)),
                               rtol=1e-12)


@pytest.mark.parametrize("n_angles", [1, 3])
def test_lw_isothermal_blackbody_limit(lw_model, n_angles):
    """Isothermal atmosphere + black surface: flux -> pi*B(T) ~ sigma*T^4
    everywhere when optically thick, and exactly at the surface."""
    ncol, nlay = 2, 40
    T = 280.0
    plev = np.broadcast_to(
        np.exp(np.linspace(np.log(1.0), np.log(101300.0), nlay + 1)),
        (ncol, nlay + 1)).copy()
    tlay = np.full((ncol, nlay), T)
    tlev = np.full((ncol, nlay + 1), T)
    tsfc = np.full(ncol, T)
    concs = GasConcs.create(dict(h2o=np.full((ncol, nlay), 2e-2),
                                 co2=4e-4, o2=0.2095))
    props, src = gas_optics_lw(lw_model, plev, tlay, tsfc, concs, tlev)
    emis = np.ones((ncol, lw_model.ngpt))
    up, dn = rte_lw(props, src, emis, n_gauss_angles=n_angles)
    pi_b = float(np.asarray(src.sfc_source).sum(-1)[0] * np.pi)
    assert abs(pi_b - SIGMA * T ** 4) < 0.1  # Planck table integrates to sigma T^4
    np.testing.assert_allclose(np.asarray(up), pi_b, rtol=1e-6)
    # Downwelling approaches pi*B from below as the column becomes opaque;
    # window g-points keep it slightly under.
    dn_sfc = float(np.asarray(dn)[0, -1])
    assert 0.93 * pi_b < dn_sfc <= pi_b * (1 + 1e-6)
    assert abs(float(np.asarray(dn)[0, 0])) < 1e-10  # no incoming LW at TOA


def test_lw_rfmip_like_full_column(lw_model):
    """End-to-end LW on a realistic column vs oracle chain."""
    atm = make_atmosphere(ncol=2, nlay=30, seed=11)
    items = [(g, RFMIP_VMRS[g]) for g in
             ("co2", "ch4", "n2o", "o2", "cfc11", "cfc12")]
    items += [("h2o", atm["h2o"]), ("o3", atm["o3"])]
    concs = GasConcs.create(items)
    props, src = gas_optics_lw(lw_model, atm["plev"], atm["tlay"],
                               atm["tsfc"], concs, atm["tlev"])
    emis = np.full((2, lw_model.ngpt), 0.98)
    up, dn = rte_lw(props, src, emis, n_gauss_angles=3)
    up_ref, dn_ref = oracle.lw_fluxes(
        np.asarray(props.tau), np.asarray(src.lay_source),
        np.asarray(src.lev_source_inc), np.asarray(src.lev_source_dec),
        np.asarray(src.sfc_source), emis, n_angles=3)
    np.testing.assert_allclose(np.asarray(up), up_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dn), dn_ref, rtol=1e-10)
    # Sanity: OLR in a physical range.
    assert 150.0 < float(np.asarray(up)[0, 0]) < 350.0


@pytest.mark.parametrize("n_angles", [1, 2, 3, 4])
def test_lw_inc_flux_transparent_roundtrip(n_angles):
    """Isotropic incident TOA flux through a TRANSPARENT atmosphere must
    come back exactly (not pi times itself) at every level and every
    quadrature order: the solver converts flux -> per-angle radiance
    F/pi and the quadrature reconstructs sum 2*pi*w*(F/pi) = F.
    (Round-5 fix: feeding F directly as the boundary radiance delivered
    pi*F.)"""
    ncol, nlay, ngpt = 3, 6, 4
    rng = np.random.default_rng(11)
    tau = np.zeros((ncol, nlay, ngpt))
    zeros = np.zeros((ncol, nlay, ngpt))
    zlev = np.zeros((ncol, nlay + 1, ngpt))
    src = SourceFuncLW(lay_source=zeros, lev_source_inc=zlev[:, 1:],
                       lev_source_dec=zlev[:, :-1],
                       sfc_source=np.zeros((ncol, ngpt)))
    emis = np.ones((ncol, ngpt))      # black surface: no reflection back up
    inc = rng.uniform(1.0, 10.0, (ncol, ngpt))
    up, dn = rte_lw(OpticalProps1scl(tau=tau), src, emis,
                    n_gauss_angles=n_angles, inc_flux_gpt=inc)
    want = inc.sum(-1)
    np.testing.assert_allclose(np.asarray(dn),
                               want[:, None].repeat(nlay + 1, 1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(up), 0.0, atol=1e-6)
