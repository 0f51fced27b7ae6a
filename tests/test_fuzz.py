"""Randomized end-to-end equivalence: full pipelines vs the NumPy oracle.

Each trial draws random shapes, a random requested-gas list (random order,
unknown names mixed in), and inputs that deliberately straddle the table
edges (temperatures below the Planck grid and above the (p,T) grid, very
thin and very thick layers, grazing/night sun angles), then checks the f64
XLA pipelines against a composition of the scalar oracle functions
(tests/oracle.py) that mirror the reference arithmetic statement by
statement.  This sweeps interaction effects the targeted unit tests can't
enumerate (clamp x extrapolation x gas-subset x solver).
"""
import numpy as np
import pytest

import oracle
from conftest import LW_FSCK, LW_RRTMGP, SW_WIDE, RFMIP_VMRS
from test_gas_optics import model_to_oracle
from ecckd_tpu.gases import GasConcs
from ecckd_tpu.models.loader import load_ckd_model
from ecckd_tpu.pipeline import lw_fluxes, sw_fluxes

GAS_POOL = ["co2", "ch4", "n2o", "o2", "cfc11", "cfc12", "h2o", "o3",
            "no2", "sf6", "unknown_gas"]


def random_atmosphere(rng, ncol, nlay):
    """Physically plausible but edge-hunting columns."""
    p_top = 10.0 ** rng.uniform(-0.5, 1.5)       # down to below-grid clamp
    p_sfc = 10.0 ** rng.uniform(4.8, 5.05)
    base = np.exp(np.linspace(np.log(p_top), np.log(p_sfc), nlay + 1))
    jitter = 1.0 + 0.1 * rng.standard_normal((ncol, nlay + 1))
    plev = np.sort(np.abs(base[None, :] * jitter) + 1e-3, axis=1)
    logp = np.log(0.5 * (plev[:, 1:] + plev[:, :-1]))
    # Temperatures spanning below the Planck grid (<120 K) to above the
    # (p,T) grid top — exercises every clamp/extrapolation branch.
    tmid = rng.uniform(110.0, 360.0)
    tlay = tmid + 20.0 * rng.standard_normal((ncol, nlay))
    tlev = tmid + 20.0 * rng.standard_normal((ncol, nlay + 1))
    tsfc = tmid + rng.uniform(-30, 30, ncol)
    return plev, np.abs(tlay) + 1.0, np.abs(tlev) + 1.0, np.abs(tsfc) + 1.0


def random_request(rng, ncol, nlay):
    names = list(rng.permutation(GAS_POOL))[:rng.integers(2, len(GAS_POOL))]
    items = []
    for n in names:
        kind = rng.integers(0, 3)
        if kind == 0:          # scalar
            v = 10.0 ** rng.uniform(-12, -3)
        elif kind == 1:        # per-column
            v = 10.0 ** rng.uniform(-12, -3, ncol)
        else:                  # per-(column, layer)
            v = 10.0 ** rng.uniform(-12, -2, (ncol, nlay))
        if n == "o2":
            v = np.asarray(v) * 1e6 * 0.2  # realistic magnitude for o2
        items.append((n, np.asarray(v, np.float64)))
    concs = GasConcs.create(items)

    def full(v):
        v = np.asarray(v, np.float64)
        if v.ndim == 1:          # per-column -> broadcast over layers
            v = v[:, None]
        return np.broadcast_to(v, (ncol, nlay)).copy()

    oracle_req = [(n, full(v)) for n, v in items]
    return concs, oracle_req


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_lw_pipeline_vs_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    ncol = int(rng.integers(1, 6))
    nlay = int(rng.integers(2, 40))
    ckd = [LW_FSCK, LW_RRTMGP][seed % 2]
    model = load_ckd_model(ckd, dtype=np.float64)
    plev, tlay, tlev, tsfc = random_atmosphere(rng, ncol, nlay)
    concs, oracle_req = random_request(rng, ncol, nlay)
    emis = rng.uniform(0.0, 1.0, ncol)
    n_ang = int(rng.choice([1, 2, 3]))

    f = lw_fluxes(model, plev, tlay, tlev, tsfc, emis, concs,
                  n_gauss_angles=n_ang, backend="xla")

    mnp = model_to_oracle(model)
    tau = oracle.total_optical_depth(mnp, oracle_req, plev, tlay)
    pt = np.asarray(model.planck_temperature, np.float64)
    pf = np.asarray(model.planck_function, np.float64)
    lay_src = oracle.planck(tlay, pt, pf)
    lev_src = oracle.planck(tlev, pt, pf)
    sfc_src = oracle.planck(tsfc[:, None], pt, pf)[:, 0, :]
    emis_gpt = np.broadcast_to(emis[:, None], (ncol, model.ngpt))
    up_ref, dn_ref = oracle.lw_fluxes(
        tau, lay_src, lev_src[:, 1:, :], lev_src[:, :-1, :], sfc_src,
        emis_gpt, n_ang)
    scale = max(np.abs(up_ref).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(f.flux_up), up_ref,
                               atol=1e-9 * scale, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f.flux_dn), dn_ref,
                               atol=1e-9 * scale, rtol=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_sw_pipeline_vs_oracle(seed):
    rng = np.random.default_rng(2000 + seed)
    ncol = int(rng.integers(1, 6))
    nlay = int(rng.integers(2, 40))
    model = load_ckd_model(SW_WIDE, dtype=np.float64)
    plev, tlay, _, _ = random_atmosphere(rng, ncol, nlay)
    concs, oracle_req = random_request(rng, ncol, nlay)
    alb = rng.uniform(0.0, 1.0, ncol)
    tsi = rng.uniform(1300.0, 1400.0, ncol)
    sza = rng.uniform(0.0, 130.0, ncol)          # includes night columns

    f = sw_fluxes(model, plev, tlay, concs, alb, tsi, sza, backend="xla")

    mnp = model_to_oracle(model)
    tau_gas = oracle.total_optical_depth(mnp, oracle_req, plev, tlay)
    tau_ray = oracle.rayleigh_tau(
        plev, np.asarray(model.rayleigh_coeff, np.float64))
    tau = tau_gas + tau_ray
    ssa = tau_ray / tau
    g = np.zeros_like(tau)
    solar = np.asarray(model.solar_irradiance, np.float64)
    toa = np.broadcast_to(solar, (ncol, model.ngpt))
    toa = toa * (tsi[:, None] / toa.sum(-1, keepdims=True))
    spacing90 = np.spacing(90.0)
    usecol = sza < 90.0 - 2.0 * spacing90
    mu0 = np.where(usecol, np.cos(np.deg2rad(sza)), 1.0)
    alb_gpt = np.broadcast_to(alb[:, None], (ncol, model.ngpt))
    up_ref, dn_ref, _ = oracle.sw_fluxes(tau, ssa, g, mu0, toa,
                                         alb_gpt, alb_gpt)
    up_ref = up_ref * usecol[:, None]
    dn_ref = dn_ref * usecol[:, None]
    scale = max(np.abs(dn_ref).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(f.flux_up), up_ref,
                               atol=2e-9 * scale, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(f.flux_dn), dn_ref,
                               atol=2e-9 * scale, rtol=1e-8)
