"""Gas-optics kernels vs the scalar NumPy oracle (SURVEY.md section 2.2)."""
import numpy as np
import pytest

import oracle
from conftest import RFMIP_VMRS, make_atmosphere
from ecckd_tpu import constants
from ecckd_tpu.gases import GasConcs
from ecckd_tpu.models.gas_optics import gas_optics_lw, gas_optics_sw
from ecckd_tpu.ops.optical_depth import (gas_optical_depth,
                                         resolve_contributions)
from ecckd_tpu.ops.planck import planck_source
from ecckd_tpu.ops.rayleigh import rayleigh_optical_depth


def model_to_oracle(m):
    gases = {}
    for gi, name in enumerate(m.gas_names):
        code = m.gas_codes[gi]
        if code == constants.CONC_LUT:
            coeff = np.asarray(m.coeff_lut[m.gas_table_idx[gi]], np.float64)
            mf_grid = np.asarray(m.lut_mf_grids[m.gas_table_idx[gi]])
        else:
            coeff = np.asarray(m.coeff_dense[m.gas_table_idx[gi]],
                               np.float64)[None]
            mf_grid = None
        gases[name] = dict(code=code, coeff=coeff,
                           composite_only=m.gas_composite_only[gi],
                           reference_mf=m.gas_reference_mf[gi],
                           mf_grid=mf_grid)
    return dict(log_pressure=np.asarray(m.log_pressure, np.float64),
                temperature_grid=np.asarray(m.temperature_grid, np.float64),
                gases=gases)


def rfmip_request(ncol, nlay, atm, extra_unknown=False):
    """Driver-order request list: 6 scalar gases + h2o + o3 (+ no2=0),
    mirroring utils.f90:41-70 + mo_rfmip_io.F90:199-260."""
    items = [(g, RFMIP_VMRS[g]) for g in
             ("co2", "ch4", "n2o", "o2", "cfc11", "cfc12")]
    items += [("h2o", atm["h2o"]), ("o3", atm["o3"]), ("no2", 0.0)]
    if extra_unknown:
        items.append(("sf6", 1e-12))
    concs = GasConcs.create(items)
    oracle_req = [(n, np.broadcast_to(np.asarray(v, np.float64),
                                      (ncol, nlay)).copy())
                  for n, v in items]
    return concs, oracle_req


@pytest.mark.parametrize("model_name", ["lw_model", "sw_model",
                                        "lw_rrtmgp_model"])
def test_total_optical_depth_vs_oracle(model_name, request):
    m = request.getfixturevalue(model_name)
    atm = make_atmosphere(ncol=5, nlay=24, seed=1)
    ncol, nlay = atm["tlay"].shape
    concs, oracle_req = rfmip_request(ncol, nlay, atm)

    tau = np.asarray(gas_optical_depth(
        m, atm["plev"], atm["tlay"], concs))
    ref = oracle.total_optical_depth(model_to_oracle(m), oracle_req,
                                     atm["plev"], atm["tlay"])
    np.testing.assert_allclose(tau, ref, rtol=1e-10, atol=1e-30)


def test_composite_counted_once(lw_model):
    """o2 and n2 both request the composite table; it must contribute once."""
    atm = make_atmosphere(ncol=2, nlay=10, seed=2)
    plev, tlay = atm["plev"], atm["tlay"]
    both = GasConcs.create([("o2", 0.2095), ("n2", 0.7808)])
    only_o2 = GasConcs.create([("o2", 0.2095)])
    t_both = np.asarray(gas_optical_depth(lw_model, plev, tlay, both))
    t_o2 = np.asarray(gas_optical_depth(lw_model, plev, tlay, only_o2))
    np.testing.assert_allclose(t_both, t_o2, rtol=1e-6)
    # And the composite tau does not depend on the requested vmr value.
    weird = GasConcs.create([("o2", 0.5)])
    t_weird = np.asarray(gas_optical_depth(lw_model, plev, tlay, weird))
    np.testing.assert_allclose(t_weird, t_o2, rtol=1e-6)


def test_unknown_gas_skipped(lw_model):
    atm = make_atmosphere(ncol=2, nlay=10, seed=3)
    plev, tlay = atm["plev"], atm["tlay"]
    a = GasConcs.create([("co2", 4e-4)])
    b = GasConcs.create([("co2", 4e-4), ("sf6", 1e-9), ("no2", 0.0)])
    np.testing.assert_allclose(
        np.asarray(gas_optical_depth(lw_model, plev, tlay, a)),
        np.asarray(gas_optical_depth(lw_model, plev, tlay, b)), rtol=0)


def test_resolution_semantics(lw_model):
    contrib = resolve_contributions(
        lw_model, ("co2", "sf6", "o2", "n2", "h2o"))
    names = [c.name for c in contrib]
    assert names == ["co2", "o2", "h2o"]  # sf6 skipped, n2 deduped


def test_relative_linear_negative_clamp(lw_model):
    """ch4 below its reference mole fraction gives negative pre-clamp tau;
    the per-gas clamp must zero it (gas_optics_ecckd.f90:233-238)."""
    atm = make_atmosphere(ncol=2, nlay=8, seed=4)
    plev, tlay = atm["plev"], atm["tlay"]
    concs = GasConcs.create([("ch4", 0.0)])  # far below reference 1.92e-6
    tau = np.asarray(gas_optical_depth(lw_model, plev, tlay, concs))
    ref = oracle.total_optical_depth(
        model_to_oracle(lw_model), [("ch4", np.zeros(atm["tlay"].shape))],
        atm["plev"], atm["tlay"])
    assert (tau >= 0).all()
    np.testing.assert_allclose(tau, ref, rtol=1e-10, atol=1e-30)
    assert ref.max() == 0.0 or (ref >= 0).all()


def test_planck_vs_oracle(lw_model):
    m = lw_model
    temps = np.array([[100.0, 119.9, 120.0, 180.0, 288.0, 349.9, 350.0,
                       360.0, 400.0]])
    got = np.asarray(planck_source(
        temps, m.planck_temperature, m.planck_function))
    ref = oracle.planck(temps, np.asarray(m.planck_temperature, np.float64),
                        np.asarray(m.planck_function, np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-30)


def test_planck_below_range_scales_linearly(lw_model):
    m = lw_model
    t = np.array([[60.0, 120.0]])
    p = np.asarray(planck_source(t, m.planck_temperature, m.planck_function))
    np.testing.assert_allclose(p[0, 0], 0.5 * p[0, 1], rtol=1e-5)


def test_rayleigh_vs_oracle(sw_model):
    atm = make_atmosphere(ncol=3, nlay=12, seed=5)
    got = np.asarray(rayleigh_optical_depth(
        atm["plev"], sw_model.rayleigh_coeff))
    ref = oracle.rayleigh_tau(atm["plev"],
                              np.asarray(sw_model.rayleigh_coeff, np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_gas_optics_lw_shapes(lw_model):
    atm = make_atmosphere(ncol=3, nlay=16, seed=6)
    concs, _ = rfmip_request(3, 16, atm)
    props, src = gas_optics_lw(
        lw_model, atm["plev"], atm["tlay"], atm["tsfc"], concs, atm["tlev"])
    assert props.tau.shape == (3, 16, 32)
    assert src.lay_source.shape == (3, 16, 32)
    assert src.lev_source_inc.shape == (3, 16, 32)
    assert src.sfc_source.shape == (3, 32)
    # inc/dec split of one level interpolation (gas_optics_ecckd.f90:419-424)
    lev = np.asarray(planck_source(atm["tlev"],
                                   lw_model.planck_temperature,
                                   lw_model.planck_function))
    np.testing.assert_allclose(np.asarray(src.lev_source_inc), lev[:, 1:],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(src.lev_source_dec), lev[:, :-1],
                               rtol=1e-6)


def test_gas_optics_sw_ssa(sw_model):
    atm = make_atmosphere(ncol=3, nlay=16, seed=7)
    concs, _ = rfmip_request(3, 16, atm)
    props, toa = gas_optics_sw(
        sw_model, atm["plev"].astype(np.float32),
        atm["tlay"].astype(np.float32), concs)
    tau_ray = np.asarray(rayleigh_optical_depth(
        atm["plev"], sw_model.rayleigh_coeff))
    np.testing.assert_allclose(np.asarray(props.ssa * props.tau), tau_ray,
                               rtol=1e-4)
    assert (np.asarray(props.ssa) <= 1.0).all()
    assert (np.asarray(props.g) == 0).all()
    np.testing.assert_allclose(
        np.asarray(toa)[0], np.asarray(sw_model.solar_irradiance), rtol=1e-6)


def test_f32_path_close_to_f64(lw_model):
    """The fast float32 path stays within ~1e-3 of double precision."""
    import jax.numpy as jnp
    atm = make_atmosphere(ncol=3, nlay=16, seed=8)
    concs, _ = rfmip_request(3, 16, atm)
    m32 = lw_model.astype(jnp.float32)
    c32 = GasConcs(values=tuple(v.astype(jnp.float32)
                                for v in concs.values), names=concs.names)
    t64 = np.asarray(gas_optical_depth(lw_model, atm["plev"], atm["tlay"],
                                       concs))
    t32 = np.asarray(gas_optical_depth(
        m32, atm["plev"].astype(np.float32), atm["tlay"].astype(np.float32),
        c32))
    assert t32.dtype == np.float32
    np.testing.assert_allclose(t32, t64, rtol=2e-3, atol=1e-8)


def test_logarithmic_interpolation_vs_oracle(lw_model):
    """The reference's alternate log-space interpolation branch
    (gas_optics_ecckd.f90:180-229; live API, never selected by its
    drivers) matches the oracle per gas."""
    import jax.numpy as jnp
    from ecckd_tpu.ops.optical_depth import gas_optical_depth
    from ecckd_tpu.gases import GasConcs
    atm = make_atmosphere(ncol=3, nlay=14, seed=17)
    m = lw_model
    for name, vmr_val in (("h2o", atm["h2o"]), ("co2", 4.0e-4),
                          ("ch4", 1.5e-6)):
        concs = GasConcs.create({name: vmr_val})
        got = gas_optical_depth(m, jnp.asarray(atm["plev"]),
                                jnp.asarray(atm["tlay"]), concs,
                                logarithmic_interpolation=True)
        gi = m.gas_names.index(name)
        vmr = np.broadcast_to(np.asarray(vmr_val), atm["tlay"].shape)
        code = m.gas_codes[gi]
        ti = m.gas_table_idx[gi]
        if code == 2:
            coeff = np.asarray(m.coeff_lut[ti])
            mf = m.lut_mf_grids[ti]
        else:
            coeff = np.asarray(m.coeff_dense[ti])[None]
            mf = None
        ref = oracle.optical_depth_one_gas(
            np.asarray(m.log_pressure), np.asarray(m.temperature_grid),
            coeff, code, atm["plev"], atm["tlay"], vmr,
            reference_mf=m.gas_reference_mf[gi], mf_grid=mf,
            logarithmic=True)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-11,
                                   atol=1e-18)


def test_generic_gas_optics_dispatch(lw_model, sw_model):
    """The generic gas_optics mirrors the reference's one-name binding:
    LW signature on an internal-source model, SW on external, with
    ValueError for signature/model mismatches."""
    import pytest
    from ecckd_tpu.models.gas_optics import gas_optics
    atm = make_atmosphere(ncol=2, nlay=12, seed=9)
    concs, _ = rfmip_request(2, 12, atm)
    props, src = gas_optics(lw_model, atm["plev"], atm["tlay"], concs,
                            tsfc=atm["tsfc"], tlev=atm["tlev"])
    ref_p, ref_s = gas_optics_lw(lw_model, atm["plev"], atm["tlay"],
                                 atm["tsfc"], concs, atm["tlev"])
    np.testing.assert_array_equal(np.asarray(props.tau),
                                  np.asarray(ref_p.tau))
    np.testing.assert_array_equal(np.asarray(src.sfc_source),
                                  np.asarray(ref_s.sfc_source))
    props2, toa = gas_optics(sw_model, atm["plev"], atm["tlay"], concs)
    ref2, ref_toa = gas_optics_sw(sw_model, atm["plev"], atm["tlay"],
                                  concs)
    np.testing.assert_array_equal(np.asarray(props2.tau),
                                  np.asarray(ref2.tau))
    with pytest.raises(ValueError):
        gas_optics(lw_model, atm["plev"], atm["tlay"], concs)  # no tlev
    with pytest.raises(ValueError):
        gas_optics(sw_model, atm["plev"], atm["tlay"], concs,
                   tsfc=atm["tsfc"], tlev=atm["tlev"])
