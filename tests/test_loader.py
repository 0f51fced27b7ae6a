"""Loader tests against the schema facts of the shipped ckd files
(SURVEY.md section 2.6)."""
import numpy as np

from ecckd_tpu import constants


def test_lw_fsck_registration(lw_model):
    m = lw_model
    # constituent_id = "composite h2o o3 co2 ch4 n2o cfc11 cfc12";
    # composite_constituent_id = "o2 n2 n2o ch4" -> +o2, +n2 composite-only.
    assert m.gas_names == ("h2o", "o3", "co2", "ch4", "n2o", "cfc11",
                           "cfc12", "o2", "n2")
    assert m.get_ngas() == 9
    assert m.gas_composite_only == (False,) * 7 + (True, True)
    assert m.gas_codes[:7] == (constants.CONC_LUT, constants.CONC_LINEAR,
                               constants.CONC_LINEAR,
                               constants.CONC_RELATIVE_LINEAR,
                               constants.CONC_RELATIVE_LINEAR,
                               constants.CONC_LINEAR, constants.CONC_LINEAR)
    assert m.gas_codes[7] == constants.CONC_NONE
    # o2 and n2 share the composite table row.
    assert m.gas_table_idx[7] == m.gas_table_idx[8]
    assert m.num_composite_gases == 4
    assert not m.shortwave
    assert m.source_is_internal() and not m.source_is_external()
    assert m.ngpt == 32 and m.nband == 1
    assert m.coeff_dense.shape == (7, 53, 6, 32)
    assert len(m.coeff_lut) == 1
    assert m.coeff_lut[0].shape == (12, 53, 6, 32)
    assert m.planck_function.shape == (231, 32)
    # relative-linear reference mole fractions (ch4, n2o).
    assert np.isclose(m.gas_reference_mf[3], 1.921e-6, rtol=1e-3)
    assert np.isclose(m.gas_reference_mf[4], 3.32e-7, rtol=1e-3)


def test_lw_pressure_grid(lw_model):
    m = lw_model
    logp = np.asarray(m.log_pressure)
    d = np.diff(logp)
    assert np.allclose(d, d[0], atol=1e-4)  # uniform in ln p
    assert np.isclose(m.get_press_min(), 0.694, rtol=1e-2)
    assert np.isclose(m.get_press_max(), 1.1e5, rtol=1e-2)
    tg = np.asarray(m.temperature_grid)
    assert tg.shape == (53, 6)
    assert np.allclose(np.diff(tg, axis=1), 20.0, atol=1e-3)


def test_sw_registration(sw_model):
    m = sw_model
    assert m.gas_names == ("h2o", "o3", "co2", "ch4", "n2o", "o2", "n2")
    assert m.shortwave and m.source_is_external()
    assert m.ngpt == 27 and m.nband == 5
    assert np.isclose(m.total_solar_irradiance, 1361.0, atol=0.5)
    assert m.rayleigh_coeff.shape == (27,)
    assert m.planck_function is None
    # band2gpt covers all g-points contiguously.
    covered = sorted(g for a, b in m.band2gpt for g in range(a, b + 1))
    assert covered == list(range(27))


def test_lw_rrtmgp_bands(lw_rrtmgp_model):
    m = lw_rrtmgp_model
    assert m.ngpt == 36 and m.nband == 16
    assert len(m.gpt2band) == 36
    # Per-band expansion roundtrip.
    per_band = np.arange(m.nband, dtype=np.float32)[None, :]
    per_gpt = np.asarray(m.gpt_weights_per_band(per_band))
    assert per_gpt.shape == (1, 36)
    assert per_gpt[0, 0] == m.gpt2band[0]
