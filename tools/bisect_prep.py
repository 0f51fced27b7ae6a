"""HISTORICAL bisect tool for the round-2 model-as-jit-arg divergence
(FIXED): compares every array the LW prep feeds to pallas_call between
jit and eager.  This is the tool that localized the bug to the *_lo bf16
split halves (all three DIFFed pre-fix; all zero-diff since the
integer-RNE bit split in common.split_bf16)."""
import os
os.environ["JAX_PLATFORMS"] = os.environ.get("REPRO_PLATFORM", "axon")
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import functools

from tools.chip_parity import adversarial_batch, LW_FSCK
from ecckd_tpu.models.loader import load_ckd_model
from ecckd_tpu.pipeline import _surface_to_gpt
from ecckd_tpu.ops.pallas import common, plan as plan_mod

F32 = jnp.float32

ncol, nlay = 293, 60
b = adversarial_batch(ncol, nlay)
m = load_ckd_model(LW_FSCK, dtype=np.dtype(np.float32))
emis_gpt = _surface_to_gpt(m, b["emis"], ncol, np.float32)
concs = b["concs"]


def prep(model, plev, tlay, tlev, tsfc, emis_gpt, gas_concs):
    """Replicates lw_fluxes_fused's prep, returning the kernel inputs."""
    from ecckd_tpu.ops.pallas import lw as lwmod
    ncol, nlay = tlay.shape
    p = plan_mod.build_plan(model, gas_concs.names)
    ng = p.ng_pad
    n_planck = int(model.planck_function.shape[0])
    npl_pad = ((n_planck + 15) // 16) * 16
    n_p_pad = ((p.n_p + 7) // 8) * 8
    table_t = plan_mod.dense_table_t(model, p, gas_concs.names, F32)
    lut_t = plan_mod.lut_table_t(model, p, gas_concs.names, F32)
    table_hi, table_lo = common.split_for_mxu(table_t)
    lut_hi, lut_lo = common.split_for_mxu(lut_t)
    vmr_prof, vmr_scal, vmr_kinds = plan_mod.split_vmrs(
        p, gas_concs, ncol, nlay, F32)
    lp = model.log_pressure.astype(F32)
    tg = model.temperature_grid.astype(F32)
    pt = model.planck_temperature.astype(F32)
    params = jnp.stack([
        lp[0], 1.0 / (lp[1] - lp[0]),
        1.0 / (tg[0, 1] - tg[0, 0]), pt[0], 1.0 / (pt[1] - pt[0]),
        jnp.asarray(p.lut_log_mf0[0] if p.lut_log_mf0 else 0.0, F32),
        jnp.asarray(p.lut_inv_dlog[0] if p.lut_inv_dlog else 0.0, F32),
        jnp.zeros((), F32)])
    t_first = jnp.zeros((n_p_pad, 1), F32).at[:p.n_p, 0].set(tg[:, 0])
    pf = model.planck_function.astype(F32)
    planck_hi, planck_lo = common.split_bf16(
        jnp.zeros((npl_pad, ng), F32).at[:n_planck, :model.ngpt].set(pf))
    planck_row0 = jnp.zeros((ng, 1), F32).at[:model.ngpt, 0].set(pf[0])

    ct = lwmod.LW_COL_TILE
    ncol_pad = ((ncol + ct - 1) // ct) * ct
    lb = lwmod.derive_layer_block(nlay, p.n_p)
    n_blk = -(-nlay // lb)
    n_blk_lev = -(-(nlay + 1) // lb)
    rows_pad = n_blk * lb
    rows_pad_lev = n_blk_lev * lb
    blkc = lambda x, pv=None: lwmod._rows_t(x, rows_pad, ncol_pad, pv)
    blkc_lev = lambda x, pv=None: lwmod._rows_t(x, rows_pad_lev, ncol_pad,
                                                pv)
    blk = lambda x, pv=None: lwmod._pad_cols(
        lwmod._pad_rows(x, rows_pad, pv), ncol_pad)
    logp_t = blkc(jnp.log(0.5 * (plev[:, 1:] + plev[:, :-1])).astype(F32))
    dp_t = blkc((plev[:, 1:] - plev[:, :-1]).astype(F32), 0.0)
    tlay_t = blkc(tlay.astype(F32))
    tlev_t = blkc_lev(tlev.astype(F32))
    tsfc_t = lwmod._pad_cols(tsfc.astype(F32)[None, :], ncol_pad)
    emis_t = lwmod._pad_cols(
        jnp.zeros((ng, ncol), F32).at[:model.ngpt].set(
            emis_gpt.astype(F32).T), ncol_pad)
    vmrp_t = blk(lwmod._pad_cols(vmr_prof, ncol_pad))
    vmrs_t = lwmod._pad_cols(vmr_scal, ncol_pad)
    return dict(params=params, t_first=t_first, table_hi=table_hi,
                table_lo=table_lo, lut_hi=lut_hi, lut_lo=lut_lo,
                planck_hi=planck_hi, planck_lo=planck_lo,
                planck_row0=planck_row0, logp_t=logp_t, dp_t=dp_t,
                tlay_t=tlay_t, tlev_t=tlev_t, tsfc_t=tsfc_t,
                emis_t=emis_t, vmrp_t=vmrp_t, vmrs_t=vmrs_t)


args = (m, b["plev"], b["tlay"], b["tlev"], b["tsfc"], emis_gpt, concs)
eager = prep(*args)
jitted = jax.jit(prep)(*args)
for k in eager:
    e = np.asarray(eager[k]).astype(np.float32)
    j = np.asarray(jitted[k]).astype(np.float32)
    d = np.abs(e - j)
    flag = "  <-- DIFF" if d.max() > 0 else ""
    print(f"{k:12s} maxabs {d.max():.6e}  shape {e.shape}{flag}")
