"""Merged longwave + shortwave mega-kernel.

Climate workloads (and the RFMIP benchmark) always run BOTH bands over
the same atmosphere.  The two solves share everything upstream of the
tables: the layer-pressure/temperature interpolation indices, the
bi-linear one-hot matrices, the blocked atmosphere inputs, and the
column-tile grid pass.  This kernel computes both in one pass per
128-column tile: one shared one-hot per layer block is contracted
against BOTH models' stacked tables (common.gas_tau_block_multi), then
the LW no-scattering sweep (ops/pallas/lw.py) and the SW two-stream
adding solve (ops/pallas/sw.py) run on their respective taus.

Requires the two ckd models to share the (pressure, temperature) grid —
true for all shipped ecckd-1.2 files; the pipeline falls back to the
separate kernels otherwise.  Supports 1-4 LW Gauss angles (physics
index 1 = 1 angle with the fused forward sweeps; index 2 = 3 angles
with per-angle LW sweeps over staged tau/Planck, lw.py's multi-angle
structure — the shared one-hot pass is identical either way).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecckd_tpu import constants
from ecckd_tpu.gases import GasConcs
from ecckd_tpu.models.ckd import CKDModel
from ecckd_tpu.ops.pallas import common, plan as plan_mod
from ecckd_tpu.ops.pallas.lw import (COL_TILE, INKERNEL_BLOCK, P_WINDOW,
                                     UNROLL_BLOCKS, V_WINDOW, _block_cols,
                                     _block_lanes, _pad_cols, _pad_rows,
                                     _rows_t, derive_layer_block)
from ecckd_tpu.solvers.quadrature import gauss_angles

F32 = jnp.float32

# params SMEM layout (extends lw.py's list with the SW LUT constants)
(P_LOG_P0, P_INV_DLOGP, P_INV_DT, P_PLANCK_T0, P_INV_PLANCK_DT,
 P_LW_LOG_MF0, P_LW_INV_DLOGV, P_SW_LOG_MF0, P_SW_INV_DLOGV,
 P_NPARAMS) = range(10)

# Fuse the FORWARD sweeps (LW down radiance, SW direct-beam attenuation)
# into phase A: the layer blocks are produced in forward order, so the
# in-block layers can advance both forward chains while the block's
# coefficients are still in vregs.  Removes two of the eight per-block
# scratch stores (the LW down-source and t_noscat — their only consumer
# was the forward sweep) and the forward sweep's read-modify-writes.
# Round-4 residual attribution (tools/probe_residual.py) measured the
# scratch stores at 4.8 ms of the 28.5 ms epoch; this trades ~2/8 of
# that plus the 0.57 ms forward sweep for in-loop chain work.
FUSE_FWD = os.environ.get("ECCKD_FUSE_FWD", "1") == "1"


def _lwsw_kernel(params_ref, t_first_ref,
                 lw_table_hi_ref, lw_table_lo_ref, lw_lut_hi_ref,
                 lw_lut_lo_ref, planck_hi_ref, planck_lo_ref,
                 planck_row0_ref,
                 sw_table_hi_ref, sw_table_lo_ref, sw_lut_hi_ref,
                 sw_lut_lo_ref, ray_ref, solar_ref,
                 logp_ref, dp_ref, tlay_ref, tlev_ref, tsfc_ref, emis_ref,
                 mu0_ref, tsi_scale_ref, alb_ref, vmrp_ref, vmrs_ref,
                 lwup_ref, lwdn_ref, swup_ref, swdn_ref,
                 blk_a_s, blk_b_s, blk_c_s, plevb_s,
                 rdif_s, tdif_s, srcup_s, srcdn_s, albedo_s, src_s,
                 denom_s, logp_s, dp_s, tlay_s, tlev_s, vmrp_s,
                 lw_trans_s, lw_srcup_s, *,
                 lw_plan: plan_mod.GasOpticsPlan,
                 sw_plan: plan_mod.GasOpticsPlan,
                 lw_kinds, sw_kinds, nlay: int, n_planck: int,
                 npl_pad: int, secants: Tuple[float, ...],
                 weights: Tuple[float, ...], lb: int,
                 n_blk: int, n_blk_lev: int, ctile: int, wp: int, wv: int,
                 inblock: bool, roll: bool):
    if inblock:
        # Inputs arrive ROW-MAJOR (rows_pad, ctile); build the layer-blocked
        # lane layout (n_blk, lb*ctile) here with cheap VPU row-concats
        # instead of a strided XLA relayout pass (see common.fill_lane_blocks).
        common.fill_lane_blocks(logp_s, logp_ref, n_blk, lb)
        common.fill_lane_blocks(dp_s, dp_ref, n_blk, lb)
        common.fill_lane_blocks(tlay_s, tlay_ref, n_blk, lb)
        common.fill_lane_blocks(tlev_s, tlev_ref, n_blk_lev, lb)
        common.fill_lane_blocks(vmrp_s, vmrp_ref, n_blk, lb)
        logp_ref, dp_ref, tlay_ref = logp_s, dp_s, tlay_s
        tlev_ref, vmrp_ref = tlev_s, vmrp_s
    log_p0 = params_ref[P_LOG_P0]
    inv_dlogp = params_ref[P_INV_DLOGP]
    inv_dt = params_ref[P_INV_DT]
    mpp = F32(constants.MOLES_PER_PA)
    inv_pi = F32(1.0 / constants.PI)
    thresh = F32(float(np.sqrt(np.finfo(np.float32).eps)))

    planck = functools.partial(
        common.planck_eval, planck_hi_ref=planck_hi_ref,
        planck_lo_ref=planck_lo_ref, planck_row0_ref=planck_row0_ref,
        t0=params_ref[P_PLANCK_T0], inv_dt=params_ref[P_INV_PLANCK_DT],
        n_planck=n_planck, npl_pad=npl_pad, inv_pi=inv_pi)

    specs = (
        (lw_plan, lw_kinds, lw_table_hi_ref, lw_table_lo_ref,
         lw_lut_hi_ref, lw_lut_lo_ref,
         params_ref[P_LW_LOG_MF0], params_ref[P_LW_INV_DLOGV]),
        (sw_plan, sw_kinds, sw_table_hi_ref, sw_table_lo_ref,
         sw_lut_hi_ref, sw_lut_lo_ref,
         params_ref[P_SW_LOG_MF0], params_ref[P_SW_INV_DLOGV]),
    )

    mu0_tile = mu0_ref[...]                  # (1, C)
    mu0_blk = (jnp.concatenate([mu0_tile] * lb, axis=1) if lb > 1
               else mu0_tile)                # (1, lb*C)
    inv_mu0_blk = 1.0 / mu0_blk

    for ref in (lwup_ref, lwdn_ref, swup_ref, swdn_ref):
        ref[...] = jnp.zeros_like(ref)
    dir_top = mu0_tile * tsi_scale_ref[...] * solar_ref[...]   # (NGs, C)
    swdn_ref[pl.ds(0, 1), :] = jnp.sum(dir_top, axis=0, keepdims=True)

    # --- LW level Planck, one eval per level block (see lw.py) ----------
    def level_blk_eval(b, carry):
        plevb_s[b] = planck(tlev_ref[pl.ds(b, 1), :])
        return carry

    common.fori32(0, n_blk_lev, level_blk_eval, 0, unroll=UNROLL_BLOCKS)

    # Multi-angle (physics index 2): the transmittance depends on the
    # angle, so phase A stages tau/layer-Planck blocked (like lw.py's
    # 3-angle path) and each angle's sweeps compute their own
    # transmittance/sources; the SW solve and the shared one-hot pass are
    # angle-independent.  The forward-fusion applies to 1 angle only.
    one_angle = len(secants) == 1
    fuse = FUSE_FWD and one_angle
    w2pi = F32(2.0 * constants.PI * weights[0])
    pad_tail = n_blk * lb > nlay   # static: padded layer rows exist

    # --- Phase A: ONE shared one-hot per block -> both models' taus,
    # then each band's per-layer VPU math, all blocked.  With FUSE_FWD
    # the forward chains (LW down radiance, SW direct attenuation)
    # advance inside the block loop on the still-in-vreg coefficients
    # (see the flag's rationale above). ----------------------------------
    def optics_block(b, carry):
        (tau_lw, tau_sw), d_p = common.gas_tau_block_multi(
            b, logp_ref, dp_ref, tlay_ref, vmrp_ref, vmrs_ref,
            t_first_ref, specs, log_p0, inv_dlogp, inv_dt, mpp,
            lb=lb, wp=wp, wv=wv)

        # LW: transmittance + linear-in-tau sources (lw.py 1-angle path)
        # — or, multi-angle, stage tau + layer Planck for the per-angle
        # sweeps below.
        play_blk = planck(tlay_ref[pl.ds(b, 1), :])
        if one_angle:
            # Single-home blocked per-layer math shared with lw.py
            # (common.lw_layer_sources / level_edges).
            lev_dec, lev_inc = common.level_edges(plevb_s, b, n_blk_lev,
                                                  ctile)
            tr, src_dn, src_up = common.lw_layer_sources(
                tau_lw * F32(secants[0]), play_blk, lev_dec, lev_inc,
                thresh)
            blk_a_s[b] = tr
            blk_c_s[b] = src_up
        else:
            blk_a_s[b] = tau_lw
            blk_b_s[b] = play_blk

        # SW: tau-scaled cancellation-free two-stream with g = 0 — one
        # divide per block (common.two_stream_g0's derivation notes).
        tau_ray = (mpp * d_p) * ray_ref[...]
        tau = tau_sw + tau_ray
        r_dif, t_dif, r_dir, t_dir, t_noscat = common.two_stream_g0(
            tau, tau_ray, mu0_blk, inv_mu0_blk)
        rdif_s[b] = r_dif
        tdif_s[b] = t_dif
        if not fuse:
            if one_angle:
                blk_b_s[b] = src_dn
            srcup_s[b] = r_dir
            srcdn_s[b] = t_dir
            denom_s[b] = t_noscat
            return carry

        # Fused forward chains over this block's lb layers.  Padded layer
        # rows (dp = 0) are exact identities for both chains (tr = 1,
        # src = 0, t_noscat = 1), so only the per-level output writes need
        # the bounds guard.
        rad, direct = carry
        su_chunks, sd_chunks = [], []
        for l in range(lb):
            sl = slice(l * ctile, (l + 1) * ctile)
            rad = tr[:, sl] * rad + src_dn[:, sl]
            su_chunks.append(r_dir[:, sl] * direct)
            sd_chunks.append(t_dir[:, sl] * direct)
            direct = t_noscat[:, sl] * direct
            row = b * lb + (l + 1)
            lwdn_row = w2pi * jnp.sum(rad, axis=0, keepdims=True)
            swdn_row = jnp.sum(direct, axis=0, keepdims=True)
            if pad_tail:
                @pl.when(row <= nlay)
                def _(row=row, lwdn_row=lwdn_row, swdn_row=swdn_row):
                    lwdn_ref[pl.ds(row, 1), :] += lwdn_row
                    swdn_ref[pl.ds(row, 1), :] = swdn_row
            else:
                lwdn_ref[pl.ds(row, 1), :] += lwdn_row
                swdn_ref[pl.ds(row, 1), :] = swdn_row
        srcup_s[b] = jnp.concatenate(su_chunks, axis=1)
        srcdn_s[b] = jnp.concatenate(sd_chunks, axis=1)
        return (rad, direct)

    if fuse:
        rad0 = jnp.zeros_like(emis_ref[...])
        rad, direct = common.fori32(0, n_blk, optics_block,
                                    (rad0, dir_top), unroll=UNROLL_BLOCKS)
    else:
        common.fori32(0, n_blk, optics_block, 0, unroll=UNROLL_BLOCKS)

    # Blocked-scratch addressing: the one definition in common.py.
    chunk = lambda ref, j: common.chunk(ref, j, lb, ctile)
    chunk_set = lambda ref, j, val: common.chunk_set(ref, j, val, lb,
                                                     ctile)

    # --- Sweeps: the independent LW and SW chains of the same direction
    # run in ONE loop.  Measured NEUTRAL vs separate loops (~28.9 vs
    # ~28.7 ms/65k-col solve — Mosaic already overlaps the chains), and
    # tools/probe_residual.py measured the whole sweep phase at 1.3 ms of
    # the 28.5 ms epoch: the sweeps are NOT the place to hunt.  Per-step
    # math matches the separate kernels to solver tolerance
    # (test_lwsw_merged_matches_separate, atol 3e-5) and the FUSE_FWD
    # forward chain matches the stored-scratch path bitwise on chip /
    # to 1-2 ulps in interpret mode (XLA:CPU FMA contraction;
    # test_lwsw_fused_forward_matches_unfused).
    # Forward: LW down radiance + SW direct-beam attenuation (sw phase
    # A1) — already advanced inside phase A when the fusion is on;
    # multi-angle runs the SW direct chain alone here (LW sweeps are
    # per-angle, below).
    sfc_src = planck(tsfc_ref[...])
    emis = emis_ref[...]
    if not fuse:
        rad = jnp.zeros_like(sfc_src)
        direct = dir_top
        for j in range(nlay):
            if one_angle:
                rad = chunk(blk_a_s, j) * rad + chunk(blk_b_s, j)
                lwdn_ref[pl.ds(j + 1, 1), :] += w2pi * jnp.sum(
                    rad, axis=0, keepdims=True)
            chunk_set(srcup_s, j, chunk(srcup_s, j) * direct)
            chunk_set(srcdn_s, j, chunk(srcdn_s, j) * direct)
            direct = chunk(denom_s, j) * direct
            swdn_ref[pl.ds(j + 1, 1), :] = jnp.sum(direct, axis=0,
                                                   keepdims=True)
    dir_sfc = direct

    # Surface boundary conditions of both backward chains.
    if one_angle:
        rad = emis * sfc_src + (1.0 - emis) * rad
        lwup_ref[pl.ds(nlay, 1), :] += w2pi * jnp.sum(rad, axis=0,
                                                      keepdims=True)
    albedo_s[nlay] = alb_ref[...]
    src_s[nlay] = alb_ref[...] * dir_sfc
    albedo, src = albedo_s[nlay], src_s[nlay]

    # Backward: LW up radiance (1-angle) + SW adding recurrence (phase B).
    for j in reversed(range(nlay)):
        if one_angle:
            rad = chunk(blk_a_s, j) * rad + chunk(blk_c_s, j)
            lwup_ref[pl.ds(j, 1), :] += w2pi * jnp.sum(rad, axis=0,
                                                       keepdims=True)
        denom, albedo, src = common.sw_adding_up_step(
            chunk(rdif_s, j), chunk(tdif_s, j), albedo, src,
            chunk(srcup_s, j), chunk(srcdn_s, j))
        chunk_set(denom_s, j, denom)
        albedo_s[j] = albedo
        src_s[j] = src

    swup_ref[pl.ds(0, 1), :] = jnp.sum(src_s[0], axis=0, keepdims=True)
    dn = jnp.zeros_like(dir_top)
    for j in range(nlay):
        dn, up = common.sw_adding_dn_step(
            chunk(tdif_s, j), chunk(rdif_s, j), chunk(denom_s, j), dn,
            albedo_s[j + 1], src_s[j + 1], chunk(srcdn_s, j))
        swdn_ref[pl.ds(j + 1, 1), :] += jnp.sum(dn, axis=0, keepdims=True)
        swup_ref[pl.ds(j + 1, 1), :] = jnp.sum(up, axis=0, keepdims=True)

    # Multi-angle LW sweeps (lw.py's 3-angle structure): per angle, the
    # down sweep computes that angle's transmittance/sources from the
    # staged tau (blk_a) + layer Planck (blk_b) and per-level Planck
    # blocks, staging trans/src_up per layer for the up sweep.
    if not one_angle:
        common.multi_angle_lw_sweeps(
            secants, weights, blk_a_s, blk_b_s, plevb_s, lw_trans_s,
            lw_srcup_s, lwup_ref, lwdn_ref, sfc_src, emis, thresh,
            nlay=nlay, lb=lb, n_blk=n_blk, n_blk_lev=n_blk_lev,
            ctile=ctile, roll=roll)


def models_mergeable(model_lw: CKDModel, model_sw: CKDModel) -> bool:
    """The merged kernel shares one (p, T) interpolation grid; true for
    all shipped ecckd-1.2 files (identical pressure/temperature arrays).
    Compares the static load-time grid fingerprints, so the decision is
    trace-time static (the grid arrays are tracers under jit)."""
    return (bool(model_lw.grid_key) and bool(model_sw.grid_key)
            and model_lw.grid_key == model_sw.grid_key
            and model_lw.log_pressure.shape == model_sw.log_pressure.shape
            and model_lw.temperature_grid.shape
            == model_sw.temperature_grid.shape)


def lwsw_fluxes_fused(model_lw: CKDModel, model_sw: CKDModel,
                      plev: jax.Array, tlay: jax.Array, tlev: jax.Array,
                      tsfc: jax.Array, emis_gpt: jax.Array,
                      gas_concs: GasConcs, sfc_alb: jax.Array,
                      tsi: jax.Array, sza_deg: jax.Array,
                      n_gauss_angles: int = 1,
                      interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                 jax.Array]:
    """Both bands' broadband fluxes in one fused kernel pass (top_at_1;
    1-4 LW Gauss angles — physics index 2 = 3 angles shares the same
    one-hot/interpolation pass, with per-angle LW sweeps like
    ops/pallas/lw.py's multi-angle path).  Args mirror pipeline.lw_fluxes
    + pipeline.sw_fluxes.  Returns (lw_up, lw_dn, sw_up, sw_dn), each
    (ncol, nlay+1); SW night columns are masked like sw_fluxes."""
    ncol, nlay = tlay.shape
    p_lw = plan_mod.build_plan(model_lw, gas_concs.names)
    p_sw = plan_mod.build_plan(model_sw, gas_concs.names)
    if not (p_lw.fused_ok and p_sw.fused_ok):
        raise ValueError("fused path invalid for one of the models; use "
                         "the XLA path")
    if not models_mergeable(model_lw, model_sw):
        raise ValueError("models do not share a (p, T) grid; use the "
                         "separate kernels")
    ng_lw, ng_sw = p_lw.ng_pad, p_sw.ng_pad
    n_planck = int(model_lw.planck_function.shape[0])
    npl_pad = ((n_planck + 15) // 16) * 16  # 16-aligned: headroom
    # left over from the abandoned Planck-window experiment (measured a
    # wash, tools/probe_planck_window.py); harmless over-padding
    n_p_pad = ((p_lw.n_p + 7) // 8) * 8

    lw_table, lw_lut = plan_mod.kernel_tables(model_lw, p_lw,
                                              gas_concs.names, F32)
    sw_table, sw_lut = plan_mod.kernel_tables(model_sw, p_sw,
                                              gas_concs.names, F32)
    lw_table_hi, lw_table_lo = common.split_for_mxu(lw_table)
    lw_lut_hi, lw_lut_lo = common.split_for_mxu(lw_lut)
    sw_table_hi, sw_table_lo = common.split_for_mxu(sw_table)
    sw_lut_hi, sw_lut_lo = common.split_for_mxu(sw_lut)
    vmr_prof, vmr_scal, kinds_all = plan_mod.split_vmrs_multi(
        (p_lw, p_sw), gas_concs, ncol, nlay, F32)
    lw_kinds, sw_kinds = kinds_all
    if vmr_prof is None:
        vmr_prof = jnp.zeros((1, nlay, ncol), F32)
    if vmr_scal is None:
        vmr_scal = jnp.zeros((1, ncol), F32)

    lp = model_lw.log_pressure.astype(F32)
    tg = model_lw.temperature_grid.astype(F32)
    pt = model_lw.planck_temperature.astype(F32)
    params = jnp.stack([
        lp[0], 1.0 / (lp[1] - lp[0]), 1.0 / (tg[0, 1] - tg[0, 0]),
        pt[0], 1.0 / (pt[1] - pt[0]),
        jnp.asarray(p_lw.lut_log_mf0[0] if p_lw.lut_log_mf0 else 0.0, F32),
        jnp.asarray(p_lw.lut_inv_dlog[0] if p_lw.lut_inv_dlog else 0.0,
                    F32),
        jnp.asarray(p_sw.lut_log_mf0[0] if p_sw.lut_log_mf0 else 0.0, F32),
        jnp.asarray(p_sw.lut_inv_dlog[0] if p_sw.lut_inv_dlog else 0.0,
                    F32)])

    t_first = jnp.zeros((n_p_pad, 1), F32).at[:p_lw.n_p, 0].set(tg[:, 0])
    pf = model_lw.planck_function.astype(F32)
    # Transposed (npl_pad, NG), split_bf16 halves: Planck stays 3-pass
    # in every MXU mode (common.planck_matmul_t).
    planck_hi, planck_lo = common.split_bf16(
        jnp.zeros((npl_pad, ng_lw), F32
                  ).at[:n_planck, :model_lw.ngpt].set(pf))
    planck_row0 = jnp.zeros((ng_lw, 1), F32
                            ).at[:model_lw.ngpt, 0].set(pf[0])
    solar = model_sw.solar_irradiance.astype(F32)
    ray = jnp.zeros((ng_sw, 1), F32).at[:model_sw.ngpt, 0].set(
        model_sw.rayleigh_coeff.astype(F32))
    solar_col = jnp.zeros((ng_sw, 1), F32).at[:model_sw.ngpt, 0].set(solar)

    # TSI renorm / night mask / albedo expansion: shared with the
    # separate SW kernel (single home for the driver parity semantics).
    from ecckd_tpu.ops.pallas.sw import surface_prep
    tsi_scale, usecol, mu0, alb_gpt = surface_prep(model_sw, sfc_alb,
                                                   tsi, sza_deg, ng_sw)

    ct = COL_TILE
    ncol_pad = ((ncol + ct - 1) // ct) * ct
    lb = derive_layer_block(nlay, p_lw.n_p)
    n_blk = -(-nlay // lb)
    n_blk_lev = -(-(nlay + 1) // lb)
    rows_pad = n_blk * lb
    rows_pad_lev = n_blk_lev * lb
    if INKERNEL_BLOCK:
        blk = lambda x, pv=None: _pad_cols(_pad_rows(x, rows_pad, pv),
                                           ncol_pad)
        blkc = lambda x, pv=None: _rows_t(x, rows_pad, ncol_pad, pv)
        blkc_lev = lambda x, pv=None: _rows_t(x, rows_pad_lev, ncol_pad, pv)
    else:
        blk = lambda x, pv=None: _block_lanes(x, lb, ct, pv)
        blkc = lambda x, pv=None: _block_cols(x, lb, ct, ncol_pad, pv)
        blkc_lev = blkc
    logp_t = blkc(jnp.log(0.5 * (plev[:, 1:] + plev[:, :-1])).astype(F32))
    dp_t = blkc((plev[:, 1:] - plev[:, :-1]).astype(F32), 0.0)
    tlay_t = blkc(tlay.astype(F32))
    tlev_t = blkc_lev(tlev.astype(F32))
    tsfc_t = _pad_cols(tsfc.astype(F32)[None, :], ncol_pad)
    emis_t = _pad_cols(
        jnp.zeros((ng_lw, ncol), F32).at[:model_lw.ngpt].set(
            emis_gpt.astype(F32).T), ncol_pad)
    mu0_t = _pad_cols(mu0[None, :].astype(F32), ncol_pad)
    tsi_t = _pad_cols(tsi_scale.astype(F32), ncol_pad)
    alb_t = _pad_cols(alb_gpt, ncol_pad)
    vmrp_t = blk(_pad_cols(vmr_prof, ncol_pad))
    vmrs_t = _pad_cols(vmr_scal, ncol_pad)

    secants, weights = gauss_angles(n_gauss_angles)
    one_angle = n_gauss_angles == 1
    roll = common.roll_angle_sweeps()
    kernel = functools.partial(
        _lwsw_kernel, lw_plan=p_lw, sw_plan=p_sw, lw_kinds=lw_kinds,
        sw_kinds=sw_kinds, nlay=nlay, n_planck=n_planck, npl_pad=npl_pad,
        secants=tuple(float(s) for s in secants),
        weights=tuple(float(w) for w in weights), lb=lb,
        n_blk=n_blk, n_blk_lev=n_blk_lev, ctile=ct, wp=P_WINDOW,
        wv=V_WINDOW, inblock=INKERNEL_BLOCK, roll=roll)

    nlev = nlay + 1
    n_vp, n_vs = vmrp_t.shape[0], vmrs_t.shape[0]
    rep2 = lambda i: (0, 0)
    col2 = lambda i: (0, i)
    rep3c = lambda i: (0, 0, i)
    if INKERNEL_BLOCK:
        lanes_in, lay_rows, lev_rows = ct, rows_pad, rows_pad_lev
    else:
        lanes_in, lay_rows, lev_rows = lb * ct, n_blk, n_blk_lev
    blkspec = lambda rows: pl.BlockSpec((rows, lanes_in), col2,
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(ncol_pad // ct,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_p_pad, 1), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(lw_table.shape, rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(lw_table.shape, rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(lw_lut.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lw_lut.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npl_pad, ng_lw), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((npl_pad, ng_lw), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_lw, 1), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(sw_table.shape, rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(sw_table.shape, rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(sw_lut.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sw_lut.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_sw, 1), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_sw, 1), rep2, memory_space=pltpu.VMEM),
            blkspec(lay_rows),                       # logp
            blkspec(lay_rows),                       # dp
            blkspec(lay_rows),                       # tlay
            blkspec(lev_rows),                       # tlev
            pl.BlockSpec((1, ct), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_lw, ct), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_sw, ct), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_vp, lay_rows, lanes_in), rep3c,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_vs, ct), col2, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((nlev, ct), col2,
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_pad), F32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((n_blk, ng_lw, lb * ct), F32),     # lw trans/tau
            # lw src dn (1-angle) / layer planck (multi-angle): consumed
            # in-loop when the 1-angle forward sweep is fused into phase
            # A — keep only a dummy block then.
            pltpu.VMEM((1 if (FUSE_FWD and one_angle) else n_blk,
                        ng_lw, lb * ct), F32),
            # lw src up: only the 1-angle sweeps read it (multi-angle
            # computes per-angle sources into lw_srcup_s instead).
            pltpu.VMEM((n_blk if one_angle else 1, ng_lw, lb * ct), F32),
            pltpu.VMEM((n_blk_lev, ng_lw, lb * ct), F32),  # planck lev
            pltpu.VMEM((n_blk, ng_sw, lb * ct), F32),     # r_dif
            pltpu.VMEM((n_blk, ng_sw, lb * ct), F32),     # t_dif
            pltpu.VMEM((n_blk, ng_sw, lb * ct), F32),     # sw src up
            pltpu.VMEM((n_blk, ng_sw, lb * ct), F32),     # sw src dn
            pltpu.VMEM((nlev, ng_sw, ct), F32),           # albedo/level
            pltpu.VMEM((nlev, ng_sw, ct), F32),           # src/level
            pltpu.VMEM((n_blk, ng_sw, lb * ct), F32),     # t_noscat/denom
            # Blocked-input staging (1-row dummies when the in-kernel
            # relayout is off; see lw.py).
            pltpu.VMEM((n_blk, lb * ct) if INKERNEL_BLOCK
                       else (1, ct), F32),                # logp blocked
            pltpu.VMEM((n_blk, lb * ct) if INKERNEL_BLOCK
                       else (1, ct), F32),                # dp blocked
            pltpu.VMEM((n_blk, lb * ct) if INKERNEL_BLOCK
                       else (1, ct), F32),                # tlay blocked
            pltpu.VMEM((n_blk_lev, lb * ct) if INKERNEL_BLOCK
                       else (1, ct), F32),                # tlev blocked
            pltpu.VMEM((n_vp, n_blk, lb * ct) if INKERNEL_BLOCK
                       else (1, 1, ct), F32),             # vmr blocked
            # Per-layer-ROW trans / src_up staging for the multi-angle
            # LW sweeps (1-row dummies in the 1-angle mode): n_blk*lb
            # rows so the rolled sweeps' traced-row stores stay in
            # bounds on padded tails (common.multi_angle_lw_sweeps).
            pltpu.VMEM((1, 1, ct) if one_angle
                       else (n_blk * lb, ng_lw, ct), F32),  # lw trans (ang)
            pltpu.VMEM((1, 1, ct) if one_angle
                       else (n_blk * lb, ng_lw, ct), F32),  # lw srcup (ang)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(params, t_first, lw_table_hi, lw_table_lo, lw_lut_hi, lw_lut_lo,
      planck_hi, planck_lo,
      planck_row0, sw_table_hi, sw_table_lo, sw_lut_hi, sw_lut_lo, ray,
      solar_col, logp_t, dp_t,
      tlay_t, tlev_t, tsfc_t, emis_t, mu0_t, tsi_t, alb_t, vmrp_t,
      vmrs_t)
    lw_up, lw_dn, sw_up, sw_dn = out
    mask = usecol.astype(F32)[:, None]
    return (lw_up[:, :ncol].T, lw_dn[:, :ncol].T,
            sw_up[:, :ncol].T * mask, sw_dn[:, :ncol].T * mask)
