"""Fused shortwave mega-kernel: gas optics + Rayleigh + two-stream adding.

One Pallas kernel per 128-column tile runs the whole shortwave chain the
reference needs — ecCKD optical depth (gas_optics_ecckd.f90:64-241), Rayleigh
scattering (:293-319), TOA solar source with TSI renormalization
(ecckd_rfmip_sw.F90:118-133) and the rte_sw two-stream/adding solve
(SURVEY.md section 2.3) — with all per-layer intermediates in VMEM scratch.

The two-stream coefficients specialize the Meador-Weaver/PIFM forms of
solvers/two_stream.py to the gas-only case g == 0 (the ecckd pipeline never
produces asymmetric scattering; gas_optics_ecckd.f90:461 sets g = 0).
Layout is (g-point, column) = (sublane, lane); see ops/pallas/lw.py.
"""
from __future__ import annotations

import functools
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
from ecckd_tpu.ops.pallas.lw import (COL_TILE, INKERNEL_BLOCK,
                                     P_INV_DLOGP, P_INV_DLOGV, P_INV_DT,
                                     P_LOG_MF0, P_LOG_P0, P_WINDOW,
                                     UNROLL_BLOCKS, V_WINDOW,
                                     _block_cols, _block_lanes, _pad_cols,
                                     _pad_rows, _rows_t, derive_layer_block)

F32 = jnp.float32


def _sw_kernel(params_ref, t_first_ref, table_hi_ref, table_lo_ref,
               lut_hi_ref, lut_lo_ref,
               ray_ref, solar_ref,
               logp_ref, dp_ref, tlay_ref, mu0_ref, tsi_scale_ref,
               alb_dir_ref, alb_dif_ref, vmrp_ref, vmrs_ref, up_ref, dn_ref,
               rdif_s, tdif_s, srcup_s, srcdn_s, albedo_s, src_s, denom_s,
               logp_s, dp_s, tlay_s, vmrp_s,
               *, plan: plan_mod.GasOpticsPlan, vmr_kinds, nlay: int,
               lb: int, n_blk: int, ctile: int, wp: int, wv: int,
               inblock: bool):
    if inblock:
        # Row-major inputs -> layer-blocked lane layout, in-kernel (see
        # common.fill_lane_blocks).
        common.fill_lane_blocks(logp_s, logp_ref, n_blk, lb)
        common.fill_lane_blocks(dp_s, dp_ref, n_blk, lb)
        common.fill_lane_blocks(tlay_s, tlay_ref, n_blk, lb)
        common.fill_lane_blocks(vmrp_s, vmrp_ref, n_blk, lb)
        logp_ref, dp_ref, tlay_ref, vmrp_ref = logp_s, dp_s, tlay_s, vmrp_s
    log_p0 = params_ref[P_LOG_P0]
    inv_dlogp = params_ref[P_INV_DLOGP]
    inv_dt = params_ref[P_INV_DT]
    log_mf0 = params_ref[P_LOG_MF0]
    inv_dlogv = params_ref[P_INV_DLOGV]
    mpp = F32(constants.MOLES_PER_PA)

    # mu0 is layer-invariant: one (1, C) row per tile, lane-tiled to the
    # blocked (1, lb*C) layout in VMEM where phase A needs it.
    mu0_tile = mu0_ref[...]                  # (1, C)
    mu0_blk = (jnp.concatenate([mu0_tile] * lb, axis=1) if lb > 1
               else mu0_tile)                # (1, lb*C)
    inv_mu0_blk = 1.0 / mu0_blk
    up_ref[...] = jnp.zeros_like(up_ref)
    dn_ref[...] = jnp.zeros_like(dn_ref)

    dir_top = mu0_tile * tsi_scale_ref[...] * solar_ref[...]   # (NG, C)
    dn_ref[pl.ds(0, 1), :] = jnp.sum(dir_top, axis=0, keepdims=True)

    # --- Phase A (LAYER-BLOCKED): optics + two-stream R/T for lb layers
    # per iteration (one big MXU contraction; see gas_tau_block), stored
    # BLOCKED — one (NG, lb*C) store per scratch per block (per-layer
    # scatter stores at a traced index are ~4x the cost of the sweeps;
    # see ops/pallas/lw.py phase A).  t_noscat is staged in denom_s,
    # which phase B only overwrites after phase A1 consumed it.
    def optics_block(b, carry):
        mu0 = mu0_blk                                       # (1, lb*C)
        inv_mu0 = inv_mu0_blk
        tau_gas, d_p = common.gas_tau_block(
            b, logp_ref, dp_ref, tlay_ref, vmrp_ref, vmrs_ref, vmr_kinds,
            t_first_ref, table_hi_ref, table_lo_ref, lut_hi_ref,
            lut_lo_ref,
            log_p0, inv_dlogp, inv_dt, log_mf0, inv_dlogv, plan, mpp,
            lb=lb, wp=wp, wv=wv)
        tau_ray = (mpp * d_p) * ray_ref[...]                # (NG, C)
        tau = tau_gas + tau_ray
        # tau-scaled cancellation-free two-stream with g = 0: one divide
        # per block (see common.two_stream_g0's derivation notes).
        r_dif, t_dif, r_dir, t_dir, t_noscat = common.two_stream_g0(
            tau, tau_ray, mu0, inv_mu0)

        rdif_s[b] = r_dif
        tdif_s[b] = t_dif
        srcup_s[b] = r_dir
        srcdn_s[b] = t_dir
        denom_s[b] = t_noscat
        return carry

    common.fori32(0, n_blk, optics_block, 0, unroll=UNROLL_BLOCKS)

    # Blocked-scratch addressing: the one definition in common.py.
    chunk = lambda ref, j: common.chunk(ref, j, lb, ctile)
    chunk_set = lambda ref, j, val: common.chunk_set(ref, j, val, lb,
                                                     ctile)

    # --- Phase A1: serial direct-beam sweep (top-down) -------------------
    direct = dir_top
    for j in range(nlay):
        chunk_set(srcup_s, j, chunk(srcup_s, j) * direct)
        chunk_set(srcdn_s, j, chunk(srcdn_s, j) * direct)
        direct = chunk(denom_s, j) * direct  # t_noscat staged in denom_s
        dn_ref[pl.ds(j + 1, 1), :] = jnp.sum(direct, axis=0, keepdims=True)
    dir_sfc = direct

    # --- Phase B: albedo/source of the stack below each level (bottom-up) -
    albedo_s[nlay] = alb_dif_ref[...]
    src_s[nlay] = alb_dir_ref[...] * dir_sfc

    # Per-step algebra lives in ONE home shared with the merged kernel
    # (common.sw_adding_up_step / sw_adding_dn_step).
    albedo, src = albedo_s[nlay], src_s[nlay]
    for j in reversed(range(nlay)):
        denom, albedo, src = common.sw_adding_up_step(
            chunk(rdif_s, j), chunk(tdif_s, j), albedo, src,
            chunk(srcup_s, j), chunk(srcdn_s, j))
        chunk_set(denom_s, j, denom)
        albedo_s[j] = albedo
        src_s[j] = src

    # --- Phase C: downward diffuse sweep, fusing the broadband sums -------
    up_ref[pl.ds(0, 1), :] = jnp.sum(src_s[0], axis=0, keepdims=True)

    dn = jnp.zeros_like(dir_top)
    for j in range(nlay):
        dn, up = common.sw_adding_dn_step(
            chunk(tdif_s, j), chunk(rdif_s, j), chunk(denom_s, j), dn,
            albedo_s[j + 1], src_s[j + 1], chunk(srcdn_s, j))
        dn_ref[pl.ds(j + 1, 1), :] += jnp.sum(dn, axis=0, keepdims=True)
        up_ref[pl.ds(j + 1, 1), :] = jnp.sum(up, axis=0, keepdims=True)


def surface_prep(model: CKDModel, sfc_alb: jax.Array, tsi: jax.Array,
                 sza_deg: jax.Array, ng: int):
    """SW driver-semantics prep shared by the separate and MERGED
    kernels — one home for three load-bearing parity behaviors:

    * TSI renormalization (ecckd_rfmip_sw.F90:125-133): requested TSI
      over the ckd file's default irradiance sum;
    * the night mask (ecckd_rfmip_sw.F90:106-108): a column is daytime
      iff sza < 90 deg minus two f32 ulps;
    * surface albedo expansion: (ncol,) spectrally constant or
      (ncol, ngpt) per-g-point, zero-padded to the NG sublane rows.

    Returns (tsi_scale (1, ncol), usecol (ncol,) bool, mu0 (ncol,),
    alb_gpt (ng, ncol))."""
    ncol = int(sza_deg.shape[0])
    tsi_scale = (tsi.astype(F32)
                 / jnp.sum(model.solar_irradiance.astype(F32)))[None, :]
    spacing90 = float(np.spacing(np.float32(90.0)))
    usecol = sza_deg.astype(F32) < (90.0 - 2.0 * spacing90)
    deg_to_rad = jnp.asarray(np.arccos(-1.0) / 180.0, F32)
    mu0 = jnp.where(usecol, jnp.cos(sza_deg.astype(F32) * deg_to_rad),
                    1.0)
    alb2d = (sfc_alb.astype(F32).T if sfc_alb.ndim == 2 else
             jnp.broadcast_to(sfc_alb.astype(F32)[None, :],
                              (model.ngpt, ncol)))
    alb_gpt = jnp.zeros((ng, ncol), F32).at[:model.ngpt].set(alb2d)
    return tsi_scale, usecol, mu0, alb_gpt


def sw_fluxes_fused(model: CKDModel, plev: jax.Array, tlay: jax.Array,
                    gas_concs: GasConcs, sfc_alb: jax.Array, tsi: jax.Array,
                    sza_deg: jax.Array, interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """Broadband SW fluxes via the fused kernel (top_at_1 orientation).

    Args mirror pipeline.sw_fluxes (spectrally-constant surface albedo,
    requested TSI, solar zenith angle in degrees; night-column masking per
    ecckd_rfmip_sw.F90:106-108,155-161).  Returns (flux_up, flux_dn), each
    (ncol, nlay+1).
    """
    ncol, nlay = tlay.shape
    p = plan_mod.build_plan(model, gas_concs.names)
    if not p.fused_ok:
        raise ValueError("fused path invalid for this model (negative "
                         "table entries); use the XLA path")
    ng = p.ng_pad
    n_p_pad = ((p.n_p + 7) // 8) * 8

    table_t, lut_t = plan_mod.kernel_tables(model, p, gas_concs.names, F32)
    table_hi, table_lo = common.split_for_mxu(table_t)
    lut_hi, lut_lo = common.split_for_mxu(lut_t)
    vmr_prof, vmr_scal, vmr_kinds = plan_mod.split_vmrs(
        p, gas_concs, ncol, nlay, F32)
    if vmr_prof is None:
        vmr_prof = jnp.zeros((1, nlay, ncol), F32)
    if vmr_scal is None:
        vmr_scal = jnp.zeros((1, ncol), F32)

    lp = model.log_pressure.astype(F32)
    tg = model.temperature_grid.astype(F32)
    params = jnp.stack([
        lp[0], 1.0 / (lp[1] - lp[0]), 1.0 / (tg[0, 1] - tg[0, 0]),
        jnp.zeros((), F32), jnp.zeros((), F32),
        jnp.asarray(p.lut_log_mf0[0] if p.lut_log_mf0 else 0.0, F32),
        jnp.asarray(p.lut_inv_dlog[0] if p.lut_inv_dlog else 0.0, F32),
        jnp.zeros((), F32)])

    t_first = jnp.zeros((n_p_pad, 1), F32).at[:p.n_p, 0].set(tg[:, 0])
    solar = model.solar_irradiance.astype(F32)
    ray = jnp.zeros((ng, 1), F32).at[:model.ngpt, 0].set(
        model.rayleigh_coeff.astype(F32))
    solar_col = jnp.zeros((ng, 1), F32).at[:model.ngpt, 0].set(solar)

    tsi_scale, usecol, mu0, alb_gpt = surface_prep(model, sfc_alb, tsi,
                                                   sza_deg, ng)

    ncol_pad = ((ncol + COL_TILE - 1) // COL_TILE) * COL_TILE
    # Single binding for the layer-block size: rows_pad, the blk/blkc
    # relayouts, the kernel and the scratch shapes must all agree on it.
    lb = derive_layer_block(nlay, p.n_p)
    n_blk = -(-nlay // lb)
    rows_pad = n_blk * lb
    if INKERNEL_BLOCK:
        blk = lambda x, pv=None: _pad_cols(_pad_rows(x, rows_pad, pv),
                                           ncol_pad)
        blkc = lambda x, pv=None: _rows_t(x, rows_pad, ncol_pad, pv)
    else:
        blk = lambda x, pv=None: _block_lanes(x, lb, COL_TILE, pv)
        blkc = lambda x, pv=None: _block_cols(x, lb, COL_TILE, ncol_pad, pv)
    logp_t = blkc(jnp.log(0.5 * (plev[:, 1:] + plev[:, :-1])).astype(F32))
    dp_t = blkc((plev[:, 1:] - plev[:, :-1]).astype(F32), 0.0)
    tlay_t = blkc(tlay.astype(F32))
    mu0_t = _pad_cols(mu0[None, :].astype(F32), ncol_pad)
    tsi_t = _pad_cols(tsi_scale.astype(F32), ncol_pad)
    alb_t = _pad_cols(alb_gpt, ncol_pad)
    vmrp_t = blk(_pad_cols(vmr_prof, ncol_pad))
    vmrs_t = _pad_cols(vmr_scal, ncol_pad)

    kernel = functools.partial(_sw_kernel, plan=p, vmr_kinds=vmr_kinds,
                               nlay=nlay, lb=lb,
                               n_blk=n_blk, ctile=COL_TILE, wp=P_WINDOW,
                               wv=V_WINDOW, inblock=INKERNEL_BLOCK)
    nlev = nlay + 1
    n_vp, n_vs = vmrp_t.shape[0], vmrs_t.shape[0]
    rep2 = lambda i: (0, 0)
    rep3c = lambda i: (0, 0, i)
    col2 = lambda i: (0, i)
    if INKERNEL_BLOCK:
        lanes_in, lay_rows = COL_TILE, rows_pad
    else:
        lanes_in, lay_rows = lb * COL_TILE, n_blk
    out = pl.pallas_call(
        kernel,
        grid=(ncol_pad // COL_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_p_pad, 1), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(table_t.shape, rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(table_t.shape, rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(lut_t.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lut_t.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((lay_rows, lanes_in), col2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lay_rows, lanes_in), col2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lay_rows, lanes_in), col2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, COL_TILE), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, COL_TILE), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, COL_TILE), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, COL_TILE), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_vp, lay_rows, lanes_in), rep3c,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_vs, COL_TILE), col2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nlev, COL_TILE), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nlev, COL_TILE), col2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nlev, ncol_pad), F32),
            jax.ShapeDtypeStruct((nlev, ncol_pad), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_blk, ng, lb * COL_TILE), F32),  # r_dif
            pltpu.VMEM((n_blk, ng, lb * COL_TILE), F32),  # t_dif
            pltpu.VMEM((n_blk, ng, lb * COL_TILE), F32),  # src up (r_dir)
            pltpu.VMEM((n_blk, ng, lb * COL_TILE), F32),  # src dn (t_dir)
            pltpu.VMEM((nlev, ng, COL_TILE), F32),        # albedo per level
            pltpu.VMEM((nlev, ng, COL_TILE), F32),        # src per level
            pltpu.VMEM((n_blk, ng, lb * COL_TILE), F32),  # t_noscat -> denom
            # Blocked-input staging (1-row dummies when the in-kernel
            # relayout is off; see lw.py).
            pltpu.VMEM((n_blk, lb * COL_TILE) if INKERNEL_BLOCK
                       else (1, COL_TILE), F32),          # logp blocked
            pltpu.VMEM((n_blk, lb * COL_TILE) if INKERNEL_BLOCK
                       else (1, COL_TILE), F32),          # dp blocked
            pltpu.VMEM((n_blk, lb * COL_TILE) if INKERNEL_BLOCK
                       else (1, COL_TILE), F32),          # tlay blocked
            pltpu.VMEM((n_vp, n_blk, lb * COL_TILE) if INKERNEL_BLOCK
                       else (1, 1, COL_TILE), F32),       # vmr blocked
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # The windowed/full contraction cond co-allocates both
            # branches' stack buffers; the default 16 MB scoped-vmem soft
            # limit is slightly exceeded, the physical budget is not.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(params, t_first, table_hi, table_lo, lut_hi, lut_lo, ray,
      solar_col, logp_t, dp_t,
      tlay_t, mu0_t, tsi_t, alb_t, alb_t, vmrp_t, vmrs_t)
    flux_up, flux_dn = out
    mask = usecol.astype(F32)[:, None]
    return flux_up[:, :ncol].T * mask, flux_dn[:, :ncol].T * mask
