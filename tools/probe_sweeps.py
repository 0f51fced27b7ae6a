"""Sweep-cost probe for the merged kernel: how much of the solve is the
per-level broadband reductions + output accumulates inside the five
sequential sweeps (vs the FMA recurrences themselves)?

Monkeypatches lwsw._lwsw_kernel with a dep-preserving variant whose sweeps
keep every recurrence (so the serial chains and their VPU FMAs remain) but
drop the per-level sum/store, emitting only one final reduction per sweep.
The delta bounds what a batched-reduction restructure could save.

Usage: python tools/probe_sweeps.py [ncol]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from ecckd_tpu.cli.common import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

from __graft_entry__ import _example_batch  # noqa: E402
from ecckd_tpu import constants  # noqa: E402
from ecckd_tpu.models.loader import load_ckd_model  # noqa: E402
from ecckd_tpu.ops.pallas import common, lwsw, plan as plan_mod  # noqa: E402

import jax.experimental.pallas as pl  # noqa: E402

F32 = jnp.float32
NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
NLAY = 60
ITERS = 10
EPOCHS = 4

LW_FILE = ("/root/reference/data/"
           "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
SW_FILE = ("/root/reference/data/"
           "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")

_orig_kernel = lwsw._lwsw_kernel


def _noreduce_kernel(*refs, **kw):
    """Same as lwsw._lwsw_kernel but with per-level reductions removed."""
    (params_ref, t_first_ref,
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
     lw_trans_s, lw_srcup_s) = refs
    lw_plan = kw["lw_plan"]
    nlay = kw["nlay"]
    lb, n_blk, n_blk_lev = kw["lb"], kw["n_blk"], kw["n_blk_lev"]
    ctile = kw["ctile"]
    inblock = kw["inblock"]
    secant, weight = kw["secants"][0], kw["weights"][0]

    if inblock:
        common.fill_lane_blocks(logp_s, logp_ref, n_blk, lb)
        common.fill_lane_blocks(dp_s, dp_ref, n_blk, lb)
        common.fill_lane_blocks(tlay_s, tlay_ref, n_blk, lb)
        common.fill_lane_blocks(tlev_s, tlev_ref, n_blk_lev, lb)
        common.fill_lane_blocks(vmrp_s, vmrp_ref, n_blk, lb)
        logp_ref, dp_ref, tlay_ref = logp_s, dp_s, tlay_s
        tlev_ref, vmrp_ref = tlev_s, vmrp_s
    log_p0 = params_ref[lwsw.P_LOG_P0]
    inv_dlogp = params_ref[lwsw.P_INV_DLOGP]
    inv_dt = params_ref[lwsw.P_INV_DT]
    mpp = F32(constants.MOLES_PER_PA)
    inv_pi = F32(1.0 / constants.PI)
    thresh = F32(float(np.sqrt(np.finfo(np.float32).eps)))
    planck = functools.partial(
        common.planck_eval, planck_hi_ref=planck_hi_ref,
        planck_lo_ref=planck_lo_ref, planck_row0_ref=planck_row0_ref,
        t0=params_ref[lwsw.P_PLANCK_T0],
        inv_dt=params_ref[lwsw.P_INV_PLANCK_DT],
        n_planck=kw["n_planck"], npl_pad=kw["npl_pad"], inv_pi=inv_pi)
    specs = (
        (kw["lw_plan"], kw["lw_kinds"], lw_table_hi_ref, lw_table_lo_ref,
         lw_lut_hi_ref, lw_lut_lo_ref,
         params_ref[lwsw.P_LW_LOG_MF0], params_ref[lwsw.P_LW_INV_DLOGV]),
        (kw["sw_plan"], kw["sw_kinds"], sw_table_hi_ref, sw_table_lo_ref,
         sw_lut_hi_ref, sw_lut_lo_ref,
         params_ref[lwsw.P_SW_LOG_MF0], params_ref[lwsw.P_SW_INV_DLOGV]),
    )
    mu0_tile = mu0_ref[...]
    mu0_blk = (jnp.concatenate([mu0_tile] * lb, axis=1) if lb > 1
               else mu0_tile)
    inv_mu0_blk = 1.0 / mu0_blk
    for ref in (lwup_ref, lwdn_ref, swup_ref, swdn_ref):
        ref[...] = jnp.zeros_like(ref)
    dir_top = mu0_tile * tsi_scale_ref[...] * solar_ref[...]

    def level_blk_eval(b, carry):
        plevb_s[b] = planck(tlev_ref[pl.ds(b, 1), :])
        return carry

    common.fori32(0, n_blk_lev, level_blk_eval, 0)

    def optics_block(b, carry):
        (tau_lw, tau_sw), d_p = common.gas_tau_block_multi(
            b, logp_ref, dp_ref, tlay_ref, vmrp_ref, vmrs_ref,
            t_first_ref, specs, log_p0, inv_dlogp, inv_dt, mpp,
            lb=lb, wp=kw["wp"], wv=kw["wv"])
        play_blk = planck(tlay_ref[pl.ds(b, 1), :])
        lev_dec = plevb_s[b]
        b_next = jnp.minimum(b + 1, n_blk_lev - 1)
        lev_inc = jnp.concatenate(
            [lev_dec[:, ctile:], plevb_s[b_next][:, :ctile]], axis=1)
        ts = tau_lw * F32(secant)
        omt = -common.expm1_accurate(-ts)
        tr = 1.0 - omt
        fact = jnp.where(ts > thresh,
                         omt / jnp.maximum(ts, thresh) - tr,
                         ts * (0.5 - ts * (1.0 / 3.0)))
        blk_a_s[b] = tr
        blk_b_s[b] = omt * lev_inc + 2.0 * fact * (play_blk - lev_inc)
        blk_c_s[b] = omt * lev_dec + 2.0 * fact * (play_blk - lev_dec)
        tau_ray = (mpp * d_p) * ray_ref[...]
        tau = tau_sw + tau_ray
        r_dif, t_dif, r_dir, t_dir, t_noscat = common.two_stream_g0(
            tau, tau_ray, mu0_blk, inv_mu0_blk)
        rdif_s[b] = r_dif
        tdif_s[b] = t_dif
        srcup_s[b] = r_dir
        srcdn_s[b] = t_dir
        denom_s[b] = t_noscat
        return carry

    common.fori32(0, n_blk, optics_block, 0)

    def chunk(ref, j):
        bb, l = divmod(j, lb)
        return ref[bb][:, l * ctile:(l + 1) * ctile]

    def chunk_set(ref, j, val):
        bb, l = divmod(j, lb)
        ref[bb, :, l * ctile:(l + 1) * ctile] = val

    # --- LW sweeps WITHOUT per-level reduction/accumulate ---------------
    sfc_src = planck(tsfc_ref[...])
    emis = emis_ref[...]
    w2pi = F32(2.0 * constants.PI * weight)
    rad = jnp.zeros_like(sfc_src)
    for j in range(nlay):
        rad = chunk(blk_a_s, j) * rad + chunk(blk_b_s, j)
    lwdn_ref[pl.ds(nlay, 1), :] = w2pi * jnp.sum(rad, axis=0,
                                                 keepdims=True)
    rad = emis * sfc_src + (1.0 - emis) * rad
    for j in reversed(range(nlay)):
        rad = chunk(blk_a_s, j) * rad + chunk(blk_c_s, j)
    lwup_ref[pl.ds(0, 1), :] = w2pi * jnp.sum(rad, axis=0, keepdims=True)

    # --- SW sweeps WITHOUT per-level reduction ---------------------------
    direct = dir_top
    for j in range(nlay):
        chunk_set(srcup_s, j, chunk(srcup_s, j) * direct)
        chunk_set(srcdn_s, j, chunk(srcdn_s, j) * direct)
        direct = chunk(denom_s, j) * direct
    dir_sfc = direct
    swdn_ref[pl.ds(nlay, 1), :] = jnp.sum(dir_sfc, axis=0, keepdims=True)

    albedo_s[nlay] = alb_ref[...]
    src_s[nlay] = alb_ref[...] * dir_sfc
    albedo, src = albedo_s[nlay], src_s[nlay]
    for j in reversed(range(nlay)):
        r_dif = chunk(rdif_s, j)
        t_dif = chunk(tdif_s, j)
        denom = 1.0 / (1.0 - r_dif * albedo)
        chunk_set(denom_s, j, denom)
        albedo_new = r_dif + t_dif * t_dif * albedo * denom
        src = chunk(srcup_s, j) + t_dif * denom * (src + albedo
                                                   * chunk(srcdn_s, j))
        albedo = albedo_new
        albedo_s[j] = albedo
        src_s[j] = src
    swup_ref[pl.ds(0, 1), :] = jnp.sum(src_s[0], axis=0, keepdims=True)
    dn = jnp.zeros_like(dir_top)
    for j in range(nlay):
        dn = (chunk(tdif_s, j) * dn + chunk(rdif_s, j) * src_s[j + 1]
              + chunk(srcdn_s, j)) * chunk(denom_s, j)
    swdn_ref[pl.ds(0, 1), :] = jnp.sum(dn, axis=0, keepdims=True)


def build():
    lw = jax.device_put(load_ckd_model(LW_FILE, dtype=np.float32))
    sw = jax.device_put(load_ckd_model(SW_FILE, dtype=np.float32))
    b = _example_batch(NCOL, NLAY, np.float32)
    args = {k: jax.device_put(v) for k, v in b.items()}
    return lw, sw, args


def make_step(lw, sw, args):
    def fn(ml, ms, plev, tlay, tlev, tsfc, emis, concs, alb, tsi, sza):
        emis_gpt = jnp.broadcast_to(emis[:, None], (plev.shape[0], ml.ngpt))
        out = lwsw.lwsw_fluxes_fused(ml, ms, plev, tlay, tlev, tsfc,
                                     emis_gpt, concs, alb, tsi, sza)
        return sum(jnp.sum(o[:, 0]) + jnp.sum(o[:, -1]) for o in out)

    jf = jax.jit(fn)

    def step():
        return jf(lw, sw, args["plev"], args["tlay"], args["tlev"],
                  args["tsfc"], args["emis"], args["concs"], args["alb"],
                  args["tsi"], args["sza"])
    return step


def timeit(step) -> float:
    for _ in range(2):
        float(step())
    best = 1e30
    for _ in range(EPOCHS):
        t0 = time.perf_counter()
        acc = step()
        for _ in range(ITERS - 1):
            acc = acc + step()
        float(acc)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    # This kernel copy is the UNFUSED 1-angle body (it writes blk_b_s[b]
    # for every block); the wrapper's scratch allocation must match.
    lwsw.FUSE_FWD = False
    lw, sw, args = build()
    full = timeit(make_step(lw, sw, args))
    lwsw._lwsw_kernel = _noreduce_kernel
    try:
        nored = timeit(make_step(lw, sw, args))
    finally:
        lwsw._lwsw_kernel = _orig_kernel
    full2 = timeit(make_step(lw, sw, args))
    ms = lambda t: t * 1e3
    print(f"full      {ms(full):7.2f} ms  {NCOL/full:12,.0f} cols/s")
    print(f"noreduce  {ms(nored):7.2f} ms  {NCOL/nored:12,.0f} cols/s  "
          f"delta {ms(full-nored):6.2f} ms")
    print(f"full2     {ms(full2):7.2f} ms  {NCOL/full2:12,.0f} cols/s")


if __name__ == "__main__":
    main()
