"""Residual decomposition probe for the merged LW+SW mega-kernel.

VERDICT r3 #1: the round-3 attribution covered ~21 ms of the ~29 ms
merged solve (gas 13.2, Planck 3.0, two-stream 2.8, expm1 1.55) and left
~8 ms "distributed vreg/scratch/loop traffic with no single owner".
probe_merged.py neuters the PHASE-A helpers; this probe sections the
KERNEL BODY itself (by monkeypatching lwsw._lwsw_kernel with an ablated
copy) to decompose the remainder:

  null_body    outputs zeroed, one input read     -> grid/dispatch floor
  phaseA_only  phase A + stores, sweeps replaced  -> sweeps cost (delta
               by one consume of each scratch        vs full)
  sweeps_only  phase A replaced by cheap stores,  -> phase-A cost cross-
               all three sweeps full                 check (dual of above)
  fwd_only     phase A + forward sweep only       -> per-sweep split
  fwd_bwd      + backward sweep                   -> per-sweep split
  full         unmodified                         -> anchor (and drift
                                                     check vs lwsw's own)

All timings are in-process best-of-EPOCHS batched dispatch (the only
protocol that is stable through the tunneled chip; docs/DESIGN.md).
The ablated variants produce WRONG fluxes by construction — they keep
data dependences so Mosaic cannot DCE them, nothing more.

Usage:  python tools/probe_residual.py [ncol]
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
from ecckd_tpu.ops.pallas import common, lwsw  # noqa: E402
from ecckd_tpu.ops.pallas import plan as plan_mod  # noqa: E402
from ecckd_tpu.ops.pallas.lwsw import (P_INV_DLOGP, P_INV_DT,  # noqa: E402
                                       P_INV_PLANCK_DT, P_LOG_P0,
                                       P_LW_INV_DLOGV, P_LW_LOG_MF0,
                                       P_PLANCK_T0, P_SW_INV_DLOGV,
                                       P_SW_LOG_MF0, UNROLL_BLOCKS)

F32 = jnp.float32
NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
NLAY = 60
ITERS = 10
EPOCHS = 4

LW_FILE = ("/root/reference/data/"
           "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
SW_FILE = ("/root/reference/data/"
           "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")


def ablated_kernel(params_ref, t_first_ref,
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
                   lw_plan, sw_plan, lw_kinds, sw_kinds, nlay, n_planck,
                   npl_pad, secants, weights, lb, n_blk, n_blk_lev, ctile,
                   wp, wv, inblock, roll, ablate):
    """Sectioned copy of lwsw._lwsw_kernel (keep in sync by construction:
    the 'full' variant is cross-checked for timing parity with the real
    kernel at probe start)."""
    import jax.experimental.pallas as pl

    do_phase_a = ablate in ("full", "phaseA_only", "phaseA_nostores",
                            "phaseA_nolevcat", "fwd_only", "fwd_bwd")
    do_fwd = ablate in ("full", "sweeps_only", "fwd_only", "fwd_bwd")
    do_bwd = ablate in ("full", "sweeps_only", "fwd_bwd")
    do_down = ablate in ("full", "sweeps_only")
    one_store = ablate == "phaseA_nostores"
    no_levcat = ablate == "phaseA_nolevcat"

    for ref in (lwup_ref, lwdn_ref, swup_ref, swdn_ref):
        ref[...] = jnp.zeros_like(ref)

    if ablate.startswith("null_body"):
        # Grid/dispatch/in-out-BlockSpec floor: touch one row of each big
        # input so nothing is pruned, write outputs once.
        v = (logp_ref[pl.ds(0, 1), :ctile] + dp_ref[pl.ds(0, 1), :ctile]
             + tlay_ref[pl.ds(0, 1), :ctile] + tlev_ref[pl.ds(0, 1), :ctile]
             + vmrp_ref[0, pl.ds(0, 1), :ctile])
        if ablate == "null_body":   # null_body_notables skips every table
            v = v + jnp.sum(lw_table_hi_ref[pl.ds(0, 1), :].astype(F32))
            v = v + jnp.sum(sw_table_hi_ref[pl.ds(0, 1), :].astype(F32))
            v = v + jnp.sum(lw_lut_hi_ref[0, pl.ds(0, 1), :].astype(F32))
            v = v + jnp.sum(planck_hi_ref[pl.ds(0, 1), :].astype(F32))
        lwup_ref[pl.ds(0, 1), :] = v
        return

    if inblock:
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

    mu0_tile = mu0_ref[...]
    mu0_blk = (jnp.concatenate([mu0_tile] * lb, axis=1) if lb > 1
               else mu0_tile)
    inv_mu0_blk = 1.0 / mu0_blk

    dir_top = mu0_tile * tsi_scale_ref[...] * solar_ref[...]
    swdn_ref[pl.ds(0, 1), :] = jnp.sum(dir_top, axis=0, keepdims=True)

    if do_phase_a:
        def level_blk_eval(b, carry):
            plevb_s[b] = planck(tlev_ref[pl.ds(b, 1), :])
            return carry

        common.fori32(0, n_blk_lev, level_blk_eval, 0, unroll=UNROLL_BLOCKS)

        def optics_block(b, carry):
            (tau_lw, tau_sw), d_p = common.gas_tau_block_multi(
                b, logp_ref, dp_ref, tlay_ref, vmrp_ref, vmrs_ref,
                t_first_ref, specs, log_p0, inv_dlogp, inv_dt, mpp,
                lb=lb, wp=wp, wv=wv)
            play_blk = planck(tlay_ref[pl.ds(b, 1), :])
            lev_dec = plevb_s[b]
            if no_levcat:
                lev_inc = lev_dec        # WRONG physics; drops the concat
            else:
                b_next = jnp.minimum(b + 1, n_blk_lev - 1)
                lev_inc = jnp.concatenate(
                    [lev_dec[:, ctile:], plevb_s[b_next][:, :ctile]],
                    axis=1)
            ts = tau_lw * F32(secants[0])
            omt = -common.expm1_accurate(-ts)
            tr = 1.0 - omt
            fact = jnp.where(ts > thresh,
                             omt / jnp.maximum(ts, thresh) - tr,
                             ts * (0.5 - ts * (1.0 / 3.0)))
            src_b = omt * lev_inc + 2.0 * fact * (play_blk - lev_inc)
            src_c = omt * lev_dec + 2.0 * fact * (play_blk - lev_dec)
            tau_ray = (mpp * d_p) * ray_ref[...]
            tau = tau_sw + tau_ray
            r_dif, t_dif, r_dir, t_dir, t_noscat = common.two_stream_g0(
                tau, tau_ray, mu0_blk, inv_mu0_blk)
            if one_store:
                # Accumulate into the loop carry instead of 8 scratch
                # stores per block (same compute + deps, zero stores).
                acc_lw, acc_sw = carry
                acc_lw = acc_lw + tr + src_b + src_c
                acc_sw = (acc_sw + r_dif + t_dif + r_dir + t_dir
                          + t_noscat)
                return (acc_lw, acc_sw)
            blk_a_s[b] = tr
            blk_b_s[b] = src_b
            blk_c_s[b] = src_c
            rdif_s[b] = r_dif
            tdif_s[b] = t_dif
            srcup_s[b] = r_dir
            srcdn_s[b] = t_dir
            denom_s[b] = t_noscat
            return carry

        if one_store:
            acc0 = (jnp.zeros((lw_plan.ng_pad, lb * ctile), F32),
                    jnp.zeros((sw_plan.ng_pad, lb * ctile), F32))
            acc_lw, acc_sw = common.fori32(0, n_blk, optics_block, acc0,
                                           unroll=UNROLL_BLOCKS)
            blk_a_s[0] = acc_lw
            blk_b_s[0] = acc_lw * F32(0.5)
            blk_c_s[0] = acc_lw * F32(0.25)
            rdif_s[0] = acc_sw
            tdif_s[0] = acc_sw * F32(0.5)
            srcup_s[0] = acc_sw * F32(0.25)
            srcdn_s[0] = acc_sw * F32(0.125)
            denom_s[0] = acc_sw * F32(0.0625)
        else:
            common.fori32(0, n_blk, optics_block, 0, unroll=UNROLL_BLOCKS)
    else:
        # sweeps_only: dep-preserving cheap stores into every scratch the
        # sweeps read (no MXU, no planck, no transcendental).
        def cheap_block(b, carry):
            base = (tlay_ref[pl.ds(b, 1), :] * F32(1e-3)
                    + dp_ref[pl.ds(b, 1), :] * F32(1e-6))
            row_lw = jnp.broadcast_to(base * F32(0.5),
                                      (lw_plan.ng_pad, base.shape[-1]))
            row_sw = jnp.broadcast_to(base * F32(0.25),
                                      (sw_plan.ng_pad, base.shape[-1]))
            blk_a_s[b] = row_lw
            blk_b_s[b] = row_lw * F32(0.9)
            blk_c_s[b] = row_lw * F32(0.8)
            rdif_s[b] = row_sw * F32(0.1)
            tdif_s[b] = row_sw * F32(0.7)
            srcup_s[b] = row_sw * F32(0.05)
            srcdn_s[b] = row_sw * F32(0.04)
            denom_s[b] = row_sw * F32(0.99)
            return carry

        common.fori32(0, n_blk, cheap_block, 0, unroll=UNROLL_BLOCKS)
        tsfc_blk = (jnp.concatenate([tsfc_ref[...]] * lb, axis=1)
                    if lb > 1 else tsfc_ref[...])
        plevb_s[0] = jnp.broadcast_to(
            tsfc_blk * F32(1e-3), (lw_plan.ng_pad, lb * ctile))

    def chunk(ref, j):
        bb, l = divmod(j, lb)
        return ref[bb][:, l * ctile:(l + 1) * ctile]

    def chunk_set(ref, j, val):
        bb, l = divmod(j, lb)
        ref[bb, :, l * ctile:(l + 1) * ctile] = val

    sfc_src = (planck(tsfc_ref[...]) if do_phase_a
               else plevb_s[0][:, :ctile])
    emis = emis_ref[...]
    w2pi = F32(2.0 * constants.PI * weights[0])

    if not (do_fwd or do_bwd or do_down):
        # phaseA_only: one consume per scratch so phase A isn't DCE'd.
        acc = (chunk(blk_a_s, 0) + chunk(blk_b_s, 0) + chunk(blk_c_s, 0)
               + chunk(rdif_s, 0) + chunk(tdif_s, 0) + chunk(srcup_s, 0)
               + chunk(srcdn_s, 0) + chunk(denom_s, 0)
               + chunk(blk_a_s, nlay - 1) + sfc_src)
        lwup_ref[pl.ds(0, 1), :] = jnp.sum(acc, axis=0, keepdims=True)
        return

    rad = jnp.zeros_like(sfc_src)
    direct = dir_top
    if do_fwd:
        for j in range(nlay):
            rad = chunk(blk_a_s, j) * rad + chunk(blk_b_s, j)
            lwdn_ref[pl.ds(j + 1, 1), :] += w2pi * jnp.sum(
                rad, axis=0, keepdims=True)
            chunk_set(srcup_s, j, chunk(srcup_s, j) * direct)
            chunk_set(srcdn_s, j, chunk(srcdn_s, j) * direct)
            direct = chunk(denom_s, j) * direct
            swdn_ref[pl.ds(j + 1, 1), :] = jnp.sum(direct, axis=0,
                                                   keepdims=True)
    dir_sfc = direct

    rad = emis * sfc_src + (1.0 - emis) * rad
    lwup_ref[pl.ds(nlay, 1), :] += w2pi * jnp.sum(rad, axis=0,
                                                  keepdims=True)
    albedo_s[nlay] = alb_ref[...]
    src_s[nlay] = alb_ref[...] * dir_sfc
    albedo, src = albedo_s[nlay], src_s[nlay]

    if do_bwd:
        for j in reversed(range(nlay)):
            rad = chunk(blk_a_s, j) * rad + chunk(blk_c_s, j)
            lwup_ref[pl.ds(j, 1), :] += w2pi * jnp.sum(rad, axis=0,
                                                       keepdims=True)
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
    else:
        for j in range(0, nlay + 1, max(nlay // 3, 1)):
            albedo_s[j] = albedo
            src_s[j] = src

    swup_ref[pl.ds(0, 1), :] = jnp.sum(src_s[0], axis=0, keepdims=True)
    if do_down:
        dn = jnp.zeros_like(dir_top)
        for j in range(nlay):
            dn = (chunk(tdif_s, j) * dn + chunk(rdif_s, j) * src_s[j + 1]
                  + chunk(srcdn_s, j)) * chunk(denom_s, j)
            up = dn * albedo_s[j + 1] + src_s[j + 1]
            swdn_ref[pl.ds(j + 1, 1), :] += jnp.sum(dn, axis=0,
                                                    keepdims=True)
            swup_ref[pl.ds(j + 1, 1), :] = jnp.sum(up, axis=0,
                                                   keepdims=True)


def build():
    lw = load_ckd_model(LW_FILE, dtype=np.float32)
    sw = load_ckd_model(SW_FILE, dtype=np.float32)
    b = _example_batch(NCOL, NLAY, np.float32)
    return jax.device_put(lw), jax.device_put(sw), {
        k: jax.device_put(v) for k, v in b.items()}


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
    # The ablated kernel is a sectioned copy of the UNFUSED body (it
    # writes blk_b_s[b] for every block); lwsw_fluxes_fused sizes that
    # scratch to ONE block when FUSE_FWD is on, so the flag must be off
    # for the probe's allocation to match its kernel.
    lwsw.FUSE_FWD = False
    lw, sw, args = build()
    orig = lwsw._lwsw_kernel
    results = {}
    variants = ("full", "null_body", "null_body_notables", "phaseA_only",
                "phaseA_nostores", "phaseA_nolevcat", "sweeps_only",
                "fwd_only", "fwd_bwd")
    try:
        for ab in variants:
            lwsw._lwsw_kernel = functools.partial(ablated_kernel, ablate=ab)
            results[ab] = timeit(make_step(lw, sw, args))
            print(f"  {ab:<12} {results[ab]*1e3:8.2f} ms "
                  f"({NCOL/results[ab]/1e6:5.2f}M cols/s)", flush=True)
        lwsw._lwsw_kernel = orig
        results["real_full"] = timeit(make_step(lw, sw, args))
    finally:
        lwsw._lwsw_kernel = orig
    print(f"  {'real_full':<12} {results['real_full']*1e3:8.2f} ms")

    full = results["full"]
    r = results
    import os
    mode = os.environ.get("ECCKD_MXU_PRECISION", "bf16x3")
    print(f"\n=== residual decomposition, ncol={NCOL}, "
          f"mxu={mode} ===")
    print(f"copy-vs-real drift: {abs(full-r['real_full'])*1e3:.2f} ms"
          f" (must be ~0 or the sectioned copy diverged)")
    print(f"grid/dispatch floor (null_body):       "
          f"{r['null_body']*1e3:8.2f} ms")
    print(f"  of which table DMA (null - notables):"
          f"{(r['null_body']-r['null_body_notables'])*1e3:8.2f} ms")
    print(f"phase A (phaseA_only - null_body):     "
          f"{(r['phaseA_only']-r['null_body'])*1e3:8.2f} ms")
    print(f"  scratch stores (phaseA - nostores):  "
          f"{(r['phaseA_only']-r['phaseA_nostores'])*1e3:8.2f} ms")
    print(f"  lev_inc concat (phaseA - nolevcat):  "
          f"{(r['phaseA_only']-r['phaseA_nolevcat'])*1e3:8.2f} ms")
    print(f"all sweeps (full - phaseA_only):       "
          f"{(full-r['phaseA_only'])*1e3:8.2f} ms")
    print(f"  fwd sweep (fwd_only - phaseA_only):  "
          f"{(r['fwd_only']-r['phaseA_only'])*1e3:8.2f} ms")
    print(f"  bwd sweep (fwd_bwd - fwd_only):      "
          f"{(r['fwd_bwd']-r['fwd_only'])*1e3:8.2f} ms")
    print(f"  down sweep (full - fwd_bwd):         "
          f"{(full-r['fwd_bwd'])*1e3:8.2f} ms")
    print(f"sweeps+stores alone (sweeps_only):     "
          f"{r['sweeps_only']*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
