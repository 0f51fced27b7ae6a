"""Phase attribution probe for the merged LW+SW mega-kernel.

Times the full fused pipeline against dep-preserving NEUTERED variants in
ONE process (cross-process timing on the tunneled chip drifts +-40-60%;
see docs/DESIGN.md).  Each variant monkeypatches one in-kernel helper with
a cheap stand-in that keeps the data dependences (so nothing is DCE'd) and
re-traces; the delta vs the full kernel attributes that phase's cost.

Usage:  python tools/probe_merged.py [ncol]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ecckd_tpu.cli.common import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

from __graft_entry__ import _example_batch  # noqa: E402
from ecckd_tpu.models.loader import load_ckd_model  # noqa: E402
from ecckd_tpu.ops.pallas import common  # noqa: E402
from ecckd_tpu.ops.pallas import lwsw  # noqa: E402
from ecckd_tpu.ops.pallas.lw import (derive_layer_block, COL_TILE,
                                     _block_lanes,
                                     _pad_cols)  # noqa: E402

F32 = jnp.float32

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
NLAY = 60
ITERS = 10
EPOCHS = 4

LW_FILE = ("/root/reference/data/"
           "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
SW_FILE = ("/root/reference/data/"
           "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")


def build():
    lw = load_ckd_model(LW_FILE, dtype=np.float32)
    sw = load_ckd_model(SW_FILE, dtype=np.float32)
    b = _example_batch(NCOL, NLAY, np.float32)
    lw = jax.device_put(lw)
    sw = jax.device_put(sw)
    args = {k: jax.device_put(v) for k, v in b.items()}
    return lw, sw, args


def make_step(lw, sw, args):
    from ecckd_tpu.models.ckd import CKDModel  # noqa
    ngpt = lw.ngpt

    def fn(ml, ms, plev, tlay, tlev, tsfc, emis, concs, alb, tsi, sza):
        emis_gpt = jnp.broadcast_to(emis[:, None], (plev.shape[0], ml.ngpt))
        out = lwsw.lwsw_fluxes_fused(ml, ms, plev, tlay, tlev, tsfc,
                                     emis_gpt, concs, alb, tsi, sza)
        return sum(jnp.sum(o[:, 0]) for o in out)

    jf = jax.jit(fn)

    def step():
        return jf(lw, sw, args["plev"], args["tlay"], args["tlev"],
                  args["tsfc"], args["emis"], args["concs"], args["alb"],
                  args["tsi"], args["sza"])
    return step


def timeit(step) -> float:
    """Best-of-EPOCHS batched-dispatch seconds per solve."""
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


# --- neutered stand-ins (dep-preserving) --------------------------------

_orig = dict(
    expm1=common.expm1_accurate,
    onehot=common.pt_onehot,
    planck=common.planck_eval,
    gas=common.gas_tau_block_multi,
    twostream=common.two_stream_g0,
    fill=common.fill_lane_blocks,
)


def fast_expm1(x):
    return jnp.exp(x) - 1.0


def cheap_onehot(npt_pad, n_t, i0p, wp1, i0t, wt1):
    # keeps deps on all four index arrays, drops the compare/selects
    row = wp1 + wt1 + (i0p + i0t).astype(F32) * F32(1e-8)
    return jnp.broadcast_to(row * F32(1e-3), (npt_pad, row.shape[-1]))


def cheap_planck(t_row, planck_hi_ref, planck_lo_ref, planck_row0_ref, t0,
                 inv_dt, n_planck, npl_pad, inv_pi):
    ng = planck_row0_ref.shape[0]
    return (jnp.broadcast_to(t_row, (ng, t_row.shape[-1])) * inv_pi
            * F32(1e-3) + planck_row0_ref[...] * F32(1e-6))


def cheap_gas(b, logp_ref, dp_ref, tlay_ref, vmrp_ref, vmrs_ref,
              t_first_ref, specs, log_p0, inv_dlogp, inv_dt, mpp,
              lb=1, wp=16, wv=4):
    # (ng, L) produced by a 1-deep matmul, NOT jnp.broadcast_to: Mosaic's
    # lowering of a (1, L) -> (ng, L) broadcast trips an internal
    # `limits[i] <= dim(i) (4 vs 1)` CHECK under ECCKD_MXU_PRECISION=bf16
    # (round-5 finding); the dot lowers cleanly in both MXU modes and
    # keeps the same data deps.
    import jax.experimental.pallas as pl
    d_p = dp_ref[pl.ds(b, 1), :]
    t = tlay_ref[pl.ds(b, 1), :]
    row = d_p * mpp * F32(1e-5) + t * F32(1e-9)
    taus = []
    for spec in specs:
        ng = spec[0].ng_pad
        ones = jnp.ones((ng, 1), dtype=jnp.bfloat16)
        taus.append(jax.lax.dot_general(
            ones, row.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=F32))
    return taus, d_p


_ATTR = {"expm1": "expm1_accurate", "onehot": "pt_onehot",
         "planck": "planck_eval", "gas": "gas_tau_block_multi",
         "twostream": "two_stream_g0", "fill": "fill_lane_blocks"}


def cheap_twostream(tau, u, mu0, inv_mu0):
    # keeps deps on all inputs, drops the exp/sqrt/divide algebra
    r = tau * F32(1e-3) + u * F32(1e-4)
    t = mu0 * F32(0.5) + r
    return r, t, r * mu0, t * inv_mu0 * F32(1e-3), 1.0 - r


def cheap_fill(dst, src, n_blk, lb):
    # dep-preserving stand-in: one broadcast store per block instead of
    # lb row-concats (measures the in-kernel relayout's concat cost)
    import jax.experimental.pallas as pl
    if len(src.shape) == 3:
        for v in range(src.shape[0]):
            for b in range(n_blk):
                row = src[v, pl.ds(b, 1), :]
                dst[v, pl.ds(b, 1), :] = jnp.concatenate(
                    [row] * lb, axis=1) if lb > 1 else row
    else:
        for b in range(n_blk):
            row = src[pl.ds(b, 1), :]
            dst[pl.ds(b, 1), :] = jnp.concatenate(
                [row] * lb, axis=1) if lb > 1 else row


def run_variant(name, patches, lw, sw, args):
    for k, v in patches.items():
        setattr(common, _ATTR[k], v)
    try:
        dt = timeit(make_step(lw, sw, args))
    finally:
        for k in patches:
            setattr(common, _ATTR[k], _orig[k])
    return dt


def prep_only(lw, sw, args):
    """Time just the host->blocked relayout (the pre-kernel XLA ops)."""
    # The kernels derive lb from (nlay, grid) — a fixed module constant
    # here could measure a blocked layout the real kernel never uses.
    lb, ct = derive_layer_block(NLAY, int(lw.log_pressure.shape[0])), \
        COL_TILE
    ncol = NCOL
    ncol_pad = ((ncol + ct - 1) // ct) * ct

    def fn(plev, tlay, tlev, concs_h2o, concs_o3):
        blk = lambda x, pv=None: _block_lanes(x, lb, ct, pv)
        logp_t = blk(_pad_cols(
            jnp.log(0.5 * (plev[:, 1:] + plev[:, :-1])).astype(F32).T,
            ncol_pad))
        dp_t = blk(_pad_cols((plev[:, 1:] - plev[:, :-1]).astype(F32).T,
                             ncol_pad), 0.0)
        tlay_t = blk(_pad_cols(tlay.astype(F32).T, ncol_pad))
        tlev_t = blk(_pad_cols(tlev.astype(F32).T, ncol_pad))
        vmrp = jnp.stack([concs_h2o.T, jnp.log(concs_h2o).T, concs_o3.T])
        vmrp_t = blk(_pad_cols(vmrp, ncol_pad))
        return (jnp.sum(logp_t[..., ::317]) + jnp.sum(dp_t[..., ::317])
                + jnp.sum(tlay_t[..., ::317]) + jnp.sum(tlev_t[..., ::317])
                + jnp.sum(vmrp_t[..., ::317]))

    concs = args["concs"]
    h2o = concs.values[concs.names.index("h2o")]
    o3 = concs.values[concs.names.index("o3")]
    jf = jax.jit(fn)

    def step():
        return jf(args["plev"], args["tlay"], args["tlev"], h2o, o3)
    return timeit(step)


def main():
    lw, sw, args = build()
    full = run_variant("full", {}, lw, sw, args)
    results = {"full": full}
    variants = {
        "fast_expm1": {"expm1": fast_expm1},
        "cheap_onehot": {"onehot": cheap_onehot},
        "cheap_planck": {"planck": cheap_planck},
        "cheap_gasoptics": {"gas": cheap_gas},
        "cheap_gas+planck": {"gas": cheap_gas, "planck": cheap_planck},
        "cheap_twostream": {"twostream": cheap_twostream},
        "cheap_fill": {"fill": cheap_fill},
    }
    for name, p in variants.items():
        try:
            results[name] = run_variant(name, p, lw, sw, args)
            print(f"  {name:<20} {results[name]*1e3:8.2f} ms", flush=True)
        except Exception as e:
            # A neutered stand-in can hit Mosaic compiler checks the real
            # kernel never does (e.g. bf16-mode dummy lo-tables sliced by
            # a window); record and continue — the probe decomposes, it
            # does not gate.
            print(f"  {name:<20} SKIPPED ({type(e).__name__}: "
                  f"{str(e)[:80]})", flush=True)
            results[name] = float("nan")
    results["prep_only"] = prep_only(lw, sw, args)
    # re-measure full at the end to see drift
    results["full_again"] = run_variant("full", {}, lw, sw, args)

    cols = NCOL
    print(f"\n=== merged-kernel phase attribution, ncol={cols} ===")
    print(f"{'variant':<20} {'ms/solve':>9} {'cols/s':>12} {'delta_ms':>9}")
    for name, dt in results.items():
        d = full - dt if name not in ("full", "full_again", "prep_only") \
            else float("nan")
        print(f"{name:<20} {dt*1e3:9.2f} {cols/dt:12.0f} {d*1e3:9.2f}")


if __name__ == "__main__":
    main()
