"""On-chip shape-generality sweep -> SHAPES_CHIP.json (VERDICT r3 #3).

The fused kernels' blocking parameters are derived from the atmosphere
depth (ops/pallas/lw.py:derive_layer_block); this tool proves, ON THE
REAL TPU, that the derivation holds across the depths real NWP/climate
grids use — 30 (coarse climate), 47 (MERRA-2), 60 (RFMIP/CKDMIP), 91 and
137 (ECMWF L91/L137) — at odd, non-tile-multiple column counts, and at
BOTH driver quadrature configurations (1 and 3 LW Gauss angles — the
reference's physics indices, ecckd_rfmip_lw.F90:40-44; VERDICT r4
weak #2 / ADVICE r4 #1: the multi-angle deep-shape legs are emitted by
the tool itself so the artifact is reproducible).  Per (shape, angles):

  * PARITY: merged LW+SW fused kernel, jitted with the model pytrees as
    jit ARGUMENTS (the shipped execution mode), vs the f64 XLA path on
    the host CPU backend (the deep-column-safe anchor — the CPU f32
    anchor's own error grows to ~8e-5 on 1-Pa-to-surface columns,
    .claude/skills/verify/SKILL.md).
  * THROUGHPUT: in-process batched-dispatch columns/s at 65536 columns
    (the only timing protocol that is meaningful through the tunneled
    chip), plus work-rate columns*layers/s to expose fallback cliffs
    (work per column scales ~linearly in nlay, so a shape whose work
    rate collapses relative to its neighbors has fallen off the
    pressure-window fast path).
  * FIRST-CALL seconds: wall time of the first jitted call (genuinely
    cold on the first-ever run of a shape; persistent-cache warm after)
    — bounds compile-time growth in (nlay, angles); the multi-angle
    sweeps are block-rolled for exactly this
    (common.multi_angle_lw_sweeps).

Usage:  python tools/shape_sweep_chip.py [--out SHAPES_CHIP.json]
        [--angles 1,3] [--fast]
``--fast`` runs the sweep in the documented bf16 1-pass MXU mode
(ECCKD_MXU_PRECISION=bf16) against the same f64 CPU anchor with the
fast-mode 5e-4 parity bound (BENCH_FAST.json's gate class) and writes
SHAPES_CHIP_FAST.json — fast-mode depth generality, mirroring the
exact-mode artifact.  Exit 1 if any (shape, angles) leg exceeds the
parity bound.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

LW = ("/root/reference/data/"
      "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
SW = ("/root/reference/data/"
      "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")

# (nlay, parity ncol): odd + non-multiple of both the 128 and 256 tiles.
SHAPES = [(30, 293), (47, 331), (60, 293), (91, 275), (137, 261)]
# Parity bounds come from chip_parity.BOUNDS (5e-5 exact / 5e-4 fast).
NCOL_TIME = 65536


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tools/shape_sweep_chip.py")
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--angles", default="1,3",
                    help="comma-separated LW Gauss angle counts to sweep "
                         "(default: both driver physics indices)")
    ap.add_argument("--fast", action="store_true",
                    help="sweep the bf16 1-pass MXU fast mode (5e-4 "
                         "bound) -> SHAPES_CHIP_FAST.json")
    args = ap.parse_args(argv)
    angle_list = [int(a) for a in args.angles.split(",")]
    # The EFFECTIVE MXU mode decides the bound and the artifact name:
    # --fast and ECCKD_MXU_PRECISION=bf16 are the same request (every
    # other fast-mode tool is env-driven), and gating bf16 kernels at
    # the exact bound — or overwriting SHAPES_CHIP.json with a bf16
    # record — must be impossible by construction.
    env_mode = os.environ.get("ECCKD_MXU_PRECISION", "bf16x3")
    fast = args.fast or env_mode == "bf16"
    mode = "bf16" if fast else env_mode
    if args.out is None:
        args.out = os.path.join(
            _REPO_ROOT,
            "SHAPES_CHIP_FAST.json" if fast else "SHAPES_CHIP.json")

    import jax
    # x64 is enabled ONLY around the f64 CPU-anchor legs (scoped
    # jax.experimental.enable_x64): enabling it globally makes the pallas
    # kernel trace recurse on int-literal promotion (measured
    # RecursionError), and the chip legs must run the exact shipped f32
    # programs anyway.
    from ecckd_tpu.cli.common import setup_compilation_cache
    setup_compilation_cache()
    assert jax.default_backend() != "cpu", "sweep needs the real TPU"
    cpu = jax.devices("cpu")[0]

    import jax.numpy as jnp
    import chip_parity
    # Parity bound: the single source of truth is chip_parity.BOUNDS
    # (5e-5 exact / 5e-4 fast) — re-hardcoding it here would let a
    # retune there silently leave this sweep gating at stale values.
    if mode not in chip_parity.BOUNDS:
        ap.error(f"no parity bound defined for MXU mode {mode!r} "
                 f"(gated modes: {sorted(chip_parity.BOUNDS)})")
    bound = chip_parity.BOUNDS[mode]
    if fast:
        from ecckd_tpu.config import set_mxu_precision
        set_mxu_precision("bf16")   # pallas-only flag; f64 XLA anchor
        # legs are unaffected (ops/pallas/common._MXU_MODE consumers)
    from ecckd_tpu.models.loader import load_ckd_model
    from ecckd_tpu.ops.pallas.lw import derive_layer_block
    from ecckd_tpu.pipeline import lw_sw_fluxes

    lw32 = load_ckd_model(LW, dtype=np.dtype(np.float32))
    sw32 = load_ckd_model(SW, dtype=np.dtype(np.float32))
    lw64 = load_ckd_model(LW, dtype=np.dtype(np.float64))
    sw64 = load_ckd_model(SW, dtype=np.dtype(np.float64))

    fused = {ang: jax.jit(lambda ml, ms, *a, _n=ang: lw_sw_fluxes(
        ml, ms, *a, n_gauss_angles=_n)) for ang in angle_list}
    results = {}
    ok = True
    for nlay, ncol in SHAPES:
        b = chip_parity.adversarial_batch(ncol, nlay)
        margs = (b["plev"], b["tlay"], b["tlev"], b["tsfc"], b["emis"],
                 b["concs"], b["alb"], b["tsi"], b["sza"])
        f64 = lambda x: jax.tree_util.tree_map(
            lambda v: (np.asarray(v, np.float64)
                       if isinstance(v, np.ndarray)
                       and v.dtype == np.float32 else v), x)

        # Timing batch: RFMIP-SHAPED (the headline workload class,
        # io/synthetic.py) so the numbers are comparable to bench.py's
        # 60-layer figure; the adversarial batch above (full-decade
        # pressure spreads -> frequent full-table cond fallbacks) gates
        # correctness, not speed.
        from ecckd_tpu.io.synthetic import example_flux_batch
        bb = example_flux_batch(NCOL_TIME, nlay, np.float32)
        big = {k: (jax.device_put(v) if k != "concs"
                   else jax.tree_util.tree_map(jax.device_put, v))
               for k, v in bb.items()}
        bargs = (big["plev"], big["tlay"], big["tlev"], big["tsfc"],
                 big["emis"], big["concs"], big["alb"], big["tsi"],
                 big["sza"])
        lw_dev, sw_dev = jax.device_put(lw32), jax.device_put(sw32)

        shape = {"nlay": nlay, "parity_ncol": ncol,
                 "layer_block": derive_layer_block(
                     nlay, int(lw32.log_pressure.shape[0])),
                 "angles": {}}
        steps = {}
        for ang in angle_list:
            # x64 toggled on only for this anchor trace (jit captures
            # the flag at trace time), then restored before any chip-leg
            # trace.  The persistent cache is bypassed for the anchor:
            # XLA:CPU AOT executables are keyed without host CPU
            # features, so a cache populated on a different machine can
            # load a foreign binary into the reference computation
            # (bench.py has the same guard).
            cache_dir = jax.config.jax_compilation_cache_dir
            jax.config.update("jax_enable_x64", True)
            jax.config.update("jax_compilation_cache_dir", None)
            try:
                with jax.default_device(cpu):
                    ref_lw, ref_sw = jax.jit(
                        lambda ml, ms, *a: lw_sw_fluxes(
                            ml, ms, *a, n_gauss_angles=ang,
                            backend="xla"))(lw64, sw64, *f64(margs))
                    ref_lw = jax.tree_util.tree_map(np.asarray, ref_lw)
                    ref_sw = jax.tree_util.tree_map(np.asarray, ref_sw)
            finally:
                jax.config.update("jax_enable_x64", False)
                jax.config.update("jax_compilation_cache_dir", cache_dir)

            t0 = time.perf_counter()
            got_lw, got_sw = fused[ang](lw32, sw32, *margs)
            float(jnp.sum(got_lw.flux_up[:, 0]))   # completion barrier
            compile_s = time.perf_counter() - t0
            rel_lw, _ = chip_parity._max_rel(
                (got_lw.flux_up, got_lw.flux_dn),
                ref_lw.flux_up, ref_lw.flux_dn)
            rel_sw, _ = chip_parity._max_rel(
                (got_sw.flux_up, got_sw.flux_dn),
                ref_sw.flux_up, ref_sw.flux_dn)

            def step(ang=ang):
                f1, f2 = fused[ang](lw_dev, sw_dev, *bargs)
                return (jnp.sum(f1.flux_up[:, 0])
                        + jnp.sum(f2.flux_up[:, 0]))

            float(step()); float(step())    # warmup + big-shape compile
            steps[ang] = step

            leg_ok = max(rel_lw, rel_sw) <= bound
            ok = ok and leg_ok
            shape["angles"][str(ang)] = {
                "parity_max_rel_lw": rel_lw, "parity_max_rel_sw": rel_sw,
                "parity_ok": leg_ok,
                "first_call_seconds": round(compile_s, 2),
            }

        # Throughput: the angle legs' timing epochs are INTERLEAVED
        # (best-of-EPOCHS per leg) so the tunneled chip's between-epoch
        # drift cancels out of the per-shape angle comparison — separate
        # back-to-back timings measured a 3-angle leg "faster" than the
        # 1-angle one purely from epoch drift.
        best = {ang: 1e30 for ang in angle_list}
        for _ in range(4):
            for ang in angle_list:
                t0 = time.perf_counter()
                acc = steps[ang]()
                for _ in range(args.iters - 1):
                    acc = acc + steps[ang]()
                float(acc)
                best[ang] = min(best[ang],
                                (time.perf_counter() - t0) / args.iters)
        for ang in angle_list:
            cols_s = NCOL_TIME / best[ang]
            leg = shape["angles"][str(ang)]
            leg["columns_per_sec"] = round(cols_s, 1)
            leg["col_layers_per_sec"] = round(cols_s * nlay, 1)
            print(f"  nlay={nlay:3d} ncol={ncol} ang={ang}: lb="
                  f"{shape['layer_block']} "
                  f"rel_lw={leg['parity_max_rel_lw']:.2e} "
                  f"rel_sw={leg['parity_max_rel_sw']:.2e} "
                  f"{'OK' if leg['parity_ok'] else 'FAIL'} "
                  f"first_call={leg['first_call_seconds']:.1f}s "
                  f"{cols_s/1e6:.2f}M cols/s "
                  f"({cols_s*nlay/1e6:.0f}M col-layers/s)",
                  file=sys.stderr)
        results[f"nlay{nlay}_ncol{ncol}"] = shape

    import datetime
    out = {"generated_by": "tools/shape_sweep_chip.py",
           "date": datetime.date.today().isoformat(),
           "anchor": "XLA path, float64, host CPU backend",
           "bound": bound, "ncol_timing": NCOL_TIME,
           "angles": angle_list,
           "mxu_precision": mode,
           "pass": ok, "shapes": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"shape sweep: {'PASS' if ok else 'FAIL'} -> {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
