"""Combined longwave + shortwave RFMIP driver.

The reference ships two executables run back to back
(/root/reference/example/rfmip-rad-irf/ecckd_rfmip_lw.F90, _sw.F90);
climate workloads always need both bands over the same atmosphere.  This
driver reads the RFMIP file once and computes all four flux products
(rlu/rld/rsu/rsd) in one jitted program — on TPU at f32 that is the
MERGED LW+SW mega-kernel (ops/pallas/lwsw.py, any physics index), which
shares one interpolation pass between the bands.  The merged-vs-separate
speedup is measured per configuration in BENCH_CONFIGS.json (the single
source of truth for throughput numbers; tools/check_perf_claims.py
flags drift).

Usage: python -m ecckd_tpu.cli.ecckd_rfmip <rfmip_file> <lw_ckd> <sw_ckd>
       [-f 1|2] [-p 1|2] [--heating-rates] ...
"""
from __future__ import annotations

import functools
import os
import sys

import jax
import numpy as np

from ecckd_tpu.cli import common
from ecckd_tpu.utils import profiling
from ecckd_tpu.io.rfmip import write_fluxes
from ecckd_tpu.models.loader import load_ckd_model
from ecckd_tpu.pipeline import clamp_top_pressure, lw_sw_fluxes


def main(argv=None) -> int:
    p = common.make_parser("ecckd_rfmip")
    # Reuse the standard parser but take TWO ckd files: the positional
    # ``ecckd_file`` slot becomes the LW file, plus one more for SW.
    p.add_argument("sw_ecckd_file", help="ecckd SW ckd-definition file")
    args = p.parse_args(argv)
    n_quad_angles = 3 if args.physics_index == 2 else 1
    print(f" Using forcing index {args.forcing_index} and physics index "
          f"{args.physics_index}", file=sys.stderr)

    data, model_lw = common.load_inputs(args)
    dtype = model_lw.log_pressure.dtype
    model_sw = load_ckd_model(args.sw_ecckd_file, dtype=dtype)
    if not model_lw.source_is_internal():
        print("ecckd_rfmip: first ckd file isn't for longwave.",
              file=sys.stderr)
        return 1
    if not model_sw.source_is_external():
        print("ecckd_rfmip: second ckd file isn't for shortwave.",
              file=sys.stderr)
        return 1

    top_at_1 = data.top_at_1
    press_min = max(model_lw.get_press_min(), model_sw.get_press_min())
    plev = clamp_top_pressure(data.plev.astype(dtype), press_min, top_at_1)
    concs = common.build_gas_concs(data, dtype)
    if args.validate:
        from ecckd_tpu.utils.checks import validate_inputs
        validate_inputs(plev, data.tlay, data.tlev, press_min=press_min,
                        press_max=min(model_lw.get_press_max(),
                                      model_sw.get_press_max()))

    lw_dev = jax.device_put(model_lw)
    sw_dev = jax.device_put(model_sw)
    arrays, concs_dev, _ = common.place_on_mesh(
        [plev, data.tlay.astype(dtype), data.tlev.astype(dtype),
         data.sfc_t.astype(dtype), data.sfc_emis.astype(dtype),
         data.sfc_alb.astype(dtype), data.tsi.astype(dtype),
         data.sza.astype(dtype)],
        not args.no_shard, concs)

    def solve(backend):
        fn = functools.partial(lw_sw_fluxes, n_gauss_angles=n_quad_angles,
                               top_at_1=top_at_1, backend=backend)
        fluxes = jax.jit(fn)(lw_dev, sw_dev, arrays[0], arrays[1],
                             arrays[2], arrays[3], arrays[4], concs_dev,
                             arrays[5], arrays[6], arrays[7])
        # Value-fetch completion barrier: on the relayed chip
        # transport block_until_ready can return before the device
        # executes (bench.py's measured case; CLAUDE.md rule), which
        # would persist inflated columns_per_sec in --metrics-json.
        profiling.barrier_fetch(fluxes)
        return fluxes

    with common.Timer("lw+sw flux solve") as t:
        flw, fsw = common.solve_with_fallback(solve, args.backend)

    out = {}
    for name, arr in (("rlu", flw.flux_up), ("rld", flw.flux_dn),
                      ("rsu", fsw.flux_up), ("rsd", fsw.flux_dn)):
        out[name] = np.asarray(arr)[:data.ncol]
    if args.validate and not all(np.isfinite(a).all()
                                 for a in out.values()):
        print("ecckd_rfmip: non-finite fluxes in output", file=sys.stderr)
        return 1
    if args.metrics_json:
        # Record BOTH bands' sanity (the persisted baseline must flag an
        # SW-only regression too, not just LW).
        sw_up, sw_dn = out["rsu"], out["rsd"]
        common.write_metrics(
            args.metrics_json, ncol=data.ncol, seconds=t.seconds,
            args=args, fluxes=flw,
            extra={"driver": "lwsw", "n_quad_angles": n_quad_angles,
                   "sw_flux_up_range": [float(sw_up.min()),
                                        float(sw_up.max())],
                   "sw_flux_dn_range": [float(sw_dn.min()),
                                        float(sw_dn.max())],
                   "sw_all_finite": bool(np.isfinite(sw_up).all()
                                         and np.isfinite(sw_dn).all())})
    # LW filenames carry the physics index; SW files are always p1
    # (ecckd_rfmip_lw.F90:59-62 vs ecckd_rfmip_sw.F90:56-57).
    lw_sfx = f"r1i1p{args.physics_index}f{args.forcing_index}_gn.nc"
    sw_sfx = f"r1i1p1f{args.forcing_index}_gn.nc"
    sfx = {"rlu": lw_sfx, "rld": lw_sfx, "rsu": sw_sfx, "rsd": sw_sfx,
           "hrl": lw_sfx, "hrs": sw_sfx}
    os.makedirs(args.output_dir, exist_ok=True)
    for name in ("rlu", "rld", "rsu", "rsd"):
        path = os.path.join(args.output_dir,
                            f"{name}_Efx_RTE-ecckd_rad-irf_{sfx[name]}")
        write_fluxes(path, name, out[name], data.nsite, data.nexp)
        print(f" Wrote {path}", file=sys.stderr)
    if args.heating_rates:
        from ecckd_tpu.fluxes import heating_rate
        from ecckd_tpu.io.rfmip import write_heating_rates
        for tag, up, dn in (("hrl", out["rlu"], out["rld"]),
                            ("hrs", out["rsu"], out["rsd"])):
            hr = np.asarray(heating_rate(up, dn, plev[:data.ncol]))
            path = os.path.join(args.output_dir,
                                f"{tag}_Efx_RTE-ecckd_rad-irf_{sfx[tag]}")
            write_heating_rates(path, tag, hr, data.nsite, data.nexp)
            print(f" Wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
