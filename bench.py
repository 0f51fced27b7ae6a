"""Throughput benchmark: RFMIP-shaped LW+SW flux solve, columns/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the BASELINE.json north star — columns/sec/chip for the
combined LW (1-angle) + SW flux solve on 60-layer RFMIP-shaped columns with
the shipped fsck-LW / wide-SW ckd files, steady state (post-compile), inputs
resident on device.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is self-generated: the same two-solve pipeline executed serially on
one CPU core (the reference's execution model — single-threaded Fortran,
block_size=1).  Measured once on this container via
  ECCKD_BENCH_MODE=cpu_baseline python bench.py
and pinned below; re-run that mode to refresh.
"""
from __future__ import annotations

import json
import os
import sys
import time

# Single-core CPU columns/s for the same LW+SW pipeline (XLA-CPU, f64 like
# the Fortran chain, single thread).  Measured on this container; see
# module docstring.  The serial Fortran reference would be in the same
# order of magnitude.
CPU_SERIAL_BASELINE_COLS_PER_SEC = float(
    os.environ.get("ECCKD_BENCH_BASELINE", "3256.3"))

LW_FILE = ("/root/reference/data/"
           "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
SW_FILE = ("/root/reference/data/"
           "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")


def _build(ncol, nlay, dtype):
    from __graft_entry__ import _example_batch
    return _example_batch(ncol, nlay, dtype)


def run_bench(mode: str) -> None:
    if mode == "cpu_baseline":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_cpu_multi_thread_eigen=false"
                                     " intra_op_parallelism_threads=1")
    import jax
    if mode == "cpu_baseline":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        jax.config.update("jax_enable_x64", True)
        dtype_name = "float64"
        ncol = int(os.environ.get("ECCKD_BENCH_NCOL", "2048"))
        iters, warmup = 3, 1
    else:
        from ecckd_tpu.cli.common import setup_compilation_cache
        setup_compilation_cache()
        dtype_name = "float32"
        ncol = int(os.environ.get("ECCKD_BENCH_NCOL", "65536"))
        iters, warmup = 20, 2

    import numpy as np
    dtype = np.dtype(dtype_name)
    from ecckd_tpu.models.loader import load_ckd_model
    from ecckd_tpu.pipeline import lw_sw_fluxes

    nlay = 60
    lw = load_ckd_model(LW_FILE, dtype=dtype)
    sw = load_ckd_model(SW_FILE, dtype=dtype)
    b = _build(ncol, nlay, dtype)

    chunk = int(os.environ.get("ECCKD_BENCH_CHUNK", "8192"))
    # Models are jit arguments placed on device once (closing over them
    # forces a device->host fetch of every table at lowering time).
    # lw_sw_fluxes runs the MERGED LW+SW mega-kernel on TPU (one shared
    # interpolation/one-hot pass; ops/pallas/lwsw.py) and falls back to
    # the separate pipelines elsewhere.
    step_fn = jax.jit(
        lambda ml, ms, plev, tlay, tlev, tsfc, emis, concs, alb, tsi, sza:
        lw_sw_fluxes(ml, ms, plev, tlay, tlev, tsfc, emis, concs, alb,
                     tsi, sza, n_gauss_angles=1, column_chunk=chunk))

    lw_dev = jax.device_put(lw)
    sw_dev = jax.device_put(sw)
    args = {k: jax.device_put(v) for k, v in b.items() if k != "concs"}
    concs = jax.device_put(b["concs"])

    import jax.numpy as jnp

    def step():
        f1, f2 = step_fn(lw_dev, sw_dev, args["plev"], args["tlay"],
                         args["tlev"], args["tsfc"], args["emis"], concs,
                         args["alb"], args["tsi"], args["sza"])
        # A scalar derived from both outputs: fetching it host-side is the
        # only reliable completion barrier (on relayed TPU transports,
        # block_until_ready can return before the device executes).
        return jnp.sum(f1.flux_up[:, 0]) + jnp.sum(f2.flux_up[:, 0])

    for _ in range(warmup):
        float(step())
    t0 = time.perf_counter()
    acc = step()
    for _ in range(iters - 1):
        acc = acc + step()
    float(acc)  # device->host fetch: true end-to-end completion
    dt = time.perf_counter() - t0
    cols_per_sec = ncol * iters / dt

    if mode == "cpu_baseline":
        print(f"# cpu_baseline: {cols_per_sec:.1f} columns/s "
              f"({ncol} cols x {iters} iters in {dt:.2f}s)", file=sys.stderr)
        print(json.dumps({"metric": "cpu_serial_baseline_columns_per_sec",
                          "value": round(cols_per_sec, 1),
                          "unit": "columns/s", "vs_baseline": 1.0}))
        return

    print(json.dumps({
        "metric": "rfmip_lw+sw_flux_solve_throughput",
        "value": round(cols_per_sec, 1),
        "unit": "columns/s/chip",
        "vs_baseline": round(cols_per_sec / CPU_SERIAL_BASELINE_COLS_PER_SEC,
                             2),
    }))


if __name__ == "__main__":
    run_bench(os.environ.get("ECCKD_BENCH_MODE", "tpu"))
