"""In-process A/B: block-rolled vs unrolled multi-angle LW sweeps.

The rolled form (common.multi_angle_lw_sweeps, ECCKD_ROLL_ANGLE_SWEEPS)
exists to bound compile time in nlay * n_angles; this probe checks it
does not cost steady-state throughput at the shipped 3-angle
configuration, using the only timing protocol that is stable through
the tunneled chip (in-process best-of-N batched dispatch, interleaved
A/B/A/B epochs; CLAUDE.md).  Both variants are traced in ONE process
(the env flag is read at trace time), so the per-process timing epoch
drift cancels.

Usage: python tools/probe_roll_sweeps.py [ncol] [nlay] [n_angles]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from ecckd_tpu.cli.common import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _example_batch  # noqa: E402
from ecckd_tpu.models.loader import load_ckd_model  # noqa: E402
from ecckd_tpu.pipeline import lw_sw_fluxes  # noqa: E402

LW = ("/root/reference/data/"
      "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
SW = ("/root/reference/data/"
      "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
NLAY = int(sys.argv[2]) if len(sys.argv) > 2 else 60
NANG = int(sys.argv[3]) if len(sys.argv) > 3 else 3
ITERS, EPOCHS = 10, 4


def main():
    assert jax.default_backend() != "cpu", "probe needs the real TPU"
    lw = jax.device_put(load_ckd_model(LW, dtype=np.float32))
    sw = jax.device_put(load_ckd_model(SW, dtype=np.float32))
    b = _example_batch(NCOL, NLAY, np.float32)
    args = {k: jax.device_put(v) for k, v in b.items()}
    margs = (args["plev"], args["tlay"], args["tlev"], args["tsfc"],
             args["emis"], args["concs"], args["alb"], args["tsi"],
             args["sza"])

    steps = {}
    compile_s = {}
    for mode in ("1", "0"):
        os.environ["ECCKD_ROLL_ANGLE_SWEEPS"] = mode
        f = jax.jit(lambda ml, ms, *a: lw_sw_fluxes(
            ml, ms, *a, n_gauss_angles=NANG))

        def step(f=f):
            o1, o2 = f(lw, sw, *margs)
            return jnp.sum(o1.flux_up[:, 0]) + jnp.sum(o2.flux_up[:, 0])

        t0 = time.perf_counter()
        v = float(step())          # trace + compile + first run
        compile_s[mode] = time.perf_counter() - t0
        steps[mode] = (step, v)
    os.environ.pop("ECCKD_ROLL_ANGLE_SWEEPS", None)

    # Equality of the two programs' fluxes (same math, loop shape only).
    va, vb = steps["1"][1], steps["0"][1]
    rel = abs(va - vb) / max(abs(va), 1e-30)
    print(f"rolled-vs-unrolled flux sum rel diff: {rel:.2e}")

    best = {m: 1e30 for m in steps}
    for _ in range(EPOCHS):
        for m, (step, _) in steps.items():    # interleaved A/B epochs
            t0 = time.perf_counter()
            acc = step()
            for _ in range(ITERS - 1):
                acc = acc + step()
            float(acc)
            best[m] = min(best[m], (time.perf_counter() - t0) / ITERS)
    print(f"ncol={NCOL} nlay={NLAY} angles={NANG}")
    for m in ("1", "0"):
        name = "rolled " if m == "1" else "unrolled"
        print(f"  {name}: {best[m]*1e3:7.2f} ms/epoch "
              f"({NCOL/best[m]/1e6:5.2f}M cols/s) "
              f"first_call={compile_s[m]:5.1f}s")


if __name__ == "__main__":
    main()
