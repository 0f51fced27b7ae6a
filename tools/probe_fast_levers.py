"""In-process A/B of the exact-mode non-levers under FAST (bf16) weights.

VERDICT r4 next #1: the exact-mode verdicts (scratch stores overlap the
MXU, ct=256 loses more than the halved per-program floor saves,
UNROLL_BLOCKS neutral) were measured when the gas contraction was a
~10 ms 3-pass MXU job.  Under ECCKD_MXU_PRECISION=bf16 that floor drops
to ~3.5 ms, so the overlap budget changes and each verdict must be
re-established at fast weights.  All variants are traced and timed in
ONE process, interleaved best-of-EPOCHS (the only drift-immune
protocol, CLAUDE.md); module-level kernel flags are monkeypatched the
same way tools/probe_residual.py does.

Usage: ECCKD_MXU_PRECISION=bf16 python tools/probe_fast_levers.py [ncol]
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
from ecckd_tpu.ops.pallas import lwsw  # noqa: E402
from ecckd_tpu.pipeline import lw_sw_fluxes  # noqa: E402

LW = ("/root/reference/data/"
      "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
SW = ("/root/reference/data/"
      "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
ITERS, EPOCHS = 10, 4

# (name, {lwsw module attr: value}) — applied during trace only.
VARIANTS = (
    ("base", {}),                            # shipped: FUSE_FWD on, ct 128
    ("fuse_off", {"FUSE_FWD": False}),
    ("ct256", {"COL_TILE": 256}),
    ("unroll", {"UNROLL_BLOCKS": True}),
)


def main():
    assert jax.default_backend() != "cpu", "probe needs the real TPU"
    mode = os.environ.get("ECCKD_MXU_PRECISION", "bf16x3")
    lw = jax.device_put(load_ckd_model(LW, dtype=np.float32))
    sw = jax.device_put(load_ckd_model(SW, dtype=np.float32))
    b = _example_batch(NCOL, 60, np.float32)
    args = {k: jax.device_put(v) for k, v in b.items()}
    margs = (args["plev"], args["tlay"], args["tlev"], args["tsfc"],
             args["emis"], args["concs"], args["alb"], args["tsi"],
             args["sza"])

    steps = {}
    vals = {}
    for name, patch in VARIANTS:
        saved = {k: getattr(lwsw, k) for k in patch}
        lwsw.__dict__.update(patch)
        try:
            f = jax.jit(lambda ml, ms, *a: lw_sw_fluxes(ml, ms, *a,
                                                        n_gauss_angles=1))

            def step(f=f):
                o1, o2 = f(lw, sw, *margs)
                return (jnp.sum(o1.flux_up[:, 0])
                        + jnp.sum(o2.flux_up[:, 0]))

            vals[name] = float(step())     # trace under the patch
        finally:
            lwsw.__dict__.update(saved)
        steps[name] = step

    base = vals["base"]
    for name, v in vals.items():
        rel = abs(v - base) / max(abs(base), 1e-30)
        print(f"  {name:<9} flux-sum rel vs base: {rel:.2e}")

    best = {name: 1e30 for name in steps}
    for _ in range(EPOCHS):
        for name, step in steps.items():     # interleaved
            t0 = time.perf_counter()
            acc = step()
            for _ in range(ITERS - 1):
                acc = acc + step()
            float(acc)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / ITERS)
    print(f"ncol={NCOL} mxu={mode}")
    for name, _ in VARIANTS:
        d = (best[name] - best["base"]) * 1e3
        print(f"  {name:<9} {best[name]*1e3:7.2f} ms "
              f"({NCOL/best[name]/1e6:5.2f}M cols/s)  "
              f"delta vs base {d:+.2f} ms")


if __name__ == "__main__":
    main()
