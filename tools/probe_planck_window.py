"""HISTORICAL in-process A/B: Planck temperature window on vs off.

Measured a WASH (window 2.156M vs full 2.165M cols/s best-of, ncol=65536,
2026-08-21), so the window branch was removed from common.planck_eval —
setting common.PLANCK_WINDOW below no longer changes the kernel.  Kept as
the record of the measurement and as the harness to re-run it if the
window is ever re-added.

Same-process interleaved timing (the only trustworthy protocol on the
tunneled chip, CLAUDE.md): traces the merged LW+SW step twice — once with
common.PLANCK_WINDOW = 128 (windowed) and once with it huge (statically
disabled) — and alternates batched-dispatch epochs between the two.

Usage:  python tools/probe_planck_window.py [ncol]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ecckd_tpu.cli.common import setup_compilation_cache

setup_compilation_cache()

from __graft_entry__ import _example_batch  # noqa: E402
from ecckd_tpu.models.loader import load_ckd_model  # noqa: E402
from ecckd_tpu.ops.pallas import common, lwsw  # noqa: E402

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
ITERS = 10
EPOCHS = 6

LW_FILE = ("/root/reference/data/"
           "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
SW_FILE = ("/root/reference/data/"
           "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")


def make_step(lw, sw, args):
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


def epoch_time(step):
    t0 = time.perf_counter()
    acc = step()
    for _ in range(ITERS - 1):
        acc = acc + step()
    float(acc)
    return (time.perf_counter() - t0) / ITERS


def main():
    # HISTORICAL probe: the PLANCK_WINDOW hook was removed from
    # ops/pallas/common.py after this measured a wash, so setting the
    # attribute below compiles two IDENTICAL kernels.  Fail fast instead
    # of printing an A/B that looks like a live measurement.
    if not hasattr(common, "PLANCK_WINDOW"):
        raise SystemExit(
            "probe_planck_window: common.PLANCK_WINDOW no longer exists — "
            "the Planck temperature window was removed after this probe "
            "measured it a wash (see docs/DESIGN.md).  Re-introduce the "
            "hook in common.planck_eval before re-running, or treat this "
            "script as a historical record only.")
    lw = jax.device_put(load_ckd_model(LW_FILE, dtype=np.float32))
    sw = jax.device_put(load_ckd_model(SW_FILE, dtype=np.float32))
    b = _example_batch(NCOL, 60, np.float32)
    args = {k: jax.device_put(v) for k, v in b.items()}

    common.PLANCK_WINDOW = 128
    step_win = make_step(lw, sw, args)
    common.PLANCK_WINDOW = 10 ** 6
    step_full = make_step(lw, sw, args)
    common.PLANCK_WINDOW = 128

    for _ in range(2):
        float(step_win())
        float(step_full())

    res = {"window": [], "full": []}
    for e in range(EPOCHS):
        res["window"].append(epoch_time(step_win))
        res["full"].append(epoch_time(step_full))
        print(f"epoch {e}: window {NCOL/res['window'][-1]:,.0f}  "
              f"full {NCOL/res['full'][-1]:,.0f} cols/s", flush=True)
    for k, v in res.items():
        print(f"{k}: best {NCOL/min(v):,.0f} cols/s  "
              f"median {NCOL/sorted(v)[len(v)//2]:,.0f}")


if __name__ == "__main__":
    main()
