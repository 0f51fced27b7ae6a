"""Odd-shape fused-vs-reference sweep (one-off confidence tool, CPU).

Runs the fused LW and SW kernels (interpret mode) against the XLA path
over awkward shapes — single columns, nlay smaller than / indivisible by
the layer block, tile-boundary +/-1 column counts — to hunt BlockSpec,
padding and tail-handling bugs that fixed-shape tests can miss.

ANCHOR PRECISION (measured, round 3): on very deep columns (p_top ~1 Pa,
60 layers) the CPU XLA-f32 reference itself sits ~8e-5 from the f64
truth while the fused kernel (accurate in-kernel transcendentals) sits
~2e-6, so the fused-vs-f32 gap bounds the ANCHOR there.  This sweep
therefore anchors against the f64 XLA path (x64 enabled), which holds
every shape to the same ~1e-5 bound.

Usage:  python tools/shape_sweep.py        (~10 min on CPU; exit 1 on
any shape above the bound)
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from ecckd_tpu.gases import GasConcs
from ecckd_tpu.models.loader import load_ckd_model
from ecckd_tpu.ops.pallas.lw import lw_fluxes_fused
from ecckd_tpu.ops.pallas.sw import sw_fluxes_fused
from ecckd_tpu.pipeline import lw_fluxes, sw_fluxes

F32 = np.float32
F64 = np.float64
LW = ("/root/reference/data/"
      "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
SW = ("/root/reference/data/"
      "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")
BOUND = 1e-5   # vs the f64 anchor; bf16x3 contract class
SHAPES = [(1, 1), (1, 60), (3, 7), (5, 11), (129, 25), (257, 3),
          (130, 61)]


def batch(rng, ncol, nlay):
    p_sfc = np.logspace(np.log10(500.0), np.log10(1.04e5), ncol)
    p_top = 10.0 ** rng.uniform(0.0, 0.6, ncol)
    plev = np.stack([np.logspace(np.log10(t), np.log10(s), nlay + 1)
                     for t, s in zip(p_top, p_sfc)]).astype(F32)
    logp = np.log(0.5 * (plev[:, 1:] + plev[:, :-1]))
    g = lambda x: np.exp(-((x - np.log(2e4)) ** 2) / 4.0)
    tlay = (288 - 50 * g(logp)
            + 3 * rng.standard_normal((ncol, nlay))).astype(F32)
    tlev = (288 - 50 * g(np.log(plev))
            + 3 * rng.standard_normal((ncol, nlay + 1))).astype(F32)
    tsfc = rng.uniform(180, 330, ncol).astype(F32)
    h2o = (10.0 ** rng.uniform(-6.5, -1.8, (ncol, nlay))).astype(F32)
    o3 = (10.0 ** rng.uniform(-8, -5.3, (ncol, nlay))).astype(F32)
    concs = GasConcs.create([
        ("h2o", h2o), ("o3", o3), ("co2", np.float32(4e-4)),
        ("ch4", np.float32(1.2e-6)), ("n2o", np.float32(3.3e-7)),
        ("o2", np.float32(0.2095)), ("cfc11", np.float32(2e-10)),
        ("cfc12", np.float32(5e-10))])
    return plev, tlay, tlev, tsfc, concs


def main() -> int:
    lw32 = load_ckd_model(LW, dtype=np.dtype(F32))
    lw64 = load_ckd_model(LW, dtype=np.dtype(F64))
    sw32 = load_ckd_model(SW, dtype=np.dtype(F32))
    sw64 = load_ckd_model(SW, dtype=np.dtype(F64))
    rng = np.random.default_rng(99)
    worst = 0.0
    bad = 0
    for ncol, nlay in SHAPES:
        plev, tlay, tlev, tsfc, concs = batch(rng, ncol, nlay)
        emis = np.linspace(0.75, 1.0, ncol).astype(F32)
        emis_gpt = jnp.asarray(np.broadcast_to(
            emis[:, None], (ncol, lw32.ngpt)))
        ref = lw_fluxes(lw64, plev.astype(F64), tlay.astype(F64),
                        tlev.astype(F64), tsfc.astype(F64),
                        emis.astype(F64), concs, backend="xla")
        up, dn = lw_fluxes_fused(lw32, plev, tlay, tlev, tsfc, emis_gpt,
                                 concs, interpret=True)
        scale = float(np.abs(np.asarray(ref.flux_up)).max())
        e_lw = max(np.abs(np.asarray(up, F64)
                          - np.asarray(ref.flux_up)).max(),
                   np.abs(np.asarray(dn, F64)
                          - np.asarray(ref.flux_dn)).max()) / scale
        alb = np.linspace(0.05, 0.8, ncol).astype(F32)
        tsi = np.full(ncol, 1361.0, F32)
        sza = np.linspace(0.0, 115.0, ncol).astype(F32)
        refs = sw_fluxes(sw64, plev.astype(F64), tlay.astype(F64), concs,
                         alb.astype(F64), tsi.astype(F64),
                         sza.astype(F64), backend="xla")
        su, sd = sw_fluxes_fused(sw32, plev, tlay, concs, alb, tsi, sza,
                                 interpret=True)
        sscale = max(float(np.abs(np.asarray(refs.flux_dn)).max()), 1e-9)
        e_sw = max(np.abs(np.asarray(su, F64)
                          - np.asarray(refs.flux_up)).max(),
                   np.abs(np.asarray(sd, F64)
                          - np.asarray(refs.flux_dn)).max()) / sscale
        ok = max(e_lw, e_sw) <= BOUND
        bad += not ok
        worst = max(worst, e_lw, e_sw)
        print(f"{'OK ' if ok else 'FAIL'} ncol={ncol:4d} nlay={nlay:3d}  "
              f"lw_rel={e_lw:.3e} sw_rel={e_sw:.3e}", flush=True)
    print(f"worst {worst:.3e} (bound {BOUND:.0e})")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
