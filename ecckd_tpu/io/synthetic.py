"""CLI: generate a synthetic RFMIP-format atmosphere file.

Usage: python -m ecckd_tpu.io.synthetic out.nc [--nsite N] [--nlay N]
       [--nexp N] [--seed S]

The original 100-site RFMIP file is fetched by the reference's
download-data-files.sh (unavailable offline); this produces a structurally
identical file for driver runs, tests, and benchmarks.
"""
from __future__ import annotations

import argparse

from ecckd_tpu.io.rfmip import write_synthetic_rfmip


def example_flux_batch(ncol: int, nlay: int, dtype):
    """RFMIP-shaped in-memory column batch for benchmarks and dry runs.

    Deterministic per-column jitter keeps columns heterogeneous: a
    homogeneous batch once masked a per-tile input-indexing bug in the
    fused kernels (every tile read tile 0's vmr).
    """
    import numpy as np
    from ecckd_tpu.gases import GasConcs
    base = np.exp(np.linspace(np.log(2.0), np.log(101300.0), nlay + 1))
    rng = np.random.default_rng(0)
    jitter = 1.0 + 0.03 * rng.standard_normal((ncol, 1))
    plev = (base[None, :] * jitter).astype(dtype)
    logp = np.log(0.5 * (plev[:, 1:] + plev[:, :-1]))
    tlay = (288.0 - 55.0 * np.exp(-((logp - np.log(1.5e4)) ** 2) / 4.0)
            ).astype(dtype)
    tlev = (288.0 - 55.0 * np.exp(-((np.log(plev) - np.log(1.5e4)) ** 2)
                                  / 4.0)).astype(dtype)
    tsfc = np.full(ncol, 294.0, dtype)
    emis = np.full(ncol, 0.98, dtype)
    alb = np.full(ncol, 0.1, dtype)
    tsi = np.full(ncol, 1361.0, dtype)
    sza = np.linspace(10.0, 120.0, ncol).astype(dtype)
    h2o = (0.02 * np.exp(-(np.log(1.05e5 / np.maximum(plev[:, 1:], 1e-3))
                           / 1.1)) + 2e-6).astype(dtype)
    o3 = np.full((ncol, nlay), 3e-7, dtype)
    concs = GasConcs.create([
        ("co2", np.full(ncol, 397.5e-6, dtype)),
        ("ch4", np.full(ncol, 1831e-9, dtype)),
        ("n2o", np.full(ncol, 327e-9, dtype)),
        ("o2", np.full(ncol, 0.2095, dtype)),
        ("cfc11", np.full(ncol, 233e-12, dtype)),
        ("cfc12", np.full(ncol, 520e-12, dtype)),
        ("h2o", h2o), ("o3", o3)])
    return dict(plev=plev, tlay=tlay, tlev=tlev, tsfc=tsfc, emis=emis,
                alb=alb, tsi=tsi, sza=sza, concs=concs)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ecckd_tpu.io.synthetic")
    p.add_argument("output")
    p.add_argument("--nsite", type=int, default=100)
    p.add_argument("--nlay", type=int, default=60)
    p.add_argument("--nexp", type=int, default=18)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    write_synthetic_rfmip(args.output, nsite=args.nsite, nlay=args.nlay,
                          nexp=args.nexp, seed=args.seed)
    print(f"wrote {args.output}: {args.nsite} sites x {args.nlay} layers x "
          f"{args.nexp} experiments")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
