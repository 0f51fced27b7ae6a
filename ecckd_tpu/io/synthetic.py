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
