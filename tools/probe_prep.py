"""Break down the pre-kernel relayout cost and test alternatives.

Variants (same semantics, one process, best-of-N):
  current   .T then _block_lanes (reshape/transpose/reshape)
  single    one fused reshape/transpose/reshape straight from (ncol, nlay)
  t_only    just the .T + pad (lower bound if blocking were free)
  noop      pad only (reference floor)
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
from ecckd_tpu.ops.pallas.lw import (derive_layer_block, COL_TILE,
                                     _block_lanes,
                                     _pad_cols)  # noqa: E402

F32 = jnp.float32
NCOL = 65536
NLAY = 60
ITERS = 20
# No model is loaded here, so derive the block size for the probe's
# RFMIP-shaped workload from the shipped ckd grid resolution (n_p = 53,
# the value every bundled model has): keeps the probe's layout identical
# to what the real kernel derives at this depth.
LB, CT = derive_layer_block(NLAY, 53), COL_TILE
NCOL_PAD = ((NCOL + CT - 1) // CT) * CT


def block_direct(x, lb, ct, pad_value=None):
    """(ncol, rows) -> (n_blk, ntiles*lb*ct) in one transpose."""
    lead = x.shape[:-2] if x.ndim > 2 else ()
    if x.ndim == 2:
        ncol, rows = x.shape
    else:
        ncol, rows = x.shape[-2:]
    n_blk = -(-rows // lb)
    padr = n_blk * lb - rows
    if padr:
        if pad_value is None:
            tail = jnp.broadcast_to(x[..., -1:], lead + (ncol, padr))
        else:
            tail = jnp.full(lead + (ncol, padr), pad_value, x.dtype)
        x = jnp.concatenate([x, tail], axis=-1)
    padc = NCOL_PAD - ncol
    if padc:
        cfg = [(0, 0)] * (x.ndim - 2) + [(0, padc), (0, 0)]
        x = jnp.pad(x, cfg, mode="edge")
    ntiles = NCOL_PAD // ct
    x = x.reshape(lead + (ntiles, ct, n_blk, lb))
    nd = x.ndim
    perm = tuple(range(nd - 4)) + (nd - 2, nd - 4, nd - 1, nd - 3)
    return jnp.transpose(x, perm).reshape(lead + (n_blk, ntiles * lb * ct))


def timeit(jf, args):
    def step():
        return jf(*args)
    for _ in range(2):
        float(step())
    best = 1e30
    for _ in range(4):
        t0 = time.perf_counter()
        acc = step()
        for _ in range(ITERS - 1):
            acc = acc + step()
        float(acc)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    rng = np.random.default_rng(0)
    xs = [jax.device_put(rng.uniform(0.5, 2.0, (NCOL, NLAY)).astype(
        np.float32)) for _ in range(4)]
    xlev = jax.device_put(rng.uniform(0.5, 2.0, (NCOL, NLAY + 1)).astype(
        np.float32))
    consume = lambda *ys: sum(jnp.sum(y[..., ::317]) for y in ys)

    def cur(a, b, c, d, e):
        out = [_block_lanes(_pad_cols(v.T, NCOL_PAD), LB, CT)
               for v in (a, b, c, d, e)]
        return consume(*out)

    def single(a, b, c, d, e):
        return consume(*[block_direct(v, LB, CT) for v in (a, b, c, d, e)])

    def t_only(a, b, c, d, e):
        return consume(*[_pad_cols(v.T, NCOL_PAD) for v in (a, b, c, d, e)])

    def noop(a, b, c, d, e):
        return consume(a, b, c, d, e)

    args = (*xs, xlev)
    for name, fn in [("current", cur), ("single", single),
                     ("t_only", t_only), ("noop", noop)]:
        dt = timeit(jax.jit(fn), args)
        print(f"{name:<10} {dt*1e3:8.3f} ms")
    # correctness: single == current
    a = np.asarray(jax.jit(cur)(*args))
    b = np.asarray(jax.jit(single)(*args))
    print("single == current:", np.array_equal(a, b))


if __name__ == "__main__":
    main()
