"""Weak-scaling harness: chunked million-column runs with output overlap.

BASELINE config 5 / SURVEY.md section 5.8: scale the RFMIP workload to
~1M replicated columns sharded over a device mesh, streaming the broadband
flux outputs back to the host *overlapped* with the next chunk's compute.
The reference has no counterpart (serial Fortran, single address space);
this is the TPU-native design for the gather/compute-overlap requirement.

How the overlap works (all JAX dispatch is asynchronous):

  for each chunk i:
    1. device_put chunk i inputs        (H2D copy, async)
    2. dispatch the jitted flux step    (compute, async)
    3. copy_to_host_async on outputs    (D2H enqueued behind compute)
    4. consume chunk i-1 on the host    (np.asarray blocks only until the
       *previous* chunk's D2H finished — i.e. host writing of chunk i-1
       proceeds while the device computes chunk i)

So the device pipeline (H2D -> compute -> D2H) never stalls on host-side
netCDF/np writes, and the host never blocks on in-flight compute.
"""
from __future__ import annotations

import time
from typing import Callable, Iterable, Optional, Sequence, Tuple

import jax
import numpy as np

from jax.sharding import Mesh

from ecckd_tpu.parallel import mesh as pmesh


def place_pytree(tree, mesh: Optional[Mesh], ncol: int, batch_leaf=None):
    """Device-place a pytree: leaves with a leading ``ncol`` axis get column
    sharding over ``mesh`` (replicated otherwise); no mesh = default device.
    Pass ``batch_leaf`` (leaf -> bool) to mark batch leaves explicitly when
    a replicated leaf's leading extent could coincide with ``ncol``."""
    if mesh is None or mesh.devices.size == 1:
        return jax.tree_util.tree_map(jax.device_put, tree)
    col = pmesh.column_sharding(mesh)
    rep = pmesh.replicated(mesh)
    if batch_leaf is None:
        batch_leaf = (lambda x: getattr(x, "ndim", 0) >= 1
                      and x.shape[0] == ncol)

    def put(x):
        x = np.asarray(x) if not hasattr(x, "dtype") else x
        return jax.device_put(x, col if batch_leaf(x) else rep)

    return jax.tree_util.tree_map(put, tree)


def stream_chunks(step: Callable, chunks: Iterable[Tuple[tuple, object]],
                  consume: Optional[Callable] = None) -> dict:
    """Run ``step(*args)`` over a stream of pre-placed input chunks with
    device compute overlapped against host-side output consumption.

    Args:
      step: jitted function; returns a pytree of device arrays.
      chunks: iterable of ``(args, meta)``; ``args`` already device-placed
        (see place_pytree) so H2D for chunk i+1 can also overlap.
      consume: ``consume(host_outputs, meta)`` called for every chunk, one
        chunk behind the device (the overlap window).  None = outputs are
        fetched (completion-barrier) and dropped.

    Returns timing metrics: total wall seconds, host consume seconds.
    """
    t0 = time.perf_counter()
    consume_s = 0.0
    n_chunks = 0
    prev = None  # (outputs, meta) one chunk behind the device

    def drain(outs, meta):
        nonlocal consume_s
        host = jax.tree_util.tree_map(np.asarray, outs)  # waits on D2H only
        tc = time.perf_counter()
        if consume is not None:
            consume(host, meta)
        consume_s += time.perf_counter() - tc

    for args, meta in chunks:
        outs = step(*args)
        # Enqueue D2H behind this chunk's compute; does not block.
        jax.tree_util.tree_map(
            lambda x: x.copy_to_host_async() if hasattr(
                x, "copy_to_host_async") else None, outs)
        if prev is not None:
            drain(*prev)
        prev = (outs, meta)
        n_chunks += 1
    if prev is not None:
        drain(*prev)
    return {"wall_s": time.perf_counter() - t0,
            "consume_s": consume_s, "n_chunks": n_chunks}


def run_weak_scaling(step: Callable, chunk_builder: Callable[[int], tuple],
                     n_chunks: int, chunk_cols: int,
                     mesh: Optional[Mesh] = None,
                     consume: Optional[Callable] = None,
                     warmup: int = 1,
                     chunk_ids: Optional[Sequence] = None) -> dict:
    """Chunked weak-scaling run.

    Args:
      step: jitted flux step taking the chunk args.
      chunk_builder: ``i -> host args tuple`` for chunk i (leading column
        axis = chunk_cols on the batch leaves).
      n_chunks: chunks to stream (total columns = n_chunks * chunk_cols).
      mesh: optional column mesh to shard each chunk over.
      consume: optional host output sink (overlapped; see stream_chunks).
      warmup: untimed pre-run chunks (compile + cache warm).
      chunk_ids: explicit chunk ids to process (restart-at-chunk: pass the
        not-yet-completed subset; defaults to range(n_chunks)).

    Returns metrics incl. columns/s and columns/s/device.
    """
    n_dev = mesh.devices.size if mesh is not None else 1
    ids = list(range(n_chunks)) if chunk_ids is None else list(chunk_ids)

    def placed(i):
        return place_pytree(chunk_builder(i), mesh, chunk_cols)

    if warmup and ids:
        stream_chunks(step, ((placed(ids[i % len(ids)]), None)
                             for i in range(warmup)))
    m = stream_chunks(step, ((placed(i), i) for i in ids),
                      consume=consume)
    total_cols = len(ids) * chunk_cols
    cols_per_sec = total_cols / m["wall_s"]
    return {**m, "total_columns": total_cols, "n_devices": n_dev,
            "columns_per_sec": cols_per_sec,
            "columns_per_sec_per_device": cols_per_sec / n_dev,
            "host_consume_fraction": m["consume_s"] / m["wall_s"]}
