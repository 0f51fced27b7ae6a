"""Weak-scaling benchmark driver: ~1M-column RFMIP workload, chunked.

BASELINE config 5: replicate RFMIP-shaped columns to ``--columns`` total,
stream them through the combined LW+SW flux solve in ``--chunk``-column
chunks sharded over the local column mesh, with host-side output writes
overlapped against device compute (parallel/scale.py).  Prints one JSON
metrics line.

Example:
    python -m ecckd_tpu.cli.scale_bench --columns 1048576 --chunk 65536
    python -m ecckd_tpu.cli.scale_bench --columns 65536 --out-dir /tmp/flx
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

LW_FILE = ("/root/reference/data/"
           "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
SW_FILE = ("/root/reference/data/"
           "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="scale_bench",
        description="Chunked weak-scaling LW+SW flux benchmark")
    p.add_argument("--columns", type=int, default=1_048_576,
                   help="Total columns to process")
    p.add_argument("--chunk", type=int, default=65_536,
                   help="Columns per streamed chunk")
    p.add_argument("--nlay", type=int, default=60)
    p.add_argument("--lw-file", default=LW_FILE)
    p.add_argument("--sw-file", default=SW_FILE)
    p.add_argument("--out-dir", default=None,
                   help="If set, write rlu/rld/rsu/rsd .npy memmaps there "
                        "(host writes overlap device compute)")
    p.add_argument("--no-shard", action="store_true")
    p.add_argument("--outputs", default="full",
                   choices=("full", "boundary", "toa-net"),
                   help="Streamed outputs per column: 'full' = all four "
                        "broadband flux profiles (~1 KB/col), 'boundary' = "
                        "OLR / surface-down per band (16 B/col), 'toa-net' "
                        "= net TOA radiation (4 B/col).  The reduced modes "
                        "exist to measure the stream_chunks overlap where "
                        "COMPUTE, not D2H transport, is the bottleneck: "
                        "through this dev chip's ~30 MB/s tunneled relay "
                        "the full profiles can never be compute-bound "
                        "(SCALE_CHIP.json), while the machinery under "
                        "test — async dispatch, copy_to_host_async, "
                        "one-chunk-behind host consumption — is identical "
                        "in every mode")
    p.add_argument("--depth", type=int, default=2,
                   help="In-flight chunks behind the host drain point "
                        "(parallel/scale.py stream_chunks); 1 restores "
                        "the single-deep round-3 pipeline for A/B")
    p.add_argument("--resume", action="store_true",
                   help="Restart-at-chunk: skip chunks recorded as done in "
                        "<out-dir>/progress.json (requires --out-dir)")
    p.add_argument("--repeats", type=int, default=None,
                   help="Best-of-N streamed passes (house best-of-epochs "
                        "timing protocol).  Default: 4 for pure "
                        "measurement runs, forced to 1 with --out-dir "
                        "(real writes must stream each chunk once)")
    args = p.parse_args(argv)
    if args.resume and not args.out_dir:
        p.error("--resume requires --out-dir")
    if args.columns % args.chunk:
        p.error("--columns must be divisible by --chunk")

    from ecckd_tpu.cli.common import setup_compilation_cache
    setup_compilation_cache()

    import jax
    from ecckd_tpu.models.loader import load_ckd_model
    from ecckd_tpu.parallel import mesh as pmesh
    from ecckd_tpu.parallel.scale import place_pytree, run_weak_scaling
    from ecckd_tpu.pipeline import lw_sw_fluxes
    from ecckd_tpu.io.synthetic import example_flux_batch as _example_batch

    dtype = np.float32
    mesh = None
    if not args.no_shard and len(jax.devices()) > 1:
        mesh = pmesh.make_column_mesh()

    lw = place_pytree(load_ckd_model(args.lw_file, dtype=dtype), mesh, -1)
    sw = place_pytree(load_ckd_model(args.sw_file, dtype=dtype), mesh, -1)

    outputs_mode = args.outputs

    @jax.jit
    def step(lw_m, sw_m, plev, tlay, tlev, tsfc, emis, alb, tsi, sza, concs):
        # Merged LW+SW mega-kernel on TPU (one shared interpolation pass,
        # ops/pallas/lwsw.py); separate pipelines elsewhere.
        flw, fsw = lw_sw_fluxes(lw_m, sw_m, plev, tlay, tlev, tsfc, emis,
                                concs, alb, tsi, sza, n_gauss_angles=1)
        if outputs_mode == "full":
            return (flw.flux_up, flw.flux_dn, fsw.flux_up, fsw.flux_dn)
        if outputs_mode == "boundary":
            # OLR, LW surface heating, reflected SW, SW surface insolation.
            return (flw.flux_up[:, 0], flw.flux_dn[:, -1],
                    fsw.flux_up[:, 0], fsw.flux_dn[:, -1])
        # toa-net: net downward radiation at TOA (the climate diagnostic).
        return (fsw.flux_dn[:, 0] - fsw.flux_up[:, 0] - flw.flux_up[:, 0],)

    # Weak-scaling input: one RFMIP-shaped base chunk, device-placed ONCE;
    # per-chunk only the surface temperature is re-uploaded (perturbed so
    # chunks are not byte-identical, guarding against accidental result
    # caching).  This models the production streaming pattern where the
    # reader uploads each chunk's deltas while the device computes.
    base = _example_batch(args.chunk, args.nlay, dtype)
    batch = place_pytree(
        (base["plev"], base["tlay"], base["tlev"], base["tsfc"],
         base["emis"], base["alb"], base["tsi"], base["sza"],
         base["concs"]), mesh, args.chunk)

    def chunk_builder(i):
        tsfc = base["tsfc"] + dtype(0.01) * dtype(i % 7)
        return (lw, sw, batch[0], batch[1], batch[2], tsfc, *batch[4:])

    # place_pytree's batch_leaf escape hatch, for exactly this caller's
    # hazard: the chunk args BUNDLE the model pytrees, whose replicated
    # leaves (e.g. log_pressure, leading extent n_p=53 in every shipped
    # file) would match the default shape[0]==chunk heuristic whenever
    # --chunk collides with a table extent and get column-sharded.  The
    # model leaves are the stable placed arrays closed over above, so an
    # identity check marks them explicitly.
    model_leaf_ids = {id(leaf)
                      for leaf in jax.tree_util.tree_leaves((lw, sw))}

    def batch_leaf(x):
        return (id(x) not in model_leaf_ids
                and getattr(x, "ndim", 0) >= 1
                and x.shape[0] == args.chunk)

    n_chunks = args.columns // args.chunk
    consume = None
    done: set = set()
    progress_path = None
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        nlev = args.nlay + 1
        # Checkpoint/restart (SURVEY.md section 5.4): completed chunk ids
        # are journaled so an interrupted million-column run resumes at the
        # first unfinished chunk instead of recomputing everything.
        progress_path = os.path.join(args.out_dir, "progress.json")
        run_cfg = {"columns": args.columns, "chunk": args.chunk,
                   "nlay": args.nlay, "outputs": outputs_mode}
        if args.resume and os.path.exists(progress_path):
            with open(progress_path) as f:
                journal = json.load(f)
            done = set(journal.get("done", []))
            # The reduced-output shapes don't encode nlay, so the memmap
            # shape check below cannot catch a wrong --nlay resume there;
            # the journaled run config is the fail-fast for every mode
            # (a resume must not silently mix fluxes from different
            # grids/chunkings into one artifact).
            prev_cfg = journal.get("config")
            if prev_cfg is not None and prev_cfg != run_cfg:
                p.error(f"--resume config mismatch: journal has {prev_cfg}"
                        f", this run is {run_cfg}")
            print(f"# resuming: {len(done)}/{n_chunks} chunks already done",
                  file=sys.stderr)
        elif os.path.exists(progress_path):
            # Fresh (non --resume) run: the memmaps are about to be
            # truncated, so a stale journal from a previous run must not
            # survive — a crash before the first consume() would otherwise
            # let a later --resume skip chunks whose rows were zeroed.
            os.remove(progress_path)
        mode = "r+" if (args.resume and done) else "w+"
        out_spec = {
            "full": (("rlu", "rld", "rsu", "rsd"), (args.columns, nlev)),
            "boundary": (("olr", "rlds", "rsut", "rsds"), (args.columns,)),
            "toa-net": (("toa_net",), (args.columns,)),
        }[outputs_mode]
        maps = {name: np.lib.format.open_memmap(
                    os.path.join(args.out_dir, f"{name}.npy"), mode=mode,
                    dtype=dtype, shape=out_spec[1])
                for name in out_spec[0]}
        for name, m in maps.items():
            # open_memmap(mode="r+") keeps the existing on-disk header: a
            # resume with different --columns/--nlay must fail fast, not
            # IndexError hours into the run (or silently keep stale rows).
            if m.shape != out_spec[1]:
                p.error(f"{name}.npy has shape {m.shape}; this run needs "
                        f"{out_spec[1]} — wrong --columns (or --nlay, in "
                        "full mode) for --resume")

        def consume(host_outs, i):
            s = slice(i * args.chunk, (i + 1) * args.chunk)
            for name, arr in zip(out_spec[0], host_outs):
                maps[name][s] = arr
            done.add(int(i))
            with open(progress_path, "w") as f:
                json.dump({"done": sorted(done), "config": run_cfg}, f)

    pending = [i for i in range(n_chunks) if i not in done]

    # In-process COMPUTE reference: the same jitted step on the same
    # placed chunk, batched dispatch with a 4-byte scalar fetch as the
    # barrier (bench.py protocol) — no per-chunk D2H of the outputs.
    # streamed/compute_ref is the overlap efficiency WITHOUT the
    # cross-process epoch drift that comparing against bench.py's
    # number would reintroduce (CLAUDE.md timing rules).
    import time as _time
    import jax.numpy as jnp
    ref_args = place_pytree(chunk_builder(0), mesh, args.chunk,
                            batch_leaf=batch_leaf)

    def _ref_step():
        outs = step(*ref_args)
        return jnp.sum(outs[0][..., 0]) if outs[0].ndim > 1 \
            else jnp.sum(outs[0])

    float(_ref_step()); float(_ref_step())

    # Fixed-size reference epoch: the in-process compute rate estimate
    # converges in ~a dozen batched dispatches; O(1) in the workload
    # (the old 2*len(pending) epoch made large runs re-pay their own
    # compute to measure the denominator).
    REF_ITERS = 8

    def ref_epoch() -> float:
        t0 = _time.perf_counter()
        acc = _ref_step()
        for _ in range(REF_ITERS - 1):
            acc = acc + _ref_step()
        float(acc)
        return (_time.perf_counter() - t0) / REF_ITERS

    if args.out_dir and args.repeats is not None and args.repeats > 1:
        p.error("--repeats > 1 conflicts with --out-dir: journaled "
                "writes must stream each chunk exactly once")
    rounds = 1 if args.out_dir else \
        (4 if args.repeats is None else max(args.repeats, 1))
    # INTERLEAVED A/B rounds (ref epoch, then streamed pass), best-of
    # each, per the repo timing protocol: measuring all ref epochs
    # before all streamed passes leaves a window where a slow epoch
    # under the reference and a fast one under the streaming inflates
    # overlap_efficiency past 1.0 (chip drift is ±40-60% BETWEEN
    # windows).  Each round re-streams every pending chunk; the
    # exactly-once consume contract is preserved because rounds == 1
    # whenever --out-dir journaling is active.
    best_ref = 1e30
    metrics = None
    for k in range(rounds):
        best_ref = min(best_ref, ref_epoch())
        m = run_weak_scaling(step, chunk_builder, n_chunks, args.chunk,
                             mesh=mesh, consume=consume,
                             warmup=1 if k == 0 else 0,
                             chunk_ids=pending, depth=args.depth,
                             batch_leaf=batch_leaf)
        if metrics is None or m["wall_s"] < metrics["wall_s"]:
            metrics = m
    compute_ref = args.chunk / best_ref
    metrics["streamed_repeats_best_of"] = rounds
    metrics["compute_ref_cols_per_sec"] = compute_ref
    metrics["overlap_efficiency"] = (metrics["columns_per_sec"]
                                     / compute_ref)
    if args.out_dir:
        for m in maps.values():
            m.flush()

    metrics = {k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in metrics.items()}
    print(json.dumps({"metric": "weak_scaling_lw+sw_throughput",
                      "unit": "columns/s", "outputs": outputs_mode,
                      **metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
