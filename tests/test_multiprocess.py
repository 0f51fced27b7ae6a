"""Multi-PROCESS (multi-host model) SPMD execution of the flux pipeline.

SURVEY section 5.8 / parallel/mesh.py claim: `jax.distributed.initialize`
+ the same column NamedSharding span hosts transparently, each host
feeding its local shard (jax.make_array_from_process_local_data).  This
test actually runs it: two coordinator-connected processes, each with two
virtual CPU devices (a 4-device global mesh), execute ONE global jitted
LW flux solve on per-process input shards, and every process checks its
addressable output shards bitwise against a single-process reference.

This is the closest an offline single-machine environment gets to the
multi-host leg of BASELINE config 5 (real pod slices remain out of
scope); the collectives ride Gloo instead of ICI but the program —
GSPMD partitioning, process-local feeding, global jit — is the
multi-host program.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys
sys.path.insert(0, os.environ["ECCKD_REPO"])
pid = int(os.environ["ECCKD_MP_PID"])
nproc = int(os.environ["ECCKD_MP_NPROC"])
port = os.environ["ECCKD_MP_PORT"]
# Replace (not append) any inherited device-count flag: the parent
# pytest process carries --xla_force_host_platform_device_count=8 from
# tests/conftest.py, and duplicated flags rely on last-wins parsing.
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=2"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.device_count() == 2 * nproc, jax.devices()

import numpy as np
import jax.numpy as jnp
from ecckd_tpu.gases import GasConcs
from ecckd_tpu.models.loader import load_ckd_model
from ecckd_tpu.parallel import mesh as pmesh
from ecckd_tpu.pipeline import lw_fluxes

LW = ("/root/reference/data/"
      "ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc")
model = load_ckd_model(LW, dtype=np.dtype(np.float32))

# Identical global batch in every process (same seed).
ncol, nlay = 4 * nproc, 16
rng = np.random.default_rng(7)
plev = np.sort(np.exp(rng.uniform(np.log(40.0), np.log(1.01e5),
                                  (ncol, nlay + 1))), axis=1).astype(np.float32)
tlay = rng.uniform(200, 310, (ncol, nlay)).astype(np.float32)
tlev = rng.uniform(200, 310, (ncol, nlay + 1)).astype(np.float32)
tsfc = rng.uniform(250, 320, ncol).astype(np.float32)
emis = np.linspace(0.8, 1.0, ncol).astype(np.float32)
h2o = (10.0 ** rng.uniform(-6, -2, (ncol, nlay))).astype(np.float32)
co2 = np.full(ncol, 4e-4, np.float32)

# Single-process reference on plain host arrays (no sharding) — jitted,
# like the distributed leg, so both sides are XLA-compiled programs (the
# eager reference differed by ~2e-7: op-by-op dispatch vs fused fma).
concs_ref = GasConcs.create([("h2o", h2o), ("co2", co2)])
ref = jax.jit(lambda *a: lw_fluxes(model, *a, backend="xla"))(
    plev, tlay, tlev, tsfc, emis, concs_ref)
ref_up = np.asarray(ref.flux_up)
ref_dn = np.asarray(ref.flux_dn)

# Distributed leg: global mesh over all processes' devices; each process
# feeds ONLY its local rows.
mesh = pmesh.make_column_mesh()
col = pmesh.column_sharding(mesh)
lo, hi = pid * 4, (pid + 1) * 4
feed = lambda a: jax.make_array_from_process_local_data(col, a[lo:hi])
concs = GasConcs.create([("h2o", feed(h2o)), ("co2", feed(co2))])
out = jax.jit(lambda *a: lw_fluxes(model, *a, backend="xla"))(
    feed(plev), feed(tlay), feed(tlev), feed(tsfc), feed(emis), concs)
jax.block_until_ready(out)

# Check every addressable shard bitwise against the reference rows.
for name, garr, refa in (("up", out.flux_up, ref_up),
                         ("dn", out.flux_dn, ref_dn)):
    for shard in garr.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      refa[rows], err_msg=name)

# Leg 2: the FUSED Pallas kernel (interpret mode) under shard_map across
# BOTH processes — the exact per-device program a pod runs, with the
# model subtree pinned replicated (see shard_columns_call).
from ecckd_tpu.ops.pallas.lw import lw_fluxes_fused

def fused_step(m, plev, tlay, tlev, tsfc, emis, concs):
    emis_gpt = jnp.broadcast_to(emis[:, None], (plev.shape[0], m.ngpt))
    return lw_fluxes_fused(m, plev, tlay, tlev, tsfc, emis_gpt, concs,
                           n_gauss_angles=1, interpret=True)

upf, dnf = jax.jit(lambda *a: pmesh.shard_columns_call(
    fused_step, mesh, a, ncol, replicated_argnums=(0,)))(
    model, feed(plev), feed(tlay), feed(tlev), feed(tsfc), feed(emis),
    concs)
jax.block_until_ready((upf, dnf))
scale = float(np.abs(ref_up).max())
for garr, refa in ((upf, ref_up), (dnf, ref_dn)):
    for shard in garr.addressable_shards:
        rows = shard.index[0]
        assert (np.abs(np.asarray(shard.data) - refa[rows])
                <= 5e-5 * scale).all(), "fused multi-process mismatch"

# Leg 3: the MERGED LW+SW kernel — the program bench.py times and
# ecckd_rfmip.py ships — at 3 angles (physics index 2) under shard_map
# across BOTH processes (VERDICT r4 weak #5).  Two checks per
# addressable shard: BITWISE vs the same jitted program run locally on
# that shard's columns (the per-device program is exactly the
# single-process program), and 5e-5-relative vs the jitted full-batch
# single-process run (the dynamic contraction windows are chosen per
# 128-column tile from min/max over the tile's lanes, so a different
# column grouping legitimately reorders windowed sums by ~1 ulp —
# full-batch bitwise equality is not a valid invariant).
from ecckd_tpu.ops.pallas.lwsw import lwsw_fluxes_fused

SW = ("/root/reference/data/"
      "ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc")
sw_model = load_ckd_model(SW, dtype=np.dtype(np.float32))
alb = np.linspace(0.05, 0.7, ncol).astype(np.float32)
tsi = np.full(ncol, 1361.0, np.float32)
sza = np.linspace(10.0, 100.0, ncol).astype(np.float32)

def merged_step(ml, ms, plev, tlay, tlev, tsfc, emis, concs, alb, tsi,
                sza):
    emis_gpt = jnp.broadcast_to(emis[:, None], (plev.shape[0], ml.ngpt))
    return lwsw_fluxes_fused(ml, ms, plev, tlay, tlev, tsfc, emis_gpt,
                             concs, alb, tsi, sza, n_gauss_angles=3,
                             interpret=True)

merged_jit = jax.jit(merged_step)
ref_m = [np.asarray(x) for x in merged_jit(
    model, sw_model, plev, tlay, tlev, tsfc, emis, concs_ref, alb, tsi,
    sza)]
outs = jax.jit(lambda *a: pmesh.shard_columns_call(
    merged_step, mesh, a, ncol, replicated_argnums=(0, 1)))(
    model, sw_model, feed(plev), feed(tlay), feed(tlev), feed(tsfc),
    feed(emis), concs, feed(alb), feed(tsi), feed(sza))
jax.block_until_ready(outs)
mscale = max(np.abs(r).max() for r in ref_m)
local_ref = {}
for k, garr in enumerate(outs):
    for shard in garr.addressable_shards:
        rows = shard.index[0]
        key = (rows.start, rows.stop)
        if key not in local_ref:
            sl = slice(*key)
            concs_sl = GasConcs.create([("h2o", h2o[sl]), ("co2", co2[sl])])
            local_ref[key] = [np.asarray(x) for x in merged_jit(
                model, sw_model, plev[sl], tlay[sl], tlev[sl], tsfc[sl],
                emis[sl], concs_sl, alb[sl], tsi[sl], sza[sl])]
        np.testing.assert_array_equal(
            np.asarray(shard.data), local_ref[key][k],
            err_msg="merged per-device program != local program")
        assert (np.abs(np.asarray(shard.data) - ref_m[k][rows])
                <= 5e-5 * mscale).all(), "merged vs full-batch mismatch"
print(f"MP_OK p{pid}", flush=True)
'''


def _launch(port: int, nproc: int):
    procs = []
    for pid in range(nproc):
        env = dict(os.environ, ECCKD_REPO=REPO, ECCKD_MP_PID=str(pid),
                   ECCKD_MP_NPROC=str(nproc), ECCKD_MP_PORT=str(port))
        # A fresh interpreter per process: the parent's initialized JAX
        # backend (8 virtual devices, no coordinator) must not leak in.
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    try:
        return [(p, p.communicate(timeout=900)[0]) for p in procs]
    finally:
        # A deadlocked worker (e.g. jax.distributed.initialize waiting on
        # a dead peer) raises TimeoutExpired above; without this, BOTH
        # children would outlive the test holding the coordinator port
        # and CPU, and the retry would stack two more alongside them.
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()


@pytest.mark.filterwarnings("ignore")
def test_two_process_spmd_flux_pipeline():
    nproc = 2
    # Bind-then-close port picking has a TOCTOU window (another process can
    # grab the port before the coordinator binds it); retry the whole
    # launch once on a coordinator-bind-shaped failure.
    for attempt in range(2):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        results = _launch(port, nproc)
        failed = [(pid, p, out) for pid, (p, out) in enumerate(results)
                  if p.returncode != 0 or f"MP_OK p{pid}" not in out]
        if not failed:
            return
        bind_race = any("address already in use" in out.lower()
                        or "failed to bind" in out.lower()
                        for _, _, out in failed)
        if not (bind_race and attempt == 0):
            pid, p, out = failed[0]
            assert False, f"process {pid} failed:\n{out[-3000:]}"
