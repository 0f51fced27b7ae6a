"""HISTORICAL repro of the round-2 jit-vs-eager flux divergence (FIXED).

VERDICT round 2 weak #1: jax.jit(lw_fluxes_fused) differed from eager by
~1.4 W/m2.  Root cause: XLA folded the f32->bf16->f32 convert pair in the
bf16 splits when the model tables were TRACED jit arguments (this script
originally closed over the model, which is why the divergence only
appeared once the model rode through jit as an argument — see
tools/bisect_prep.py).  Fixed by the integer-RNE bit split in
ops/pallas/common.split_bf16; the regression now lives in
tests/test_jit_eager.py and the jitted legs of tools/chip_parity.py.
Expected output today: maxabs 0.0.
"""
import os
os.environ["JAX_PLATFORMS"] = os.environ.get("REPRO_PLATFORM", "cpu")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from tools.chip_parity import adversarial_batch, LW_FSCK
from ecckd_tpu.models.loader import load_ckd_model
from ecckd_tpu.ops.pallas.lw import lw_fluxes_fused
from ecckd_tpu.pipeline import _surface_to_gpt

ncol = int(os.environ.get("REPRO_NCOL", "293"))
b = adversarial_batch(ncol, 60)
m = load_ckd_model(LW_FSCK, dtype=np.dtype(np.float32))
emis_gpt = _surface_to_gpt(m, b["emis"], ncol, np.float32)

def f(plev, tlay, tlev, tsfc, emis_gpt, concs):
    return lw_fluxes_fused(m, plev, tlay, tlev, tsfc, emis_gpt, concs,
                           n_gauss_angles=1, interpret=True)

args = (b["plev"], b["tlay"], b["tlev"], b["tsfc"], emis_gpt, b["concs"])
eu, ed = f(*args)
ju, jd = jax.jit(f)(*args)
du = np.abs(np.asarray(eu) - np.asarray(ju))
dd = np.abs(np.asarray(ed) - np.asarray(jd))
print("maxabs up:", du.max(), "dn:", dd.max())
iu = np.unravel_index(du.argmax(), du.shape)
print("worst up at (col, lev):", iu, "eager", np.asarray(eu)[iu],
      "jit", np.asarray(ju)[iu])
idn = np.unravel_index(dd.argmax(), dd.shape)
print("worst dn at (col, lev):", idn, "eager", np.asarray(ed)[idn],
      "jit", np.asarray(jd)[idn])
ncols_bad = (du.max(axis=1) > 1e-4).sum()
print("cols with up-err > 1e-4:", ncols_bad, "of", ncol)
bad = np.where(du.max(axis=1) > 1e-4)[0]
print("bad cols:", bad[:50])
