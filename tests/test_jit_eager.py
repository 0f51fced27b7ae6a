"""jit-vs-eager equivalence of the fused kernels (CPU regression gate).

Round-2 headline bug (VERDICT r2 weak #1): with the CKD model passed as a
JIT ARGUMENT — how bench.py and every CLI driver run — XLA's algebraic
simplifier folded the f32->bf16->f32 convert chain in the bf16x3 table
split (``lo = a - f32(bf16(a))`` -> 0), silently degrading every table
contraction to one bf16 pass and shifting LW fluxes by ~1.4 W/m2.  Eager
and model-closed-over-jit execution were correct, which is why the
interpret-mode suite and the (then-eager) chip-parity gate missed it.

These tests pin the fix (bit-manipulation split, ops/pallas/common.py
``split_bf16``) at three levels:
  * the split itself must survive jit with a nonzero lo half;
  * all three fused kernels (LW, SW, merged LW+SW), jitted with the
    model(s) as arguments, must match their eager evaluation;
  * the jitted fused kernels must match the XLA reference path inside the
    repo's own bf16x3 parity class.

Shapes are kept small (single tile, 60 layers — the shipped layer-block
geometry) because the bug mechanism is trace-level, not tiling-level; the
multi-tile adversarial batch runs on the chip in tools/chip_parity.py,
which also asserts jit == eager per case.
"""
import numpy as np
import jax
import jax.numpy as jnp

from conftest import LW_FSCK, SW_WIDE

from ecckd_tpu.models.loader import load_ckd_model
from ecckd_tpu.ops.pallas import common
from ecckd_tpu.ops.pallas.lw import lw_fluxes_fused
from ecckd_tpu.ops.pallas.sw import sw_fluxes_fused
from ecckd_tpu.ops.pallas.lwsw import lwsw_fluxes_fused
from ecckd_tpu.pipeline import lw_fluxes, sw_fluxes

F32 = np.float32
NCOL, NLAY = 24, 60


def _batch():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from chip_parity import adversarial_batch
    return adversarial_batch(NCOL, NLAY)


def _models():
    lw = load_ckd_model(LW_FSCK, dtype=np.dtype(F32))
    sw = load_ckd_model(SW_WIDE, dtype=np.dtype(F32))
    return lw, sw


def test_split_bf16_survives_jit():
    """The lo half must not be folded away by XLA (the round-2 bug)."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 500.0, (32, 64)).astype(F32))
    eh, el = common.split_bf16(a)
    jh, jl = jax.jit(common.split_bf16)(a)
    assert (np.asarray(jh, F32) == np.asarray(eh, F32)).all()
    assert (np.asarray(jl, F32) == np.asarray(el, F32)).all()
    # the hi half alone loses ~9 bits; lo must carry real information
    assert np.abs(np.asarray(jl, F32)).max() > 0.0
    recon = np.asarray(jh, F32) + np.asarray(jl, F32)
    assert np.abs(recon - np.asarray(a)).max() <= 2e-5 * 500.0


def _assert_jit_eager(jit_out, eager_out, scale, tol=1e-5):
    for j, e in zip(jit_out, eager_out):
        assert np.abs(np.asarray(j) - np.asarray(e)).max() <= tol * scale


def test_lw_fused_jit_matches_eager_model_as_arg():
    lw, _ = _models()
    b = _batch()
    emis_gpt = jnp.broadcast_to(jnp.asarray(b["emis"])[:, None],
                                (NCOL, lw.ngpt)).astype(F32)

    def fn(model, plev, tlay, tlev, tsfc, emis_gpt, concs):
        return lw_fluxes_fused(model, plev, tlay, tlev, tsfc, emis_gpt,
                               concs, n_gauss_angles=1, interpret=True)

    args = (lw, b["plev"], b["tlay"], b["tlev"], b["tsfc"], emis_gpt,
            b["concs"])
    eu, ed = fn(*args)
    ju, jd = jax.jit(fn)(*args)
    scale = float(np.abs(np.asarray(eu)).max())
    _assert_jit_eager((ju, jd), (eu, ed), scale)
    # and the jitted program must sit inside the bf16x3 parity class
    ref = lw_fluxes(lw, b["plev"], b["tlay"], b["tlev"], b["tsfc"],
                    b["emis"], b["concs"], n_gauss_angles=1, backend="xla")
    _assert_jit_eager((ju, jd), (ref.flux_up, ref.flux_dn), scale, tol=5e-5)


def test_sw_fused_jit_matches_eager_model_as_arg():
    _, sw = _models()
    b = _batch()

    def fn(model, plev, tlay, concs, alb, tsi, sza):
        return sw_fluxes_fused(model, plev, tlay, concs, alb, tsi, sza,
                               interpret=True)

    args = (sw, b["plev"], b["tlay"], b["concs"], b["alb"], b["tsi"],
            b["sza"])
    eu, ed = fn(*args)
    ju, jd = jax.jit(fn)(*args)
    scale = float(np.abs(np.asarray(ed)).max())
    _assert_jit_eager((ju, jd), (eu, ed), scale)
    ref = sw_fluxes(sw, b["plev"], b["tlay"], b["concs"], b["alb"],
                    b["tsi"], b["sza"], backend="xla")
    _assert_jit_eager((ju, jd), (ref.flux_up, ref.flux_dn), scale, tol=5e-5)


def test_lwsw_merged_jit_matches_eager_models_as_args():
    lw, sw = _models()
    b = _batch()
    emis_gpt = jnp.broadcast_to(jnp.asarray(b["emis"])[:, None],
                                (NCOL, lw.ngpt)).astype(F32)

    def fn(ml, ms, plev, tlay, tlev, tsfc, emis_gpt, concs, alb, tsi, sza):
        return lwsw_fluxes_fused(ml, ms, plev, tlay, tlev, tsfc, emis_gpt,
                                 concs, alb, tsi, sza, interpret=True)

    args = (lw, sw, b["plev"], b["tlay"], b["tlev"], b["tsfc"], emis_gpt,
            b["concs"], b["alb"], b["tsi"], b["sza"])
    e_out = fn(*args)
    j_out = jax.jit(fn)(*args)
    scale = float(np.abs(np.asarray(e_out[0])).max())
    _assert_jit_eager(j_out, e_out, scale)
