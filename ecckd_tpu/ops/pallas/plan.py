"""Trace-time gas-optics plan for the fused Pallas kernels.

The reference's per-gas interpolation loop
(/root/reference/src/gas_optics_ecckd.f90:323-376) becomes, on TPU, MXU
contractions per (layer-block, column-tile) of one-hot interpolation
matrices over the flattened (pressure, temperature) grid against two stacked
coefficient tables:

  * a DENSE table with one ngpt-row slice per bi-linear gas, in requested
    order, contracted once and combined by a static per-slice weighted sum;
  * a LUT table (h2o) kept 3-D (mole_fraction, p*8+t, g-point) so the
    tri-linear vmr interpolation contracts only a dynamic ``wv``-slice
    window of the mole-fraction axis (2 active slices per column out of 12
    in the shipped files), with the vmr interpolation weight folded into
    the per-slice scalar row — instead of pre-contracting all 12 slices
    and discarding 10 of them.

Validity note: the per-g-point negative-optical-depth clamp
(gas_optics_ecckd.f90:234-238) is implemented as a clamp on the per-column
*weight* (``max(w, 0)``).  The two are equivalent iff every coefficient in
the gas's table is non-negative — true for all three shipped ckd files
(verified at load; see ``table_nonneg``).  A gas with a negative table entry
is excluded from the fused path and the caller falls back to the XLA path.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecckd_tpu import constants
from ecckd_tpu.gases import GasConcs
from ecckd_tpu.models.ckd import CKDModel
from ecckd_tpu.ops.optical_depth import resolve_contributions


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class SlicePlan:
    """One ngpt-row block of the stacked DENSE table."""
    vmr_slot: int          # row into the stacked vmr array, or -1 (composite)
    a: float               # weight = simple_weight * max(a*vmr + b, 0)
    b: float


@dataclasses.dataclass(frozen=True)
class GasOpticsPlan:
    """Static structure + stacked arrays consumed by the fused kernels.

    Array shapes (NG = ngpt padded to a multiple of 8):
      dense table  (n_p * 8, n_dense * NG)   transposed, see dense_table_t
      lut table    (n_lut, n_p * 8, NG)      see lut_table_t
      vmrs         (n_vmr, nlay, ncol)       per-profile-gas vmr (per call)
    """
    slices: Tuple[SlicePlan, ...]   # dense gases only, requested order
    vmr_names: Tuple[str, ...]
    ngpt: int
    ng_pad: int
    npt_pad: int
    n_p: int
    n_t: int
    lut_sizes: Tuple[int, ...]    # per-LUT-gas mole-fraction axis length
    lut_log_mf0: Tuple[float, ...]
    lut_inv_dlog: Tuple[float, ...]
    lut_vmr_slots: Tuple[int, ...]
    """Per-LUT-gas row in the stacked vmr array holding the plain vmr."""
    lut_log_slots: Tuple[int, ...]
    """Per-LUT-gas row in the stacked vmr array holding ln(max(vmr, mf0)),
    precomputed host-side (Mosaic's in-kernel log is too approximate)."""
    fused_ok: bool                # False -> caller must use the XLA path


def table_nonneg(model: CKDModel) -> bool:
    """True if every coefficient table is non-negative.  Computed by the
    loader on the host arrays and carried as static metadata, so the check
    is usable under jit tracing."""
    return model.tables_nonneg


def build_plan(model: CKDModel, gas_names: Tuple[str, ...]) -> GasOpticsPlan:
    """Resolve the requested-gas set (reference semantics: order kept,
    unknown skipped, composite once) into a fused-kernel plan."""
    contributions = resolve_contributions(model, gas_names)
    n_p = int(model.log_pressure.shape[0])
    n_t = int(model.temperature_grid.shape[1])
    ngpt = model.ngpt
    ng_pad = _round_up(ngpt, 8)
    npt_pad = _round_up(n_p * n_t, 8)

    slices: List[SlicePlan] = []
    vmr_names: List[str] = []
    lut_sizes: List[int] = []
    lut_log_mf0: List[float] = []
    lut_inv_dlog: List[float] = []
    lut_slots: List[int] = []

    def vmr_slot(name: str) -> int:
        if name not in vmr_names:
            vmr_names.append(name)
        return vmr_names.index(name)

    for c in contributions:
        gi = c.gas_index
        code = model.gas_codes[gi]
        if code == constants.CONC_LUT:
            grid = model.lut_mf_grids[model.gas_table_idx[gi]]
            lut_sizes.append(len(grid))
            lut_log_mf0.append(float(np.log(grid[0])))
            lut_inv_dlog.append(float(1.0 / np.log(grid[1] / grid[0])))
            lut_slots.append(vmr_slot(c.name))
        else:
            a, b = model.weight_scale_offset(gi)
            slot = vmr_slot(c.name) if a != 0.0 else -1
            slices.append(SlicePlan(slot, a, b))

    # ln(vmr) rows for LUT gases are appended after the plain vmr rows.
    lut_log_slots = tuple(len(vmr_names) + i for i in range(len(lut_slots)))
    return GasOpticsPlan(
        slices=tuple(slices), vmr_names=tuple(vmr_names), ngpt=ngpt,
        ng_pad=ng_pad, npt_pad=npt_pad, n_p=n_p, n_t=n_t,
        lut_sizes=tuple(lut_sizes), lut_log_mf0=tuple(lut_log_mf0),
        lut_inv_dlog=tuple(lut_inv_dlog),
        lut_vmr_slots=tuple(lut_slots), lut_log_slots=lut_log_slots,
        # The fused kernel wires exactly one LUT gas's vmr/mole-fraction
        # index through gas_tau_block; a hypothetical ckd file with two
        # LUT gases must take the XLA path.
        fused_ok=table_nonneg(model) and len(lut_slots) <= 1)


def _pt_slice(blk, n_p: int, n_t: int, ngpt: int, dtype) -> jax.Array:
    """(n_p * 8, ngpt) transposed slice: sublane row p*8 + t (temperature
    axis padded n_t -> 8 with zeros so windows of whole pressure points stay
    8-sublane aligned for dynamic slicing)."""
    t = jnp.zeros((n_p, 8, ngpt), dtype).at[:, :n_t, :].set(
        blk.reshape(n_p, n_t, ngpt).astype(dtype))
    return t.reshape(n_p * 8, ngpt)


def dense_table_t(model: CKDModel, plan: GasOpticsPlan,
                  gas_names: Tuple[str, ...], dtype) -> jax.Array:
    """(n_p * 8, n_dense * NG) TRANSPOSED stacked dense-gas table for the
    pressure-WINDOWED contraction: sublane row p*8 + t, lane column
    s*NG + g.  Zero padding keeps the windowed one-hot contraction exact."""
    contributions = resolve_contributions(model, gas_names)
    n_p, n_t, ngpt = plan.n_p, plan.n_t, plan.ngpt
    blocks = [model.coeff_dense[model.gas_table_idx[c.gas_index]]
              for c in contributions
              if model.gas_codes[c.gas_index] != constants.CONC_LUT]
    out = jnp.zeros((n_p * 8, len(blocks) * plan.ng_pad), dtype)
    for s, blk in enumerate(blocks):
        out = jax.lax.dynamic_update_slice(
            out, _pt_slice(blk, n_p, n_t, ngpt, dtype), (0, s * plan.ng_pad))
    return out


def lut_table_t(model: CKDModel, plan: GasOpticsPlan,
                gas_names: Tuple[str, ...], dtype) -> Optional[jax.Array]:
    """(n_lut, n_p * 8, NG) LUT-gas (h2o) table, one (p*8+t, g-point) slice
    per mole-fraction grid point, g-points zero-padded to NG lanes.  Kept
    3-D so the kernel can contract a dynamic mole-fraction window (leading
    dim) x pressure window (sublane dim).  None when no LUT gas is in the
    requested set."""
    contributions = resolve_contributions(model, gas_names)
    n_p, n_t, ngpt = plan.n_p, plan.n_t, plan.ngpt
    for c in contributions:
        gi = c.gas_index
        if model.gas_codes[gi] == constants.CONC_LUT:
            table = model.coeff_lut[model.gas_table_idx[gi]]
            n_lut = table.shape[0]
            out = jnp.zeros((n_lut, n_p * 8, plan.ng_pad), dtype)
            for v in range(n_lut):
                out = out.at[v, :, :ngpt].set(
                    _pt_slice(table[v], n_p, n_t, ngpt, dtype))
            return out
    return None


def kernel_tables(model: CKDModel, plan: GasOpticsPlan,
                  gas_names: Tuple[str, ...], dtype
                  ) -> Tuple[jax.Array, jax.Array]:
    """dense_table_t + lut_table_t with the kernel-ready zero fallbacks,
    the single home for all three fused kernels: a LUT-only request
    leaves the stacked dense table with ZERO slices — the kernel must
    skip the dense contraction, since a 0-lane operand is a Mosaic error
    ('vector types must have positive constant sizes',
    test_fused_lut_only_gas_set) — and a LUT-less request gets a
    (1, 8, NG) dummy the kernel never touches."""
    t = dense_table_t(model, plan, gas_names, dtype)
    if t.shape[1] == 0:
        t = jnp.zeros((t.shape[0], plan.ng_pad), dtype)
    lut = lut_table_t(model, plan, gas_names, dtype)
    if lut is None:
        lut = jnp.zeros((1, 8, plan.ng_pad), dtype)
    return t, lut


def split_vmrs_multi(plans, gas_concs: GasConcs, ncol: int, nlay: int,
                     dtype
                     ) -> Tuple[Optional[jax.Array], Optional[jax.Array],
                                Tuple[Tuple[Tuple[str, int], ...], ...]]:
    """Trace-time profile/scalar split of the stacked vmr rows, SHARED by
    one or several plans (the merged LW+SW kernel).

    Returns (profiles (n_pr, nlay, ncol) | None, scalars (n_sc, ncol) |
    None, kinds_per_plan), where ``kinds_per_plan[m][slot] = ("p"|"s",
    index)`` maps plan m's vmr slot into one of the two shared stacks;
    LUT gases get an appended ln(max(vmr, mf0)) row (plan.lut_log_slots)
    so the kernel never calls Mosaic's approximate log.  Rows requested
    by several plans (h2o, o3, ...) are stored once.  Gases stored
    without a layer axis (the RFMIP well-mixed species) stay as (ncol,)
    rows — the kernel broadcasts them across the lane-blocked layer axis
    for free instead of the host materializing and relayouting a
    (nlay, ncol) profile per gas."""
    prof: List[jax.Array] = []
    scal: List[jax.Array] = []
    index: dict = {}

    def add(key, row: jax.Array) -> Tuple[str, int]:
        if key in index:
            return index[key]
        if row.ndim == 2:
            k = ("p", len(prof))
            prof.append(row)
        else:
            k = ("s", len(scal))
            scal.append(row)
        index[key] = k
        return k

    kinds_all: List[Tuple[Tuple[str, int], ...]] = []
    for plan in plans:
        kinds: List[Tuple[str, int]] = []
        for n in plan.vmr_names:
            v = jnp.asarray(gas_concs.values[gas_concs.names.index(n)])
            if v.ndim == 2:                   # (ncol, nlay) profile
                kinds.append(add(n, v.astype(dtype).T))
            else:                             # () or (ncol,) well-mixed
                kinds.append(add(n, jnp.broadcast_to(
                    jnp.atleast_1d(v).astype(dtype), (ncol,))))
        for i, slot in enumerate(plan.lut_vmr_slots):
            log_mf0 = plan.lut_log_mf0[i]
            mf0 = float(np.exp(log_mf0))
            kind, idx = kinds[slot]
            row = prof[idx] if kind == "p" else scal[idx]
            kinds.append(add(("log", plan.vmr_names[slot], log_mf0),
                             jnp.log(jnp.maximum(row, mf0))))
        kinds_all.append(tuple(kinds))
    return (jnp.stack(prof) if prof else None,
            jnp.stack(scal) if scal else None, tuple(kinds_all))


def split_vmrs(plan: GasOpticsPlan, gas_concs: GasConcs, ncol: int,
               nlay: int, dtype
               ) -> Tuple[Optional[jax.Array], Optional[jax.Array],
                          Tuple[Tuple[str, int], ...]]:
    """Single-plan wrapper over split_vmrs_multi (see there)."""
    if not plan.vmr_names:
        return None, None, ()
    prof, scal, kinds_all = split_vmrs_multi((plan,), gas_concs, ncol,
                                             nlay, dtype)
    return prof, scal, kinds_all[0]
