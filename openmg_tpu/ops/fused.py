"""Multi-stage fused Pallas smoother kernels (T3/T4 deep-fusion tier).

The per-half-sweep kernels in :mod:`openmg_tpu.ops.kernels` stream
``x``/``b`` through HBM once per half-sweep — 3 array passes per sweep.
Smoothing is stationary relaxation, so S consecutive half-sweeps can run
inside ONE kernel if each z-slab is extended by an S-deep halo: a point at
distance d from the slab can be updated validly for the first S−d sweeps,
which is exactly enough for the central slab to be correct after all S.
HBM traffic drops from ``3·S`` array passes to ``2 + (4S−2)/tz`` (x in,
b in, x out, plus halo re-reads), at the cost of redundantly re-smoothing
the halo planes (VPU work, which the bandwidth-bound sweeps have to spare).

Two entry points sit on top of the generic engine:

* :func:`smooth_fused` — S half-sweeps on an existing iterate (post-
  smoothing, and the benchmark's multi-sweep Jacobi path), chunked to the
  deepest fusion that fits VMEM.
* :func:`presmooth_residual_fused` — the V-cycle's pre-smoothing **from a
  zero initial guess** (every level of the defect-correction cycle starts
  from zero — core/cycle.py) fused with the level residual
  ``r = b − A x``:  the kernel reads ONLY ``b`` and writes ``(x, r)``,
  replacing pre·(3 passes) + residual·(3 passes) with ~2–3 passes total.

Halo mechanics follow ops/kernels.py: the grid is 1-D over z-slabs; the
same array is passed once as the aligned ``(tz, ny, nx)`` tile plus ``2·D``
single *planes* (block size 1 along z makes the block index an element
index, so index maps can address ``i·tz − j`` directly, clamped at the
domain edge and zero-masked in-kernel).  Out-of-domain planes are kept
exactly zero after every stage, which implements the Dirichlet truncation
along z with no per-offset edge masks; y/x edges use the roll+iota masks.

Correctness is pinned against the jnp smoothers in interpreter mode
(tests/test_fused.py) and the compiled path runs in scripts/tpu_smoke.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "stages_for",
    "fused_stages_const_3d",
    "smooth_fused",
    "presmooth_residual_fused",
    "presmooth_restrict_fused",
    "prolong_smooth_fused",
    "residual_restrict_fused",
    "plan_presmooth_restrict",
    "plan_prolong_smooth",
    "plan_residual_restrict",
]

# Mosaic scoped-VMEM cap for the fused kernels.  The default 16 MB rejects
# deep fusions whose stage intermediates spill past the in/out blocks; the
# v5e accepts 64 MB (verified on-chip: compiles and runs correctly — the
# physical VMEM is larger than the guide's conservative 16 MB figure).
_VMEM_LIMIT = 64 * 1024 * 1024
# Total-VMEM budget for the tz fit model below (the v5e has 128 MB; the
# margin absorbs model error plus XLA-side extras).  The model charges
# double-buffered in/out windows PLUS ~0.9 live E-plane slabs per stencil
# offset — the same empirical per-offset coefficient as ops/kernels.py,
# recalibrated against an on-chip OOM of a K=27 cornered level at 128³
# (depth 5, tz 64: predicted 125 MB scoped vs 114 MB actual, where the
# K-blind model said 44 MB and the chip ran out of VMEM at 139.5/128 MB).
_TOTAL_BUDGET = 100 * 1024 * 1024
# Deepest fusion per kernel: compile time and redundant halo compute grow
# with depth; ≥6-stage chunks measured diminishing returns at 256³.
MAX_CHUNK = 6


def stages_for(name: str, iterations: int, omega: float):
    """Half-sweep stage list for a smoother, or None if not stage-fusable."""
    if name == "jacobi":
        return (("jacobi", float(omega)),) * iterations
    if name == "rbgs":
        return (("rb", 0), ("rb", 1)) * iterations
    return None


def _fit_tz(
    shape, depth: int, has_x: bool, n_out: int, min_tz: int = 1, k: int = 7,
    fudge: float = 1.0,
):
    """Largest power-of-two slab height whose estimated total-VMEM usage
    fits the calibrated budget, or None.

    Usage model (empirical, see _TOTAL_BUDGET): double-buffered in/out
    windows — each streamed input as an E=(tz+2·depth)-plane window, the
    n_out outputs as tz planes — plus ~0.9 live E-plane slabs per stencil
    offset for the stage loop's shifted-term intermediates (``k`` = offset
    count; 27-point Galerkin levels need ~4× the VMEM of 7-point ones).

    ``min_tz``: cornered kernels require ``tz ≥ depth + 1`` so global row
    z = 0 appears only in tile 0's extended slab (at static local index
    ``depth``) — the z-region fix-ups rely on that."""
    nz, ny, nx = shape
    # lane dim: multiples of 128, or a full-extent 32/64-lane block (every
    # BlockSpec here spans the whole lane dim — Mosaic's full-extent rule,
    # the same one the nx=128 levels' coarse-output blocks rely on); this
    # admits the 64³/32³ levels to the fused tier
    if nz < 2 or ny < 2 or not (nx % 128 == 0 or nx in (32, 64)):
        return None
    plane = ny * nx * 4

    def fits(tz):
        E = tz + 2 * depth
        windows = 2 * (E * (2 if has_x else 1) + tz * n_out) * plane
        scoped = int(0.9 * k * E * plane)
        # Mosaic separately enforces its scoped-stack cap (_VMEM_LIMIT);
        # the margin absorbs the model's ±10% calibration error (measured
        # 71.3 MB actual vs 79 MB predicted at K=27, tz=32, 64 KB planes).
        # The windows term is deliberately NOT charged against the scoped
        # cap: Mosaic's scoped accounting excludes the pipelined block
        # windows — verified on-chip, the admitted 256³ cornered config
        # (K=27, 64 KB planes) has windows+scoped well above 64 MB yet
        # compiles and runs (scripts/tpu_smoke.py pins this config).
        # ``fudge`` scales the estimate for configurations the base model
        # under-counts: every has_x + in-kernel-transfer variant (second
        # window set + tap-matrix matmuls).  Measured twice: the staged
        # has_x+restrict (FMG fine-level) at 134.27 MB actual vs 88 MB
        # predicted (256³/depth-6/tz=16, 1.53×), and the has_x+ec
        # prolong+1-sweep at 77.57 MB actual vs 50.4 MB predicted
        # (512³/depth-2/tz=4, 1.54× — on-chip OOM r5).  When the fudge
        # is calibrated (≠1), the model error lives IN the fudge, so the
        # raw-cap margin is dropped — the r4-proven 256³ prolong config
        # (58.2 MB actual at the 64 MB cap) stays admitted.
        # the fudge models the SCOPED intermediates only — the window
        # term is the exact double-buffered block footprint and is never
        # scaled (scaling it rejected the admissible 512³ depth-2
        # partial kernels by 2% while the real constraint is scoped)
        margin = 8 * 1024 * 1024 if fudge == 1.0 else 0
        return (
            fudge * scoped <= _VMEM_LIMIT - margin
            and windows + fudge * scoped <= _TOTAL_BUDGET
        )

    if not fits(1):
        return None
    tz = 1
    while tz * 2 <= nz and nz % (tz * 2) == 0 and fits(tz * 2):
        tz *= 2
    if tz < min_tz or tz > nz or nz % tz:
        return None
    return tz


def _stencil_ok(op, b) -> bool:
    from openmg_tpu.ops.stencil import CorneredOperator

    return (
        (op.is_constant or isinstance(op, CorneredOperator))
        and b.dtype == jnp.float32
        and len(b.shape) == 3
        and all(abs(o) <= 1 for off in op.offsets for o in off)
    )


def _corner_info(op):
    """(regions, (n_regions, K) tap table) for a cornered operator, else
    None — the static/traced payload the fused kernels consume."""
    from openmg_tpu.ops.stencil import CorneredOperator, region_table

    if isinstance(op, CorneredOperator):
        return tuple(tuple(R) for R in op.regions), region_table(op)
    return None


def _shift_ext(w, off, ny, nx):
    """``shift(w, off)`` on a z-extended slab: zeros flow in past the slab
    ends along z (out-of-domain planes are already zero, so no z masks are
    needed); y/x edges are Dirichlet-masked via roll + iota."""
    oz, oy, ox = off
    if oz != 0:
        zp = jnp.zeros_like(w[:1])
        if oz == 1:
            w = jnp.concatenate([w[1:], zp], axis=0)
        else:
            w = jnp.concatenate([zp, w[:-1]], axis=0)
    if oy != 0:
        w = jnp.roll(w, -oy, axis=1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
        m = (iy < ny - 1) if oy == 1 else (iy > 0)
        w = w * m.astype(w.dtype)
    if ox != 0:
        w = jnp.roll(w, -ox, axis=2)
        ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)
        m = (ix < nx - 1) if ox == 1 else (ix > 0)
        w = w * m.astype(w.dtype)
    return w


def _apply_ext(vals_ref, offsets, w, ny, nx, skip_diag: bool):
    di = offsets.index((0, 0, 0))
    acc = None
    for k, off in enumerate(offsets):
        if skip_diag and k == di:
            continue
        term = w if off == (0, 0, 0) else _shift_ext(w, off, ny, nx)
        term = vals_ref[0, k] * term
        acc = term if acc is None else acc + term
    return acc


# ---------------------------------------------------------------------------
# in-kernel cornered-operator region fix-ups (CorneredOperator semantics —
# see ops/stencil.py): after every constant-tap stage, the face/edge/corner
# rows are overwritten with their exact-tap update, pass per region in
# ascending |S| order.  All corrected taps are scalars from the SMEM region
# table, so the corrections cost only small-plane VPU work — no extra HBM
# streams.  The z-containing regions rely on global row 0 appearing ONLY in
# tile 0's extended slab (guaranteed by tz ≥ depth + 1, enforced in the fit
# checks) at static local index ``depth``; their selects mask on gp == 0,
# which is identically false elsewhere.
# ---------------------------------------------------------------------------


def _region_term(W, off, R, depth, ny, nx):
    """``shift(W, off)`` restricted to the region rows of ``R`` (axes in R
    extracted at static index ``off[b]``, remaining axes shifted with the
    usual Dirichlet masks / zero-inflow-z semantics)."""
    sub = W
    if 0 in R:
        z = depth + off[0]
        sub = sub[z:z + 1]
    if 1 in R:
        sub = sub[:, off[1]:off[1] + 1, :]
    if 2 in R:
        sub = sub[:, :, off[2]:off[2] + 1]
    oz, oy, ox = off
    if 0 not in R and oz != 0:
        zp = jnp.zeros_like(sub[:1])
        if oz == 1:
            sub = jnp.concatenate([sub[1:], zp], axis=0)
        else:
            sub = jnp.concatenate([zp, sub[:-1]], axis=0)
    if 1 not in R and oy != 0:
        sub = jnp.roll(sub, -oy, axis=1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
        m = (iy < ny - 1) if oy == 1 else (iy > 0)
        sub = sub * m.astype(sub.dtype)
    if 2 not in R and ox != 0:
        sub = jnp.roll(sub, -ox, axis=2)
        ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)
        m = (ix < nx - 1) if ox == 1 else (ix > 0)
        sub = sub * m.astype(sub.dtype)
    return sub


def _region_extract(W, R, depth):
    out = W
    if 0 in R:
        out = out[depth:depth + 1]
    if 1 in R:
        out = out[:, 0:1, :]
    if 2 in R:
        out = out[:, :, 0:1]
    return out


def _region_acc(tbl_ref, r, R, offsets, W, depth, ny, nx, skip_diag):
    di = offsets.index((0, 0, 0))
    acc = None
    for k, off in enumerate(offsets):
        if skip_diag and k == di:
            continue
        if any(off[b] < 0 for b in R):
            continue  # neighbor at i_b = −1 is outside the domain
        term = tbl_ref[r, k] * _region_term(W, off, R, depth, ny, nx)
        acc = term if acc is None else acc + term
    return acc


def _region_sel(R, gp, iy, ix, open_lo=None):
    """Region-row mask.  Cornered deviations live only at index-0 rows
    (the Z(i) = {b : i_b = 0} structure — ops/stencil.py), so on a
    row-partitioned block the axis-0 regions exist only on the FIRST
    device: ``open_lo`` (the device-has-a-lower-neighbor flag) suppresses
    them everywhere else; y/x regions are position-local and apply on
    every device."""
    z_mask = gp == 0
    if open_lo is not None:
        z_mask = jnp.logical_and(z_mask, open_lo < 0.5)
    sel = None
    for b, m in ((0, z_mask), (1, iy == 0), (2, ix == 0)):
        if b in R:
            sel = m if sel is None else jnp.logical_and(sel, m)
    return sel


def _widen_yx(v, ny, nx):
    """Pre-broadcast a doubly-singleton (E, 1, 1) region row to (E, 1, nx)
    before handing it to an op whose output is (E, ny, nx): Mosaic has no
    combined sublane+lane broadcast ("Broadcast in both sublanes and
    lanes" compile error on the real chip), so the lane dim is widened
    here with an explicit multiply (robust against MLIR's
    broadcast-of-broadcast folding), leaving only the sublane dim for the
    consumer's implicit broadcast."""
    if v.shape[1] == 1 and ny != 1 and v.shape[2] == 1 and nx != 1:
        ones = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2) >= 0
        v = v * ones.astype(v.dtype)
    return v


def _corner_fix_stage(
    tbl_ref, regions, offsets, X_old, X_new, B, kind, p,
    depth, ny, nx, gp, iy, ix, open_lo=None,
):
    """Overwrite region rows of the post-stage ``X_new`` with exact-tap
    updates computed from the pre-stage ``X_old``."""
    di = offsets.index((0, 0, 0))
    for r, R in enumerate(regions):
        diag = tbl_ref[r, di]
        B_R = _region_extract(B, R, depth)
        Xo_R = _region_extract(X_old, R, depth)
        if kind == "jacobi":
            acc = _region_acc(
                tbl_ref, r, R, offsets, X_old, depth, ny, nx, False
            )
            om = jnp.asarray(p, dtype=X_old.dtype)
            upd = Xo_R + om * (B_R - acc) / diag
        else:  # ("rb", color)
            acc = _region_acc(
                tbl_ref, r, R, offsets, X_old, depth, ny, nx, True
            )
            xn = (B_R - acc) / diag
            par = jnp.zeros((), jnp.int32)
            if 0 not in R:
                par = par + gp
            if 1 not in R:
                par = par + iy
            if 2 not in R:
                par = par + ix
            upd = jnp.where((par & 1) == p, xn, Xo_R)
        upd = _widen_yx(upd, ny, nx)
        X_new = jnp.where(_region_sel(R, gp, iy, ix, open_lo), upd, X_new)
    return X_new


def _corner_fix_residual(
    tbl_ref, regions, offsets, X, r_out, B, depth, ny, nx, gp, iy, ix,
    open_lo=None,
):
    for r, R in enumerate(regions):
        acc = _region_acc(tbl_ref, r, R, offsets, X, depth, ny, nx, False)
        r_R = _region_extract(B, R, depth) - acc
        r_R = _widen_yx(r_R, ny, nx)
        r_out = jnp.where(_region_sel(R, gp, iy, ix, open_lo), r_R, r_out)
    return r_out


# ---------------------------------------------------------------------------
# in-kernel grid transfers.  Fusing restriction into the pre-smooth+residual
# kernel (emit the coarse rhs ``bc = R r`` instead of the full-size residual)
# and prolongation+add into the post-smooth kernel (consume the coarse
# correction ``ec`` instead of a materialized ``P ec``) removes two full
# fine-grid HBM round-trips per level per cycle.  The z axis (untiled
# leading dim) uses slice/reshape decimation/interleave; the y/x axes
# (sublane/lane dims, where strided slicing forces Mosaic relayouts) use
# the same small per-axis transfer matrices as ops/transfer.py's MXU path,
# passed as whole-array VMEM operands and contracted with dot_general —
# both dots contract dimension 1, which lands the output axes in the right
# order with no explicit transposes.
# ---------------------------------------------------------------------------


_DOT = dict(
    precision=jax.lax.Precision.HIGHEST,
    preferred_element_type=jnp.float32,
)


def _restrict_in_kernel(r, r_taps, My, Mx, depth, tz):
    """``R r`` for the central coarse rows of the slab: ``r`` is the
    (E, ny, nx) extended residual (valid to distance ≥ 1, out-of-domain
    rows zeroed); returns ``(tz/2, ny/2, nx/2)``."""
    tzc = tz // 2
    rp = r[depth - 1: depth + tz + 1]  # fine local rows 2I+t, t ∈ {−1,0,1}
    acc = None
    for t, w in r_taps:
        seg = rp[t + 1: t + 1 + tz]
        seg = seg.reshape(tzc, 2, seg.shape[1], seg.shape[2])[:, 0]
        term = jnp.float32(w) * seg
        acc = term if acc is None else acc + term
    out = jax.lax.dot_general(acc, My, (((1,), (0,)), ((), ())), **_DOT)
    return jax.lax.dot_general(out, Mx, (((1,), (0,)), ((), ())), **_DOT)


def _prolong_in_kernel(ec_ext, p_taps, Py, Px):
    """``P ec`` over the full extended fine slab: ``ec_ext`` is the
    (E/2 + 1, nyc, nxc) coarse window (out-of-domain rows zeroed); returns
    (E, ny, nx)."""
    e2 = ec_ext.shape[0] - 1
    parts = []
    for pm in (0, 1):
        part = None
        for t, w in p_taps:
            if (t - pm) % 2:
                continue
            s = (t - pm) // 2  # fine row 2C+pm reads ec[C − s]; s ∈ {−1, 0}
            seg = ec_ext[-s: -s + e2] if s < 0 else ec_ext[:e2]
            term = jnp.float32(w) * seg
            part = term if part is None else part + term
        parts.append(part)
    pz = jnp.stack(parts, axis=1).reshape(2 * e2, *ec_ext.shape[1:])
    out = jax.lax.dot_general(pz, Py, (((1,), (1,)), ((), ())), **_DOT)
    return jax.lax.dot_general(out, Px, (((1,), (1,)), ((), ())), **_DOT)


def _fused_kernel(
    vals_ref, *refs, offsets, stages, emit_residual, has_x,
    tz, depth, ny, nx, nz, regions, restrict_taps=None, prolong_taps=None,
    halo=False, emit_x=True,
):
    i = pl.program_id(0)
    E = tz + 2 * depth
    nb = 1 + 2 * depth

    if regions:
        tbl_ref, refs = refs[0], refs[1:]
    else:
        tbl_ref = None
    if restrict_taps is not None:
        (My_ref, Mx_ref), refs = refs[:2], refs[2:]
    if prolong_taps is not None:
        (Py_ref, Px_ref), refs = refs[:2], refs[2:]

    def ext(rs):
        # rs: [tile, lo_D..lo_1, hi_1..hi_D] → (E, ny, nx)
        parts = [rs[1 + k][...] for k in range(depth)]
        parts.append(rs[0][...])
        parts.extend(rs[1 + depth + k][...] for k in range(depth))
        return jnp.concatenate(parts, axis=0)

    n_in = nb * (2 if has_x else 1)
    n_ec = (2 * (depth // 2) + 2) if prolong_taps is not None else 0

    # Device-halo mode (row-partitioned blocks — parallel/fast.py): the
    # trailing inputs are [open_flags(SMEM), Bh_lo, Bh_hi, (Xh_lo, Xh_hi),
    # (Eh_lo, Eh_hi)] — depth-deep received slabs substituted at the
    # block's z edges, with the valid-z range widened by `depth·open` so
    # halo rows evolve through the stage cascade exactly like the
    # neighbor device computes them, while true domain edges (open = 0,
    # zero slabs) keep the Dirichlet truncation.  tz ≥ depth (enforced by
    # the caller) guarantees only the first/last tile sees out-of-block
    # rows, so the constant-position halo slabs align with the window.
    if halo:
        nh = 3 + (2 if has_x else 0) + (2 if prolong_taps is not None else 0)
        hrefs = refs[n_in + n_ec: n_in + n_ec + nh]
        refs = refs[: n_in + n_ec] + refs[n_in + n_ec + nh:]
        open_ref, hrefs = hrefs[0], hrefs[1:]
        bh_lo, bh_hi = hrefs[0], hrefs[1]
        hrefs = hrefs[2:]
        if has_x:
            xh_lo, xh_hi = hrefs[0], hrefs[1]
            hrefs = hrefs[2:]
        if prolong_taps is not None:
            eh_lo, eh_hi = hrefs[0], hrefs[1]
        open_lo = open_ref[0, 0]
        open_hi = open_ref[0, 1]
    else:
        open_lo = open_hi = None

    gp = jax.lax.broadcasted_iota(jnp.int32, (E, 1, 1), 0) + (i * tz - depth)
    inb = jnp.logical_and(gp >= 0, gp < nz).astype(jnp.float32)
    if halo:
        gpf = gp.astype(jnp.float32)
        zvalid = jnp.logical_and(
            gpf >= -depth * open_lo, gpf < nz + depth * open_hi
        ).astype(jnp.float32)
        m_lo = (gp < 0).astype(jnp.float32)
        m_hi = (gp >= nz).astype(jnp.float32)

        def with_halo(W, lo_ref, hi_ref):
            pad = jnp.zeros((E - depth, ny, nx), W.dtype)
            H_lo = jnp.concatenate([lo_ref[...], pad], axis=0)
            H_hi = jnp.concatenate([pad, hi_ref[...]], axis=0)
            return (W * inb + m_lo * H_lo + m_hi * H_hi) * zvalid

        B = with_halo(ext(refs[:nb]), bh_lo, bh_hi)
        if has_x:
            X = with_halo(ext(refs[nb: 2 * nb]), xh_lo, xh_hi)
        else:
            X = jnp.zeros((E, ny, nx), B.dtype)
    else:
        zvalid = inb
        B = ext(refs[:nb]) * zvalid
        if has_x:
            X = ext(refs[nb: 2 * nb]) * zvalid
        else:
            X = jnp.zeros((E, ny, nx), B.dtype)

    if prolong_taps is not None:
        # coarse-correction window: tile (tzc) + dc low + dc+1 high planes
        dc = depth // 2
        tzc = tz // 2
        nbc = 2 * dc + 2
        ec_refs, refs = refs[n_in: n_in + nbc], refs[:n_in] + refs[n_in + nbc:]
        parts = [ec_refs[1 + k][...] for k in range(dc)]
        parts.append(ec_refs[0][...])
        parts.extend(ec_refs[1 + dc + k][...] for k in range(dc + 1))
        ec_ext = jnp.concatenate(parts, axis=0)  # (E/2 + 1, nyc, nxc)
        Ec = ec_ext.shape[0]
        nzc = (nz + 1) // 2
        gpc = jax.lax.broadcasted_iota(
            jnp.int32, (Ec, 1, 1), 0
        ) + (i * tzc - dc)
        inbc = jnp.logical_and(gpc >= 0, gpc < nzc).astype(ec_ext.dtype)
        if halo:
            gpcf = gpc.astype(jnp.float32)
            cvalid = jnp.logical_and(
                gpcf >= -dc * open_lo, gpcf < nzc + (dc + 1) * open_hi
            ).astype(ec_ext.dtype)
            nyc, nxc = ec_ext.shape[1], ec_ext.shape[2]
            pad_lo = jnp.zeros((Ec - dc, nyc, nxc), ec_ext.dtype)
            pad_hi = jnp.zeros((dc + tzc, nyc, nxc), ec_ext.dtype)
            H_ec_lo = jnp.concatenate([eh_lo[...], pad_lo], axis=0)
            H_ec_hi = jnp.concatenate([pad_hi, eh_hi[...]], axis=0)
            mc_lo = (gpc < 0).astype(ec_ext.dtype)
            mc_hi = (gpc >= nzc).astype(ec_ext.dtype)
            ec_ext = (
                ec_ext * inbc + mc_lo * H_ec_lo + mc_hi * H_ec_hi
            ) * cvalid
        else:
            ec_ext = ec_ext * inbc
        X = (X + _prolong_in_kernel(ec_ext, prolong_taps, Py_ref[...],
                                    Px_ref[...])) * zvalid

    out_refs = refs[n_in:]

    di = offsets.index((0, 0, 0))
    inv_d = 1.0 / vals_ref[0, di]
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)

    for kind, p in stages:
        if kind == "jacobi":
            acc = _apply_ext(vals_ref, offsets, X, ny, nx, skip_diag=False)
            om = jnp.asarray(p, dtype=X.dtype)
            Xn = X + om * (inv_d * (B - acc))
        else:  # ("rb", color)
            acc = _apply_ext(vals_ref, offsets, X, ny, nx, skip_diag=True)
            xn = inv_d * (B - acc)
            par = (gp + iy + ix) & 1
            Xn = jnp.where(par == p, xn, X)
        if regions:
            Xn = _corner_fix_stage(
                tbl_ref, regions, offsets, X, Xn, B, kind, p,
                depth, ny, nx, gp, iy, ix, open_lo,
            )
        X = Xn * zvalid

    r_out = 0
    if emit_x:
        out_refs[0][...] = X[depth: depth + tz]
        r_out = 1
    if emit_residual:
        r = B - _apply_ext(vals_ref, offsets, X, ny, nx, skip_diag=False)
        if regions:
            r = _corner_fix_residual(
                tbl_ref, regions, offsets, X, r, B, depth, ny, nx, gp, iy,
                ix, open_lo,
            )
        if restrict_taps is not None:
            bc = _restrict_in_kernel(
                r * zvalid, restrict_taps, My_ref[...], Mx_ref[...],
                depth, tz,
            )
            out_refs[r_out][...] = bc
        else:
            out_refs[r_out][...] = r[depth: depth + tz]


def fused_stages_const_3d(
    values, offsets, b, x, stages, emit_residual: bool = False, tz=None,
    corner=None, restrict_transfer=None, ec=None, prolong_transfer=None,
    halos=None, emit_x: bool = True,
):
    """Run ``stages`` half-sweeps (and optionally the final residual) for a
    constant 3D stencil in one Pallas pass.  ``x=None`` means a zero
    initial guess (the array is never read).  Returns ``x_out`` or
    ``(x_out, r)``.  Caller must have checked :func:`_fit_tz`; ``tz``
    overrides the slab height (benchmark tuning).

    ``corner``: optional ``(regions, (n_regions, K) tap table)`` payload of
    a :class:`~openmg_tpu.ops.stencil.CorneredOperator` — enables the
    in-kernel exact face/edge/corner fix-ups after every stage (and on the
    emitted residual).

    ``restrict_transfer`` (with ``emit_residual``): emit the restricted
    coarse rhs ``bc = R r`` (shape halved per dim) instead of the fine
    residual.  ``ec`` + ``prolong_transfer``: start from
    ``x + P ec`` (coarse-correction prolongation fused in).  Both require
    even grid dims; depth is padded to even when ``ec`` is present so the
    coarse window stays parity-aligned.

    ``halos`` (row-partitioned local blocks — parallel/fast.py): a tuple
    ``(open_flags, (b_lo, b_hi), x_pair_or_None, ec_pair_or_None)`` of
    received depth-deep halo slabs (``halo_slabs``) consumed in-kernel at
    the block's z edges.  Works with ``corner`` too: cornered deviations
    live only at index-0 rows, so the axis-0 region fix-ups are gated to
    the first device via the open_lo flag (y/x regions are
    position-local and run everywhere)."""
    offsets = tuple(tuple(o) for o in offsets)
    stages = tuple((str(k), (float(p) if k == "jacobi" else int(p)))
                   for k, p in stages)
    nz, ny, nx = b.shape
    has_x = x is not None
    depth = len(stages) + (2 if restrict_transfer is not None
                           else 1 if emit_residual else 0)
    if ec is not None and depth % 2:
        depth += 1
    if not emit_x and not (emit_residual and not stages):
        raise ValueError("emit_x=False only applies to stage-free "
                         "residual(+restrict) kernels")
    n_out = (1 if emit_x else 0) + (1 if emit_residual else 0)
    regions = tuple(tuple(R) for R in corner[0]) if corner else ()
    min_tz = depth + 1 if regions else 1
    if restrict_transfer is not None or ec is not None:
        min_tz = max(min_tz, 2)
    if halos is not None:
        # only the first/last tile may see out-of-block rows, so the
        # constant-position halo slabs align with the extended window
        min_tz = max(min_tz, depth)
        if ec is not None:
            min_tz = max(min_tz, 2 * (depth // 2 + 1))
    if tz is None:
        tz = _fit_tz(
            b.shape, depth, has_x, n_out, min_tz=min_tz, k=len(offsets),
            # 1.55: measured shortfall of the base model on every
            # has_x + in-kernel-transfer variant (see _fit_tz)
            fudge=(
                1.55
                if has_x
                and (restrict_transfer is not None or ec is not None)
                else 1.0
            ),
        )
    if tz is None:
        raise ValueError("fused stages do not fit VMEM for this shape")
    gz = nz // tz

    tile = pl.BlockSpec(
        (tz, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    def lo_spec(j):
        return pl.BlockSpec(
            (1, ny, nx),
            lambda i, j=j: (jnp.maximum(i * tz - j, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def hi_spec(j):
        return pl.BlockSpec(
            (1, ny, nx),
            lambda i, j=j: (jnp.minimum(i * tz + tz - 1 + j, nz - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def specs_for_array():
        # order must match _fused_kernel.ext: tile, lo_D..lo_1, hi_1..hi_D
        return (
            [tile]
            + [lo_spec(j) for j in range(depth, 0, -1)]
            + [hi_spec(j) for j in range(1, depth + 1)]
        )

    def whole(a):
        return pl.BlockSpec(
            tuple(a.shape), lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
        )

    in_specs = [
        pl.BlockSpec(
            (1, len(offsets)), lambda i: (0, 0), memory_space=pltpu.SMEM
        )
    ]
    operands = [values.reshape(1, -1)]
    if regions:
        tbl = corner[1]
        in_specs.append(
            pl.BlockSpec(
                tuple(tbl.shape), lambda i: (0, 0), memory_space=pltpu.SMEM
            )
        )
        operands.append(tbl)

    from openmg_tpu.ops.transfer import _axis_matrix

    restrict_taps = None
    if restrict_transfer is not None:
        restrict_taps = tuple(restrict_transfer.r_taps)
        My = jnp.asarray(_axis_matrix(ny, restrict_taps, "float32"))
        Mx = jnp.asarray(_axis_matrix(nx, restrict_taps, "float32"))
        in_specs += [whole(My), whole(Mx)]
        operands += [My, Mx]
    prolong_taps = None
    if ec is not None:
        prolong_taps = tuple(prolong_transfer.p_taps)
        Py = jnp.asarray(_axis_matrix(ny, prolong_taps, "float32"))
        Px = jnp.asarray(_axis_matrix(nx, prolong_taps, "float32"))
        in_specs += [whole(Py), whole(Px)]
        operands += [Py, Px]

    in_specs += specs_for_array()
    operands += [b] * (1 + 2 * depth)
    if has_x:
        in_specs += specs_for_array()
        operands += [x] * (1 + 2 * depth)
    if ec is not None:
        # coarse-correction window: tile + dc low planes + dc+1 high planes
        dc = depth // 2
        tzc = tz // 2
        nzc, nyc, nxc = ec.shape
        ec_tile = pl.BlockSpec(
            (tzc, nyc, nxc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

        def ec_lo(j):
            return pl.BlockSpec(
                (1, nyc, nxc),
                lambda i, j=j: (jnp.maximum(i * tzc - j, 0), 0, 0),
                memory_space=pltpu.VMEM,
            )

        def ec_hi(j):
            return pl.BlockSpec(
                (1, nyc, nxc),
                lambda i, j=j: (
                    jnp.minimum(i * tzc + tzc - 1 + j, nzc - 1), 0, 0
                ),
                memory_space=pltpu.VMEM,
            )

        in_specs += (
            [ec_tile]
            + [ec_lo(j) for j in range(dc, 0, -1)]
            + [ec_hi(j) for j in range(1, dc + 2)]
        )
        operands += [ec] * (2 * dc + 2)

    if halos is not None:
        open_fl, b_pair, x_pair, ec_pair = halos
        if int(b_pair[0].shape[0]) != depth:
            raise ValueError(
                f"b halo slabs must be depth={depth} planes, got "
                f"{b_pair[0].shape[0]} (use plan_* to size the exchange)"
            )
        if ec is not None and (
            int(ec_pair[0].shape[0]) != depth // 2
            or int(ec_pair[1].shape[0]) != depth // 2 + 1
        ):
            raise ValueError("ec halo slabs must be (depth//2, depth//2+1)")
        in_specs.append(
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        operands.append(open_fl)

        def slab_spec(a):
            return pl.BlockSpec(
                tuple(a.shape), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            )

        for pair, needed in ((b_pair, True), (x_pair, has_x),
                             (ec_pair, ec is not None)):
            if needed:
                if pair is None:
                    raise ValueError("missing halo slabs for an input")
                in_specs += [slab_spec(pair[0]), slab_spec(pair[1])]
                operands += [pair[0], pair[1]]

    if restrict_transfer is not None:
        bc_spec = pl.BlockSpec(
            (tz // 2, ny // 2, nx // 2),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        bc_struct = jax.ShapeDtypeStruct(
            (nz // 2, ny // 2, nx // 2), b.dtype
        )
        if emit_x:
            out_specs = (tile, bc_spec)
            out_shape = (jax.ShapeDtypeStruct(b.shape, b.dtype), bc_struct)
        else:
            out_specs = (bc_spec,)
            out_shape = (bc_struct,)
    else:
        out_specs = (tile,) * n_out
        out_shape = (jax.ShapeDtypeStruct(b.shape, b.dtype),) * n_out

    kern = functools.partial(
        _fused_kernel,
        offsets=offsets,
        stages=stages,
        emit_residual=emit_residual,
        has_x=has_x,
        tz=tz,
        depth=depth,
        ny=ny,
        nx=nx,
        nz=nz,
        regions=regions,
        restrict_taps=restrict_taps,
        prolong_taps=prolong_taps,
        halo=halos is not None,
        emit_x=emit_x,
    )
    interpret = jax.default_backend() != "tpu"
    extra = (
        {}
        if interpret
        else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            )
        }
    )
    out = pl.pallas_call(
        kern,
        grid=(gz,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **extra,
    )(*operands)
    if not emit_x:
        return out[0]
    return out if emit_residual else out[0]


def _fused2d(name, op, b, x, iterations: int, omega: float,
             emit_residual: bool, restrict_transfer=None, ec=None,
             prolong_transfer=None):
    """Whole-plane 2D stage fusion (kernels.fused_stages_2d): ALL stages
    (+ optional residual, in-kernel restriction, fused prolongation) in
    ONE launch — the ≤1024² tier's answer to the per-kernel launch floor
    (VERDICT r4 task 6).  Exact on cornered operators via the O(K) delta
    algebra.  Returns the kernel result or None when not applicable."""
    from openmg_tpu.ops import kernels
    from openmg_tpu.ops.stencil import CorneredOperator

    stages = stages_for(name, iterations, omega)
    if stages is None or not stages:
        return None
    if b.ndim != 2 or b.dtype != jnp.float32:
        return None
    corner = isinstance(op, CorneredOperator)
    if not (op.is_constant or corner):
        return None
    if any(abs(o) > 1 for off in op.offsets for o in off):
        return None
    if not kernels.supports_fused2d(op.offsets, b.shape):
        return None
    for tr in (restrict_transfer, prolong_transfer):
        if tr is not None:
            ny, nx = b.shape
            if (
                ny % 2
                or nx % 2
                or any(abs(t) > 1 for t, _ in tr.r_taps)
                or any(abs(t) > 1 for t, _ in tr.p_taps)
            ):
                return None
    return kernels.fused_stages_2d(
        op.values, op.offsets, b, x, stages,
        deltas=op.deltas if corner else None,
        subsets=op.subsets if corner else None,
        emit_residual=emit_residual,
        restrict_transfer=restrict_transfer,
        ec=ec,
        prolong_transfer=prolong_transfer,
    )


def smooth_fused(name, op, b, x, iterations: int, omega: float):
    """S half-sweeps on an existing iterate, fused in the deepest VMEM-
    fitting chunks.  Returns the smoothed ``x`` or None when the fused path
    does not apply (wrong smoother/stencil/shape, or only depth-1 chunks
    would fit — the per-half-sweep kernels are better there)."""
    if b.ndim == 2:
        return _fused2d(name, op, b, x, iterations, omega, False)
    stages = stages_for(name, iterations, omega)
    if stages is None or len(stages) < 2 or not _stencil_ok(op, b):
        return None
    corner = _corner_info(op)
    min_tz_for = (lambda c: c + 1) if corner else (lambda c: 1)
    remaining = list(stages)
    max_chunk = 0
    for c in range(min(len(stages), MAX_CHUNK), 1, -1):
        if _fit_tz(
            b.shape, c, True, 1, min_tz=min_tz_for(c), k=len(op.offsets)
        ) is not None:
            max_chunk = c
            break
    if max_chunk < 2:
        return None
    while remaining:
        c = min(max_chunk, len(remaining))
        chunk, remaining = remaining[:c], remaining[c:]
        x = fused_stages_const_3d(
            op.values, op.offsets, b, x, chunk, corner=corner
        )
    return x


def presmooth_residual_fused(name, op, b, iterations: int, omega: float):
    """Zero-initial-guess pre-smoothing fused with the level residual:
    returns ``(x, r)`` reading only ``b``, or None when unsupported."""
    if b.ndim == 2:
        return _fused2d(name, op, b, None, iterations, omega, True)
    stages = stages_for(name, iterations, omega)
    if stages is None or not stages or not _stencil_ok(op, b):
        return None
    corner = _corner_info(op)
    depth = len(stages) + 1
    min_tz = depth + 1 if corner else 1
    if depth > MAX_CHUNK or _fit_tz(
        b.shape, depth, False, 2, min_tz=min_tz, k=len(op.offsets)
    ) is None:
        return None
    return fused_stages_const_3d(
        op.values, op.offsets, b, None, stages, emit_residual=True,
        corner=corner,
    )


def _transfer_fusable(shape, transfer) -> bool:
    """Can the in-kernel grid transfers run on this level?  Radius-1
    separable taps; every dim coarsenable; the coarse lane dim must be a
    multiple of 128 OR the full (block == array) lane extent — Mosaic's
    block rule — so nx = 128 levels (coarse nx = 64 full-dim blocks)
    fuse too; the coarse sublane dim ≥ 8."""
    nz, ny, nx = shape
    return (
        transfer is not None
        and all(abs(t) <= 1 for t, _ in transfer.r_taps)
        and all(abs(t) <= 1 for t, _ in transfer.p_taps)
        and nz % 2 == 0
        and ny % 2 == 0
        and (nx % 128 == 0 or nx in (32, 64))
        and ny >= 16
        and nz >= 4
    )


def plan_presmooth_restrict(
    name, n_offsets: int, shape, iterations: int, omega: float, transfer,
    has_x: bool = False, halo: bool = False, corner: bool = False,
):
    """Static feasibility check for :func:`presmooth_restrict_fused`:
    returns the halo/window ``depth`` when the fusion applies at
    ``shape``, else None.  The distributed tier calls this BEFORE
    posting the halo exchange (``halo=True`` adds the tz ≥ depth
    alignment constraint; ``corner`` the tz ≥ depth+1 region
    constraint)."""
    stages = stages_for(name, iterations, omega)
    if stages is None or not stages or not _transfer_fusable(shape, transfer):
        return None
    depth = len(stages) + 2
    min_tz = max(2, depth + 1 if corner else 2)
    if halo:
        min_tz = max(min_tz, depth)
    if depth > MAX_CHUNK + 1 or _fit_tz(
        shape, depth, has_x, 2, min_tz=min_tz, k=n_offsets,
        fudge=1.55 if has_x else 1.0,
    ) is None:
        return None
    return depth


def presmooth_restrict_fused(
    name, op, b, x, iterations: int, omega: float, transfer, halos=None
):
    """Pre-smoothing fused with the level residual AND its restriction:
    returns ``(x, bc)`` where ``bc = R (b − A x)`` is the next level's rhs,
    or None when unsupported.  ``x=None`` is the zero-start path (reads
    only ``b``).  Replaces presmooth (3 passes) + residual (3) + restrict
    (~2.6) with one kernel that never materializes the fine residual."""
    if b.ndim == 2 and halos is None:
        return _fused2d(
            name, op, b, x, iterations, omega, True,
            restrict_transfer=transfer,
        )
    stages = stages_for(name, iterations, omega)
    if (
        stages is None
        or not stages
        or not _stencil_ok(op, b)
        or not _transfer_fusable(b.shape, transfer)
    ):
        return None
    corner = _corner_info(op)
    depth = len(stages) + 2
    min_tz = max(2, depth + 1 if corner else 2)
    if halos is not None:
        min_tz = max(min_tz, depth)
    if depth > MAX_CHUNK + 1 or _fit_tz(
        b.shape, depth, x is not None, 2, min_tz=min_tz, k=len(op.offsets),
        fudge=1.55 if x is not None else 1.0,
    ) is None:
        return None
    return fused_stages_const_3d(
        op.values, op.offsets, b, x, stages, emit_residual=True,
        corner=corner, restrict_transfer=transfer, halos=halos,
    )


def plan_residual_restrict(
    n_offsets: int, shape, transfer, halo: bool = False,
    corner: bool = False,
):
    """Static feasibility check for :func:`residual_restrict_fused`
    (depth 2 — the stage-free partial fusion for levels too big for the
    full presmooth+restrict fusion, e.g. 512²-plane local blocks;
    VERDICT r4 task 1).  Returns the depth (2) or None."""
    if not _transfer_fusable(shape, transfer):
        return None
    depth = 2
    min_tz = max(2, depth + 1 if corner else 2)
    if halo:
        min_tz = max(min_tz, depth)
    if _fit_tz(
        shape, depth, True, 1, min_tz=min_tz, k=n_offsets, fudge=1.55
    ) is None:
        return None
    return depth


def residual_restrict_fused(op, b, x, transfer, halos=None):
    """The level residual fused with its restriction, no smoothing
    stages: ``bc = R (b − A x)`` in ONE kernel that never materializes
    the fine residual and never re-writes ``x``.  Returns ``bc`` or None
    when unsupported.  Replaces residual (3 passes) + restrict (~2.6)
    with ~2.1 — the partial deep-fusion tier for levels whose planes are
    too large for the staged fusions (VERDICT r4 task 1)."""
    if not _stencil_ok(op, b) or not _transfer_fusable(b.shape, transfer):
        return None
    corner = _corner_info(op)
    depth = 2
    min_tz = max(2, depth + 1 if corner else 2)
    if halos is not None:
        min_tz = max(min_tz, depth)
    if _fit_tz(
        b.shape, depth, True, 1, min_tz=min_tz, k=len(op.offsets),
        fudge=1.55,
    ) is None:
        return None
    return fused_stages_const_3d(
        op.values, op.offsets, b, x, (), emit_residual=True,
        corner=corner, restrict_transfer=transfer, halos=halos,
        emit_x=False,
    )


def plan_prolong_smooth(
    name, n_offsets: int, shape, iterations: int, omega: float, transfer,
    halo: bool = False, corner: bool = False,
):
    """Static feasibility check for :func:`prolong_smooth_fused`:
    returns the ``depth`` (parity-padded) when the fusion applies, else
    None — the caller sizes the (b, x) halo exchanges at ``depth`` and
    the ec exchange at (depth//2, depth//2+1)."""
    stages = stages_for(name, iterations, omega)
    if stages is None or not stages or not _transfer_fusable(shape, transfer):
        return None
    depth = len(stages)
    depth += depth % 2
    min_tz = max(2, depth + 1 if corner else 2)
    if halo:
        min_tz = max(min_tz, depth, 2 * (depth // 2 + 1))
    if depth > MAX_CHUNK or _fit_tz(
        shape, depth, True, 1, min_tz=min_tz, k=n_offsets, fudge=1.55
    ) is None:
        return None
    return depth


def prolong_smooth_fused(
    name, op, b, x, ec, iterations: int, omega: float, transfer, halos=None
):
    """Coarse-correction prolongation + add fused into post-smoothing:
    returns ``smooth(b, x + P ec)`` without materializing ``P ec``, or
    None when unsupported (the caller then runs prolong + smooth
    separately)."""
    if b.ndim == 2 and halos is None:
        return _fused2d(
            name, op, b, x, iterations, omega, False,
            ec=ec, prolong_transfer=transfer,
        )
    stages = stages_for(name, iterations, omega)
    if (
        stages is None
        or not stages
        or not _stencil_ok(op, b)
        or not _transfer_fusable(b.shape, transfer)
    ):
        return None
    corner = _corner_info(op)
    depth = len(stages)
    depth += depth % 2  # coarse window parity alignment
    min_tz = max(2, depth + 1 if corner else 2)
    if halos is not None:
        min_tz = max(min_tz, depth, 2 * (depth // 2 + 1))
    if depth > MAX_CHUNK or _fit_tz(
        b.shape, depth, True, 1, min_tz=min_tz, k=len(op.offsets),
        fudge=1.55,
    ) is None:
        return None
    return fused_stages_const_3d(
        op.values, op.offsets, b, x, stages,
        corner=corner, ec=ec, prolong_transfer=transfer, halos=halos,
    )
