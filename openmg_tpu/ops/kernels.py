"""Pallas TPU smoother kernels (components T3/T4 — the "native kernel" tier).

Fused weighted-Jacobi and red–black Gauss–Seidel sweeps for 3D
constant-coefficient stencils (the fine-level fast path; see
:mod:`openmg_tpu.ops.stencil`).  Design:

* grid over z-slabs of ``TZ`` planes; y/x stay whole inside a tile
  (ny·nx ≤ 512² planes fit VMEM; bigger 2D grids use the folded-2D
  tier below);
* the same ``x`` array is passed three times with different BlockSpecs —
  the aligned ``(TZ, ny, nx)`` tile plus one neighbor *plane* on each side
  (block size 1 along z makes the block index an element index, so the
  index map can address ``i·TZ − 1`` / ``i·TZ + TZ`` directly).  Pallas
  auto-double-buffers all three streams, so halo traffic costs only
  ``2/TZ`` extra reads and there is no manual DMA/semaphore code;
* in-tile neighbor shifts along y/x are ``jnp.roll`` + iota masks
  (register/VMEM work, no HBM traffic); Dirichlet zero boundaries come
  from masking the first/last plane/row/lane contributions;
* red/black parity is generated from iota plus the tile's global z offset.

Generic in the offset set (any offsets with |o| ≤ 1 per axis, i.e. up to
27-point) and in the tap values (passed through SMEM, so one compiled
kernel serves every constant level of every hierarchy of the same shape).

Correctness: tests/test_kernels.py pins agreement with the jnp smoothers
(which are themselves pinned against scipy/permuted-GS oracles) in
interpreter mode on CPU; scripts/tpu_smoke.py exercises the compiled path
on the real chip.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "supports",
    "supports_fused_update",
    "supports_varying",
    "jacobi_const_3d",
    "rbgs_const_3d",
    "rbgs_half_sweep_const_3d",
    "residual_const_3d",
    "halo_half_sweep_const_3d",
    "halo_half_sweep_vary_3d",
    "jacobi_vary_3d",
    "rbgs_vary_3d",
    "rbgs_half_sweep_vary_3d",
    "residual_vary_3d",
    "df_update_residual_const_3d",
]

_VMEM_BUDGET = 14 * 1024 * 1024  # of 16 MB/core; blocks are double-buffered
# (measured on the v5e chip: tz=8 at 256² planes fits and is ~6% faster
# than the tz=4 a 10 MB budget allowed)
# Mosaic scoped-VMEM cap (the v5e accepts 64 MB — verified on-chip by the
# fused kernels, ops/fused.py); the kernel's live shifted-term slabs scale
# with the offset count K, so wide stencils (27-point faced levels) need
# the K-aware stack model below.
_VMEM_LIMIT = 64 * 1024 * 1024
_LANE = 128
_SCOPED_BUDGET = 52 * 1024 * 1024


def _fits(tz: int, plane: int, k: int) -> bool:
    # empirical stack model: ~0.9 planes of live intermediates per offset
    # per slab plane (calibrated against an on-chip scoped-OOM report:
    # K=27, tz=32, 64 KB planes → 49.9 MB scoped)
    inout = (3 * tz + 2) * plane * 2
    stack = int(0.9 * k * tz * plane)
    return inout <= _VMEM_BUDGET and inout + stack <= _SCOPED_BUDGET


def _pick_tz(shape, k: int = 7) -> int:
    nz, ny, nx = shape
    plane = ny * nx * 4
    tz = 1
    while tz * 2 <= nz and nz % (tz * 2) == 0 and _fits(tz * 2, plane, k):
        tz *= 2
    return tz


def _lift2d(offsets):
    """2D offsets → 3D with a zero leading (z) component: 2D grids run the
    3D kernels on a (1, ny, nx) view (BASELINE config 2, 256² RB-GS)."""
    return tuple((0,) + tuple(o) for o in offsets)


# ---------------------------------------------------------------------------
# folded-2D tier: large 2D grids as z-slabs (un-caps the 512² lift limit)
# ---------------------------------------------------------------------------
#
# A (ny, nx) grid reshapes to (nz', ry, nx) with ny = nz'·ry: y-neighbor
# taps become axis-1 shifts inside a chunk, and the 2·nz' chunk-boundary
# rows — where the kernel's in-tile y masking wrongly zeroes the neighbor
# — are repaired by an O(nz'·nx) jnp epilogue (the same halo-correction
# algebra parallel/fast.py uses across devices, applied across chunks).
# The z axis of the folded view is a pure batch dimension (all folded
# offsets have oz = 0), so the kernel pipelines deep (tz·ry)-row slabs
# instead of one giant VMEM plane — the lift path's 512² cap disappears
# and the VPU stays busy.  ry is even, so the 2D (y + x) parity equals
# (j + ix) parity and the kernel runs with zstride = 0.


def _use_fold2d(offsets, shape) -> bool:
    """Folded-2D engages only where the single-plane lift cannot (the
    lift is FASTER when its one VMEM plane fits — measured on-chip:
    512² lift 0.17 ms/sweep vs fold 0.45 ms; the fold's value is above
    the lift's ~512² plane cap, where it reaches 5.1e10 nnz/s at
    2048²)."""
    if _fold2d_pick(offsets, shape) is None:
        return False
    return not supports(_lift2d(offsets), (1,) + tuple(shape))


def _fold2d_pick(offsets, shape):
    """Choose the fold ``(ry, shape3)`` for a 2D grid, or None.

    ry sweeps the even divisors of ny (≥ 8); the score models the two
    overheads: the kernel's unused z-neighbor plane streams (2/tz of one
    of ~3 streams) and the jnp boundary-row repair (~2/ry of the grid at
    roughly 2× kernel cost per element)."""
    ny, nx = shape
    if nx < 128 or nx % 128 or ny < 16:
        return None
    if any(len(off) != 2 or abs(off[0]) > 1 or abs(off[1]) > 1
           for off in offsets):
        return None
    k = len(offsets)
    best = None
    ry = 8
    while ry * 2 <= ny:
        if ny % ry == 0:
            nz_ = ny // ry
            s3 = (nz_, ry, nx)
            tz = _pick_tz(s3, k)
            if nz_ % tz == 0 and _fits(tz, ry * nx * 4, k):
                cost = 2.0 / (3.0 * tz) + 4.0 / ry
                if best is None or cost < best[0]:
                    best = (cost, ry, s3)
        ry += 8
    if best is None:
        return None
    return best[1], best[2]


def _xshift_rows(v, ox):
    """Zero-filled lane shift ``v[..., i + ox]`` for ox ∈ {−1, 0, 1}."""
    if ox == 0:
        return v
    nx = v.shape[-1]
    r = jnp.roll(v, -ox, axis=-1)
    ix = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    m = (ix < nx - 1) if ox == 1 else (ix > 0)
    return r * m.astype(v.dtype)


def _fold2d_fix(mode, values, offsets, inv_d, omega, color, x_old3, xk3, ry):
    """Repair the chunk-boundary rows of a folded-2D half-sweep output.

    The kernel zeroed the cross-chunk y-neighbor taps; the missing terms
    are ``corr_hi[c] = Σ_{oy=+1} v_k · shift_x(x_old[c+1, 0])`` at rows
    (c, ry−1), c < nz'−1, and symmetrically ``corr_lo`` at rows (c, 0),
    c > 0 — exactly the halo-correction algebra of parallel/fast.py with
    the "halo" read from the adjacent chunk of the same array."""
    corr_hi = None  # rows (c, ry-1): neighbor is (c+1, 0)
    corr_lo = None  # rows (c, 0): neighbor is (c-1, ry-1)
    for kk, (oy, ox) in enumerate(offsets):
        if oy == 1:
            t = values[kk] * _xshift_rows(x_old3[1:, 0, :], ox)
            corr_hi = t if corr_hi is None else corr_hi + t
        elif oy == -1:
            t = values[kk] * _xshift_rows(x_old3[:-1, ry - 1, :], ox)
            corr_lo = t if corr_lo is None else corr_lo + t
    if corr_hi is None and corr_lo is None:
        return xk3
    nx = xk3.shape[-1]

    def fix(rows, corr, jpar):
        # rows: (m, nx) slice of xk3 to repair; jpar: row parity (ry even
        # ⇒ 2D parity == (j + ix) & 1)
        if mode == "jacobi":
            om = jnp.asarray(omega, dtype=rows.dtype)
            return rows - om * inv_d * corr
        if mode == "rbgs":
            ix = jax.lax.broadcasted_iota(jnp.int32, corr.shape, corr.ndim - 1)
            m = ((jpar + ix) & 1) == color
            return rows - jnp.where(m, inv_d * corr, 0.0)
        return rows - corr  # residual

    if corr_hi is not None:
        xk3 = xk3.at[:-1, ry - 1, :].set(
            fix(xk3[:-1, ry - 1, :], corr_hi, (ry - 1) & 1)
        )
    if corr_lo is not None:
        xk3 = xk3.at[1:, 0, :].set(fix(xk3[1:, 0, :], corr_lo, 0))
    return xk3


def _half_sweep_fold2d(values, offsets, b, x, *, mode, omega, color, fold):
    ry, s3 = fold
    off3 = tuple((0, oy, ox) for oy, ox in offsets)
    x3 = x.reshape(s3)
    xk3 = _half_sweep(
        values, b.reshape(s3), x3, offsets=off3, mode=mode, omega=omega,
        color=color, zstride=0,
    )
    di = offsets.index((0, 0))
    inv_d = 1.0 / values[di]
    xk3 = _fold2d_fix(mode, values, offsets, inv_d, omega, color, x3, xk3, ry)
    return xk3.reshape(x.shape)


def supports(offsets, shape) -> bool:
    """Can the Pallas fast path run this operator/grid?  2D grids fold
    into z-slabs when large enough (see the folded-2D tier below — deep
    pipelined slabs, no 512² VMEM-plane cap), else lift to (1, ny, nx)
    — the kernels' z masking is exact for a single plane (both z edges
    are domain edges)."""
    if len(shape) == 2:
        if any(len(off) != 2 for off in offsets):
            return False
        if _fold2d_pick(offsets, shape) is not None:
            return True
        return supports(_lift2d(offsets), (1,) + tuple(shape))
    if len(shape) != 3:
        return False
    nz, ny, nx = shape
    if nz < 1 or ny < 2 or nx < 128 or nx % 128:
        return False
    if any(abs(o) > 1 for off in offsets for o in off):
        return False
    tz = _pick_tz(shape, len(offsets))
    return nz % tz == 0 and _fits(tz, ny * nx * 4, len(offsets))


def _shifted_term(off, t, lo_plane, hi_plane, i, gz, shape_t,
                  halo_lo=None, halo_hi=None):
    """``shift(x, off)`` restricted to the tile, zero outside the domain.

    ``t``: (TZ, ny, nx) aligned tile; ``lo_plane``/``hi_plane``: (1, ny, nx)
    neighbor planes (contents are clamped duplicates at the domain edge and
    masked off here).  ``halo_lo``/``halo_hi`` (optional, (1, ny, nx)):
    planes received from the NEIGHBOR DEVICE of a row-partitioned block —
    substituted (instead of zero) at the block's z edges, which makes the
    whole partitioned half-sweep ONE kernel pass (no boundary-plane
    epilogue, no concatenate — parallel/fast.py).  At true domain edges
    the halo layer supplies zero planes, so the Dirichlet truncation is
    preserved.
    """
    tz, ny, nx = shape_t
    oz, oy, ox = off
    if oz == 0:
        w = t
    elif oz == 1:
        # w[z] = x[z+1]: planes 1..TZ-1 of t, then hi_plane (tz == 1: the
        # tile contributes no planes — concatenating t[1:] would create a
        # zero-extent vector, which Mosaic rejects)
        w = hi_plane if tz == 1 else jnp.concatenate([t[1:], hi_plane], axis=0)
        edge = jnp.where(i == gz - 1, 0.0, 1.0).astype(t.dtype)
        last = (
            jax.lax.broadcasted_iota(jnp.int32, (tz, 1, 1), 0) == tz - 1
        ).astype(t.dtype)
        zmask = 1.0 + (edge - 1.0) * last
        w = w * zmask
        if halo_hi is not None:
            w = w + ((1.0 - edge) * last) * halo_hi
    else:
        w = lo_plane if tz == 1 else jnp.concatenate([lo_plane, t[:-1]], axis=0)
        edge = jnp.where(i == 0, 0.0, 1.0).astype(t.dtype)
        first = (
            jax.lax.broadcasted_iota(jnp.int32, (tz, 1, 1), 0) == 0
        ).astype(t.dtype)
        zmask = 1.0 + (edge - 1.0) * first
        w = w * zmask
        if halo_lo is not None:
            w = w + ((1.0 - edge) * first) * halo_lo
    if oy != 0:
        w = jnp.roll(w, -oy, axis=1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
        m = (iy < ny - 1) if oy == 1 else (iy > 0)
        w = w * m.astype(t.dtype)
    if ox != 0:
        w = jnp.roll(w, -ox, axis=2)
        ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)
        m = (ix < nx - 1) if ox == 1 else (ix > 0)
        w = w * m.astype(t.dtype)
    return w


def _smoother_kernel(
    vals_ref, t_ref, lo_ref, hi_ref, b_ref, *rest, offsets, mode,
    omega, color, tz, ny, nx, gz, zstride=1, halo=False
):
    if halo:
        hlo_ref, hhi_ref, out_ref = rest
        hlo, hhi = hlo_ref[...], hhi_ref[...]
    else:
        (out_ref,) = rest
        hlo = hhi = None
    i = pl.program_id(0)
    t = t_ref[...]
    lo = lo_ref[...]
    hi = hi_ref[...]
    b = b_ref[...]
    di = offsets.index((0, 0, 0))
    inv_d = 1.0 / vals_ref[0, di]

    acc = None
    for k, off in enumerate(offsets):
        if mode == "rbgs" and k == di:
            continue
        term = (
            t
            if off == (0, 0, 0)
            else _shifted_term(off, t, lo, hi, i, gz, (tz, ny, nx), hlo, hhi)
        )
        term = vals_ref[0, k] * term
        acc = term if acc is None else acc + term

    if mode == "jacobi":
        om = jnp.asarray(omega, dtype=t.dtype)
        out_ref[...] = t + om * (inv_d * (b - acc))
    elif mode == "residual":
        out_ref[...] = b - acc
    else:
        xn = inv_d * (b - acc)
        # global parity: (i*tz + iz)·zstride + iy + ix.  zstride=1 is the
        # true 3D case; the folded-2D path passes zstride = ry % 2 = 0 so
        # the chunk index (an artifact of the fold) drops out and parity
        # is the 2D (y + x) parity.
        iz = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 2)
        par = ((i * tz + iz) * zstride + iy + ix) & 1
        out_ref[...] = jnp.where(par == color, xn, t)


def _half_sweep(values, b, x, *, offsets, mode, omega, color, zstride=1,
                halos=None):
    nz, ny, nx = x.shape
    tz = _pick_tz(x.shape, len(offsets))
    gz = nz // tz
    kern = functools.partial(
        _smoother_kernel,
        offsets=offsets,
        mode=mode,
        omega=omega,
        color=color,
        tz=tz,
        ny=ny,
        nx=nx,
        gz=gz,
        zstride=zstride,
        halo=halos is not None,
    )
    vals2d = values.reshape(1, -1)
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
    in_specs = [
        pl.BlockSpec((1, len(offsets)), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        # neighbor planes: block size 1 along z → block index == element
        # index, clamped at the domain edges (masked in-kernel)
        pl.BlockSpec(
            (1, ny, nx),
            lambda i: (jnp.maximum(i * tz - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, ny, nx),
            lambda i: (jnp.minimum(i * tz + tz, nz - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [vals2d, x, x, x, b]
    if halos is not None:
        # device-halo planes for a row-partitioned block (parallel/fast.py):
        # constant index map — every tile can see both, the kernel uses
        # them only at the block's z edges
        plane_spec = pl.BlockSpec(
            (1, ny, nx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [plane_spec, plane_spec]
        args += [halos[0], halos[1]]
    return pl.pallas_call(
        kern,
        grid=(gz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tz, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        **extra,
    )(*args)


def residual_const_3d(values, offsets, b, x):
    """Fused residual ``r = b − A x`` (R5) for a 2D/3D constant stencil."""
    if x.ndim == 2:
        offsets = tuple(tuple(o) for o in offsets)
        fold = _fold2d_pick(offsets, x.shape)
        if fold is not None and _use_fold2d(offsets, x.shape):
            return _half_sweep_fold2d(
                values, offsets, b, x, mode="residual", omega=0.0,
                color=0, fold=fold,
            )
        return residual_const_3d(
            values, _lift2d(offsets), b[None], x[None]
        )[0]
    offsets = tuple(tuple(o) for o in offsets)
    return _half_sweep(
        values, b, x, offsets=offsets, mode="residual", omega=0.0, color=0
    )


def jacobi_const_3d(values, offsets, b, x, iterations: int, omega: float):
    """Fused weighted-Jacobi sweeps (T3) for a 2D/3D constant stencil."""
    if x.ndim == 2:
        offsets = tuple(tuple(o) for o in offsets)
        fold = _fold2d_pick(offsets, x.shape)
        if fold is not None and _use_fold2d(offsets, x.shape):
            for _ in range(iterations):
                x = _half_sweep_fold2d(
                    values, offsets, b, x, mode="jacobi", omega=omega,
                    color=0, fold=fold,
                )
            return x
        return jacobi_const_3d(
            values, _lift2d(offsets), b[None], x[None], iterations, omega
        )[0]
    offsets = tuple(tuple(o) for o in offsets)
    for _ in range(iterations):
        x = _half_sweep(
            values, b, x, offsets=offsets, mode="jacobi", omega=omega, color=0
        )
    return x


def rbgs_const_3d(values, offsets, b, x, iterations: int):
    """Fused red–black Gauss–Seidel sweeps (T4) for a 2D/3D constant
    stencil."""
    if x.ndim == 2:
        offsets = tuple(tuple(o) for o in offsets)
        fold = _fold2d_pick(offsets, x.shape)
        if fold is not None and _use_fold2d(offsets, x.shape):
            for _ in range(iterations):
                for color in (0, 1):
                    x = _half_sweep_fold2d(
                        values, offsets, b, x, mode="rbgs", omega=0.0,
                        color=color, fold=fold,
                    )
            return x
        return rbgs_const_3d(
            values, _lift2d(offsets), b[None], x[None], iterations
        )[0]
    offsets = tuple(tuple(o) for o in offsets)
    for _ in range(iterations):
        for color in (0, 1):
            x = _half_sweep(
                values, b, x, offsets=offsets, mode="rbgs", omega=0.0,
                color=color,
            )
    return x


def rbgs_half_sweep_const_3d(values, offsets, b, x, color: int):
    """One single-color RB-GS half-sweep (used by the faced-operator path,
    which fixes boundary rows between half-sweeps)."""
    if x.ndim == 2:
        offsets = tuple(tuple(o) for o in offsets)
        fold = _fold2d_pick(offsets, x.shape)
        if fold is not None and _use_fold2d(offsets, x.shape):
            return _half_sweep_fold2d(
                values, offsets, b, x, mode="rbgs", omega=0.0,
                color=color, fold=fold,
            )
        return rbgs_half_sweep_const_3d(
            values, _lift2d(offsets), b[None], x[None], color
        )[0]
    offsets = tuple(tuple(o) for o in offsets)
    return _half_sweep(
        values, b, x, offsets=offsets, mode="rbgs", omega=0.0, color=color
    )


def halo_half_sweep_const_3d(
    values, offsets, b, x, mode: str, omega: float, color: int,
    lower, upper,
):
    """One constant-stencil half-sweep (``mode`` ∈ jacobi|rbgs|residual)
    on a row-partitioned local block with the two received halo planes
    consumed IN-KERNEL at the block's z edges — the whole partitioned
    half-sweep is one Pallas pass, no boundary-plane epilogue or
    concatenate (measured: the epilogue path cost 3.5× the single-device
    sweep at 256³; this path is ~1×).  ``lower``/``upper`` are
    (1, ny, nx) planes from the halo exchange (zeros at global domain
    edges, preserving the Dirichlet truncation)."""
    offsets = tuple(tuple(o) for o in offsets)
    return _half_sweep(
        values, b, x, offsets=offsets, mode=mode, omega=omega, color=color,
        halos=(lower, upper),
    )


# ---------------------------------------------------------------------------
# varying-coefficient smoothers (the diffusion / general-stencil family)
# ---------------------------------------------------------------------------

_VARY_BUDGET = 48 * 1024 * 1024  # coeff blocks dominate; v5e VMEM is 128 MB


def _pick_tz_vary(shape, k: int) -> int:
    nz, ny, nx = shape
    plane = ny * nx * 4

    def fits(tz):
        # (K coeff + x tile + b + out) slabs + 2 halo planes, dbl-buffered
        return ((k + 3) * tz + 2) * plane * 2 <= _VARY_BUDGET

    tz = 1
    while tz * 2 <= nz and nz % (tz * 2) == 0 and fits(tz * 2):
        tz *= 2
    return tz


def supports_varying(offsets, shape) -> bool:
    """Pallas path for varying-coefficient stencils (T3/T4 scope
    closure: the diffusion family runs the kernel tier).  Same grid
    rules as :func:`supports`; the VMEM fit additionally holds the K
    coefficient slabs per tile.

    Measured on-chip (128³ diffusion, rbgs): bit-exact vs jnp and ~par
    on time — XLA fuses the varying shift chain about as well as the
    explicit kernel, because the path streams K coefficient grids either
    way.  The kernel's value is uniformity (one tier, explicit tiling)
    and the platform for future multi-sweep fusion of coefficients."""
    if len(shape) == 2:
        if any(len(off) != 2 for off in offsets):
            return False
        return supports_varying(_lift2d(offsets), (1,) + tuple(shape))
    if len(shape) != 3:
        return False
    nz, ny, nx = shape
    if nz < 1 or ny < 2 or nx < 128 or nx % 128:
        return False
    if any(abs(o) > 1 for off in offsets for o in off):
        return False
    tz = _pick_tz_vary(shape, len(offsets))
    return nz % tz == 0 and ((len(offsets) + 3) * tz + 2) * ny * nx * 4 * 2 <= _VARY_BUDGET


def _vary_kernel(
    coef_ref, t_ref, lo_ref, hi_ref, b_ref, *rest, offsets, mode,
    omega, color, tz, ny, nx, gz, halo=False
):
    if halo:
        hlo_ref, hhi_ref, out_ref = rest
        hlo, hhi = hlo_ref[...], hhi_ref[...]
    else:
        (out_ref,) = rest
        hlo = hhi = None
    i = pl.program_id(0)
    t = t_ref[...]
    lo = lo_ref[...]
    hi = hi_ref[...]
    b = b_ref[...]
    di = offsets.index((0, 0, 0))
    inv_d = 1.0 / coef_ref[di]  # (tz, ny, nx)

    acc = None
    for k, off in enumerate(offsets):
        if mode == "rbgs" and k == di:
            continue
        term = (
            t
            if off == (0, 0, 0)
            else _shifted_term(off, t, lo, hi, i, gz, (tz, ny, nx), hlo, hhi)
        )
        term = coef_ref[k] * term
        acc = term if acc is None else acc + term

    if mode == "jacobi":
        om = jnp.asarray(omega, dtype=t.dtype)
        out_ref[...] = t + om * (inv_d * (b - acc))
    elif mode == "residual":
        out_ref[...] = b - acc
    else:
        xn = inv_d * (b - acc)
        iz = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 2)
        par = (i * tz + iz + iy + ix) & 1
        out_ref[...] = jnp.where(par == color, xn, t)


def _half_sweep_vary(coeffs, b, x, *, offsets, mode, omega, color,
                     halos=None):
    nz, ny, nx = x.shape
    tz = _pick_tz_vary(x.shape, len(offsets))
    gz = nz // tz
    kern = functools.partial(
        _vary_kernel,
        offsets=offsets,
        mode=mode,
        omega=omega,
        color=color,
        tz=tz,
        ny=ny,
        nx=nx,
        gz=gz,
        halo=halos is not None,
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
    K = len(offsets)
    in_specs = [
        pl.BlockSpec(
            (K, tz, ny, nx), lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, ny, nx),
            lambda i: (jnp.maximum(i * tz - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, ny, nx),
            lambda i: (jnp.minimum(i * tz + tz, nz - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [coeffs, x, x, x, b]
    if halos is not None:
        plane_spec = pl.BlockSpec(
            (1, ny, nx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [plane_spec, plane_spec]
        args += [halos[0], halos[1]]
    return pl.pallas_call(
        kern,
        grid=(gz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tz, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        **extra,
    )(*args)


def halo_half_sweep_vary_3d(
    coeffs, offsets, b, x, mode: str, omega: float, color: int,
    lower, upper,
):
    """Varying-coefficient analog of :func:`halo_half_sweep_const_3d`
    (one partitioned half-sweep = one Pallas pass, halos in-kernel)."""
    offsets = tuple(tuple(o) for o in offsets)
    return _half_sweep_vary(
        coeffs, b, x, offsets=offsets, mode=mode, omega=omega, color=color,
        halos=(lower, upper),
    )


def jacobi_vary_3d(coeffs, offsets, b, x, iterations: int, omega: float):
    """Weighted-Jacobi sweeps for a varying-coefficient 2D/3D stencil
    (one fused pass per sweep: K coefficient slabs + x + b in, x out)."""
    if x.ndim == 2:
        return jacobi_vary_3d(
            coeffs[:, None], _lift2d(offsets), b[None], x[None],
            iterations, omega,
        )[0]
    offsets = tuple(tuple(o) for o in offsets)
    for _ in range(iterations):
        x = _half_sweep_vary(
            coeffs, b, x, offsets=offsets, mode="jacobi", omega=omega,
            color=0,
        )
    return x


def rbgs_vary_3d(coeffs, offsets, b, x, iterations: int):
    """Red–black GS sweeps for a varying-coefficient 2D/3D stencil."""
    if x.ndim == 2:
        return rbgs_vary_3d(
            coeffs[:, None], _lift2d(offsets), b[None], x[None], iterations
        )[0]
    offsets = tuple(tuple(o) for o in offsets)
    for _ in range(iterations):
        for color in (0, 1):
            x = _half_sweep_vary(
                coeffs, b, x, offsets=offsets, mode="rbgs", omega=0.0,
                color=color,
            )
    return x


def rbgs_half_sweep_vary_3d(coeffs, offsets, b, x, color: int):
    """One single-color RB-GS half-sweep for a varying-coefficient
    stencil (the distributed fast tier runs these between halo-plane
    epilogues — parallel/fast.py)."""
    if x.ndim == 2:
        return rbgs_half_sweep_vary_3d(
            coeffs[:, None], _lift2d(offsets), b[None], x[None], color
        )[0]
    offsets = tuple(tuple(o) for o in offsets)
    return _half_sweep_vary(
        coeffs, b, x, offsets=offsets, mode="rbgs", omega=0.0, color=color
    )


def residual_vary_3d(coeffs, offsets, b, x):
    """Fused residual for a varying-coefficient 2D/3D stencil."""
    if x.ndim == 2:
        return residual_vary_3d(
            coeffs[:, None], _lift2d(offsets), b[None], x[None]
        )[0]
    offsets = tuple(tuple(o) for o in offsets)
    return _half_sweep_vary(
        coeffs, b, x, offsets=offsets, mode="residual", omega=0.0, color=0
    )


# ---------------------------------------------------------------------------
# fused double-float update + residual (the outer-loop kernel)
# ---------------------------------------------------------------------------


def supports_fused_update(offsets, shape) -> bool:
    """Fit check for :func:`df_update_residual_const_3d` — it streams 8
    tile buffers + 6 halo planes (vs the smoothers' 3+2), so the slab
    height and plane size limits are tighter.  2D grids lift to
    (1, ny, nx) like :func:`supports`."""
    if len(shape) == 2:
        if any(len(off) != 2 for off in offsets):
            return False
        return supports_fused_update(_lift2d(offsets), (1,) + tuple(shape))
    if len(shape) != 3:
        return False
    nz, ny, nx = shape
    if nz < 1 or ny < 2 or nx < 128 or nx % 128:
        return False
    if any(abs(o) > 1 for off in offsets for o in off):
        return False
    plane = ny * nx * 4
    tz = _pick_tz_fused(shape)
    return nz % tz == 0 and (8 * tz + 6) * plane * 2 <= _VMEM_BUDGET


def _pick_tz_fused(shape) -> int:
    nz, ny, nx = shape
    plane = ny * nx * 4
    tz = 1
    while (
        tz * 2 <= nz
        and nz % (tz * 2) == 0
        and (8 * (tz * 2) + 6) * plane * 2 <= _VMEM_BUDGET
    ):
        tz *= 2
    return tz


def _df_two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _df_update(xh, xl, e):
    """(xh, xl) + e -> normalized double-float pair (df_add_f32)."""
    s, err = _df_two_sum(xh, e)
    e2 = err + xl
    s2 = s + e2
    return s2, e2 - (s2 - s)


def _fused_kernel(
    xh_ref, xl_ref, e_ref, bh_ref, bl_ref,
    xh_lo, xh_hi, xl_lo, xl_hi, e_lo, e_hi,
    *rest,
    offsets, terms, tz, ny, nx, gz, halo=False, emit_norm=False,
):
    rest = list(rest)
    if halo:
        # device-halo planes of (x_hi, x_lo, e): the UPDATED halo x' is
        # computed in-kernel from the pre-update neighbor planes, so the
        # partitioned fused step needs no post-kernel edge repair
        (hxh_lo, hxh_hi, hxl_lo, hxl_hi, he_lo, he_hi) = rest[:6]
        rest = rest[6:]
        hlo_h, hlo_l = _df_update(hxh_lo[...], hxl_lo[...], he_lo[...])
        hhi_h, hhi_l = _df_update(hxh_hi[...], hxl_hi[...], he_hi[...])
    else:
        hlo_h = hlo_l = hhi_h = hhi_l = None
    oxh_ref, oxl_ref, or_ref = rest[:3]
    on_ref = rest[3] if emit_norm else None
    i = pl.program_id(0)
    nxh, nxl = _df_update(xh_ref[...], xl_ref[...], e_ref[...])
    lo_h, lo_l = _df_update(xh_lo[...], xl_lo[...], e_lo[...])
    hi_h, hi_l = _df_update(xh_hi[...], xl_hi[...], e_hi[...])

    acch = bh_ref[...]
    accl = bl_ref[...]
    shape_t = (tz, ny, nx)
    for off, tp in zip(offsets, terms):
        if off == (0, 0, 0):
            sh_h, sh_l = nxh, nxl
        else:
            sh_h = _shifted_term(
                off, nxh, lo_h, hi_h, i, gz, shape_t, hlo_h, hhi_h
            )
            sh_l = _shifted_term(
                off, nxl, lo_l, hi_l, i, gz, shape_t, hlo_l, hhi_l
            )
        for p in tp:
            pf = jnp.float32(p)
            # acc ← acc − p·x' : exact products (p = ±2^k), compensated sum
            th, tl = -pf * sh_h, -pf * sh_l
            s, err = _df_two_sum(acch, th)
            err = err + (accl + tl)
            acch = s + err
            accl = err - (acch - s)

    oxh_ref[...] = nxh
    oxl_ref[...] = nxl
    or_ref[...] = acch
    if emit_norm:
        # per-tile partial ‖r‖² — saves the caller's full re-read of r
        # for the convergence norm (one plane-pass per cycle)
        on_ref[...] = jnp.broadcast_to(
            jnp.sum(acch * acch), (1, 8, _LANE)
        ).astype(jnp.float32)


def df_update_residual_const_3d(offsets, terms, x_hi, x_lo, e, b_hi, b_lo,
                                halos=None, emit_norm=False):
    """Fused outer-loop step for dyadic constant 3D stencils:

        (x_hi', x_lo') = df_add_f32((x_hi, x_lo), e)
        r_hi           = hi(b − A x')   in double-float

    One HBM pass over 8 streams replaces the jnp df-update (6 streams) +
    df-residual (6 streams) pair — measured ~5.3 ms → ~1 ms at 256³.
    ``offsets``/``terms`` are static; ``terms[k]`` is the power-of-two
    decomposition of tap k (products exact, only compensated adds on the
    VPU — see ops.doublefloat.pow2_terms).

    ``halos`` (optional): ``((xh_lo, xh_hi), (xl_lo, xl_hi), (e_lo,
    e_hi))`` received device-halo planes of a row-partitioned block; the
    updated halo x' is derived in-kernel, so the partitioned fused step
    is one pass with no edge repair (parallel/dist.py).
    """
    if x_hi.ndim == 2:
        if halos is not None:
            # the lift maps the partition axis to the kernel's y axis, so
            # device halos cannot be consumed — callers must use the
            # unfused df path for partitioned 2D blocks (parallel/dist.py)
            raise ValueError("halos unsupported for 2D blocks")
        out2 = df_update_residual_const_3d(
            _lift2d(offsets), terms, x_hi[None], x_lo[None], e[None],
            b_hi[None], b_lo[None], emit_norm=emit_norm,
        )
        if emit_norm:
            xh, xl, r, pn = out2
            return xh[0], xl[0], r[0], pn
        xh, xl, r = out2
        return xh[0], xl[0], r[0]
    offsets = tuple(tuple(o) for o in offsets)
    nz, ny, nx = x_hi.shape
    tz = _pick_tz_fused(x_hi.shape)
    gz = nz // tz
    kern = functools.partial(
        _fused_kernel,
        offsets=offsets,
        terms=tuple(tuple(t) for t in terms),
        tz=tz,
        ny=ny,
        nx=nx,
        gz=gz,
        halo=halos is not None,
        emit_norm=emit_norm,
    )
    tile = pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lo_plane = pl.BlockSpec(
        (1, ny, nx),
        lambda i: (jnp.maximum(i * tz - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    hi_plane = pl.BlockSpec(
        (1, ny, nx),
        lambda i: (jnp.minimum(i * tz + tz, nz - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [tile, tile, tile, tile, tile,
                lo_plane, hi_plane, lo_plane, hi_plane, lo_plane, hi_plane]
    args = [x_hi, x_lo, e, b_hi, b_lo, x_hi, x_hi, x_lo, x_lo, e, e]
    if halos is not None:
        plane_spec = pl.BlockSpec(
            (1, ny, nx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [plane_spec] * 6
        for pair in halos:
            args += [pair[0], pair[1]]
    interpret = jax.default_backend() != "tpu"
    out_specs = [tile, tile, tile]
    out_shape = [
        jax.ShapeDtypeStruct(x_hi.shape, x_hi.dtype),
        jax.ShapeDtypeStruct(x_hi.shape, x_hi.dtype),
        jax.ShapeDtypeStruct(x_hi.shape, x_hi.dtype),
    ]
    if emit_norm:
        # (1, 8, 128) tile: Mosaic requires the last two block dims be
        # (8, 128)-divisible or full-extent
        out_specs.append(
            pl.BlockSpec((1, 8, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((gz, 8, _LANE), jnp.float32)
        )
    out = pl.pallas_call(
        kern,
        grid=(gz,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)
    return out


# ---------------------------------------------------------------------------
# whole-plane fused 2D tier (VERDICT r4 task 6: the ≤1024² launch floor)
# ---------------------------------------------------------------------------
#
# 2D grids small enough for one VMEM plane are LAUNCH-floor bound, not
# bandwidth bound (each per-half-sweep kernel costs ~the fixed launch
# overhead at ≤16 MB grids — CLAUDE.md).  The remedy is stage fusion at
# maximum depth: the whole (ny, nx) plane is VMEM-resident, so ALL S
# half-sweeps plus the level residual run in ONE kernel with no halo
# machinery at all (the full domain is in registers/VMEM; Dirichlet
# edges are iota masks, exactly as in the lift path).
#
# Cornered (boundary-corrected Galerkin) levels run EXACTLY via the
# O(K) delta algebra (ops/stencil.py::CorneredOperator): the tap field
# for offset k is  c_k + my·d0_k + mx·d1_k + my·mx·d01_k  with
# my = (iy == 0), mx = (ix == 0) — accumulated as four scalar-weighted
# sums with three masked full-plane corrections per apply, not per
# offset.


def supports_fused2d(offsets, shape, k: int | None = None) -> bool:
    """Whole-plane 2D fusion feasibility: radius-1 2D stencil, lane-dim
    multiple of 128 (or tiny full-extent), plane + ~0.9·K live
    intermediates inside the scoped-VMEM cap (same empirical coefficient
    as ops/fused.py::_fit_tz)."""
    if len(shape) != 2:
        return False
    ny, nx = shape
    if any(len(off) != 2 or abs(off[0]) > 1 or abs(off[1]) > 1
           for off in offsets):
        return False
    if not (nx % 128 == 0 or nx in (32, 64)) or ny < 8:
        return False
    plane = ny * nx * 4
    # Perf gate at 256²-class planes (measured on-chip, r5 probes, same
    # process each: 256² solve 5.4× faster fused / sweeps 1.11×; at 512²
    # fused LOSES — sweeps 0.86×, solve ~0.4× — the monolithic
    # whole-plane kernel forfeits the small kernels' pipelining once the
    # plane has real bandwidth cost.  ≥512² keeps the lift/folded tiers.
    if plane > 256 * 256 * 4:
        return False
    kk = k if k is not None else len(offsets)
    scoped = int(0.9 * kk * plane)
    windows = 2 * 3 * plane  # b, x in + x (and r) out, double-buffered
    return (
        scoped <= _VMEM_LIMIT - 8 * 1024 * 1024
        and windows + scoped <= 100 * 1024 * 1024
    )


def _shift2d_full(v, oy: int, ox: int):
    """``w[y, x] = v[y + oy, x + ox]`` with zero fill (whole plane in
    VMEM — Dirichlet truncation by iota masks)."""
    out = v
    if oy:
        ny = v.shape[0]
        out = jnp.roll(out, -oy, axis=0)
        iy = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        m = (iy < ny - 1) if oy == 1 else (iy > 0)
        out = out * m.astype(v.dtype)
    if ox:
        nx = v.shape[1]
        out = jnp.roll(out, -ox, axis=1)
        ix = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        m = (ix < nx - 1) if ox == 1 else (ix > 0)
        out = out * m.astype(v.dtype)
    return out


def _fused2d_kernel(
    vals_ref, deltas_ref, *rest, offsets, subsets, stages,
    emit_residual, zero_start, ny, nx, restrict=False, prolong=False,
):
    refs = list(rest)
    if restrict:
        My_ref, Mx_ref = refs.pop(0), refs.pop(0)
    if prolong:
        Py_ref, Px_ref = refs.pop(0), refs.pop(0)
    b_ref = refs.pop(0)
    x = jnp.zeros((ny, nx), b_ref.dtype) if zero_start else refs.pop(0)[...]
    if prolong:
        # coarse-correction prolongation fused in: x += My ec Mxᵀ (two
        # in-VMEM matmuls — MXU work, no HBM round-trip for P ec)
        ec = refs.pop(0)[...]
        t1 = jax.lax.dot_general(
            ec, Py_ref[...], (((0,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (nxc, ny)
        up = jax.lax.dot_general(
            t1, Px_ref[...], (((0,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (ny, nx)
        x = x + up
    out_x = refs.pop(0)
    out_r = refs.pop(0) if emit_residual else None
    b = b_ref[...]
    di = offsets.index((0, 0))
    iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    my = (iy == 0).astype(b.dtype)
    mx = (ix == 0).astype(b.dtype)
    # delta rows by axis subset (None when the operator is constant)
    s_idx = {S: i for i, S in enumerate(subsets or ())}
    i0, i1, i01 = s_idx.get((0,)), s_idx.get((1,)), s_idx.get((0, 1))

    def dval(si, k):
        return vals_ref[0, k] * 0.0 if si is None else deltas_ref[si, k]

    def apply_op(v, skip_diag: bool):
        accs = [None, None, None, None]  # const, d0, d1, d01 parts

        def add(i, t):
            accs[i] = t if accs[i] is None else accs[i] + t

        for k, (oy, ox) in enumerate(offsets):
            if skip_diag and k == di:
                continue
            term = v if (oy, ox) == (0, 0) else _shift2d_full(v, oy, ox)
            add(0, vals_ref[0, k] * term)
            if subsets:
                if oy == 0 and i0 is not None:
                    add(1, deltas_ref[i0, k] * term)
                if ox == 0 and i1 is not None:
                    add(2, deltas_ref[i1, k] * term)
                if oy == 0 and ox == 0 and i01 is not None:
                    add(3, deltas_ref[i01, k] * term)
        acc = accs[0]
        if accs[1] is not None:
            acc = acc + my * accs[1]
        if accs[2] is not None:
            acc = acc + mx * accs[2]
        if accs[3] is not None:
            acc = acc + my * mx * accs[3]
        return acc

    # exact per-row diagonal field (varies only on the iy==0 / ix==0 bands)
    d_field = vals_ref[0, di]
    if subsets:
        d_field = (
            d_field
            + my * dval(i0, di)
            + mx * dval(i1, di)
            + my * mx * dval(i01, di)
        )
        inv_d = 1.0 / d_field
    else:
        inv_d = 1.0 / d_field

    par = (iy + ix) & 1
    for mode, p in stages:
        if mode == "jacobi":
            om = jnp.asarray(p, dtype=b.dtype)
            x = x + om * (inv_d * (b - apply_op(x, False)))
        else:  # ("rb", color)
            xn = inv_d * (b - apply_op(x, True))
            x = jnp.where(par == p, xn, x)
    out_x[...] = x
    if emit_residual:
        r = b - apply_op(x, False)
        if restrict:
            # bc = Myᵀ r Mx — the level residual restricted in-kernel
            t1 = jax.lax.dot_general(
                r, My_ref[...], (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (nx, nyc)
            out_r[...] = jax.lax.dot_general(
                t1, Mx_ref[...], (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (nyc, nxc)
        else:
            out_r[...] = r


def fused_stages_2d(
    values, offsets, b, x, stages, *, deltas=None, subsets=None,
    emit_residual=False, restrict_transfer=None, ec=None,
    prolong_transfer=None,
):
    """S half-sweeps (+ optional residual) on a whole-VMEM 2D plane in
    ONE Pallas launch.  ``x=None`` is the zero-start path (reads only
    ``b``).  ``deltas``/``subsets`` select the exact cornered-operator
    algebra.  ``restrict_transfer`` (with ``emit_residual``) restricts
    the residual in-kernel (``bc = Mᵀ r M``, MXU matmuls) — returns
    ``(x', bc)``; ``ec`` + ``prolong_transfer`` starts from
    ``x + P ec`` (prolongation fused in).  Returns ``x'`` or
    ``(x', r_or_bc)``."""
    from openmg_tpu.ops.transfer import _axis_matrix

    ny, nx = b.shape
    offsets = tuple(tuple(o) for o in offsets)
    subsets = tuple(tuple(s) for s in subsets) if subsets is not None else None
    kern = functools.partial(
        _fused2d_kernel,
        offsets=offsets,
        subsets=subsets,
        stages=tuple(stages),
        emit_residual=emit_residual,
        zero_start=x is None,
        ny=ny,
        nx=nx,
        restrict=restrict_transfer is not None,
        prolong=ec is not None,
    )
    K = len(offsets)
    vals2d = values.reshape(1, -1)
    if deltas is None:
        deltas = jnp.zeros((1, K), values.dtype)
    plane_spec = pl.BlockSpec((ny, nx), lambda: (0, 0), memory_space=pltpu.VMEM)

    def whole(a):
        return pl.BlockSpec(
            tuple(a.shape), lambda: (0,) * a.ndim, memory_space=pltpu.VMEM
        )

    in_specs = [
        pl.BlockSpec((1, K), lambda: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (deltas.shape[0], K), lambda: (0, 0), memory_space=pltpu.SMEM
        ),
    ]
    args = [vals2d, deltas]
    if restrict_transfer is not None:
        My = jnp.asarray(_axis_matrix(ny, tuple(restrict_transfer.r_taps),
                                      "float32"))
        Mx = jnp.asarray(_axis_matrix(nx, tuple(restrict_transfer.r_taps),
                                      "float32"))
        in_specs += [whole(My), whole(Mx)]
        args += [My, Mx]
    if ec is not None:
        Py = jnp.asarray(_axis_matrix(ny, tuple(prolong_transfer.p_taps),
                                      "float32"))
        Px = jnp.asarray(_axis_matrix(nx, tuple(prolong_transfer.p_taps),
                                      "float32"))
        in_specs += [whole(Py), whole(Px)]
        args += [Py, Px]
    in_specs.append(plane_spec)
    args.append(b)
    if x is not None:
        in_specs.append(plane_spec)
        args.append(x)
    if ec is not None:
        in_specs.append(whole(ec))
        args.append(ec)
    if emit_residual and restrict_transfer is not None:
        r_spec = pl.BlockSpec(
            (ny // 2, nx // 2), lambda: (0, 0), memory_space=pltpu.VMEM
        )
        r_struct = jax.ShapeDtypeStruct((ny // 2, nx // 2), b.dtype)
    else:
        r_spec = plane_spec
        r_struct = jax.ShapeDtypeStruct(b.shape, b.dtype)
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
        grid=(),
        in_specs=in_specs,
        out_specs=(
            (plane_spec, r_spec) if emit_residual else plane_spec
        ),
        out_shape=(
            (jax.ShapeDtypeStruct(b.shape, b.dtype), r_struct)
            if emit_residual
            else jax.ShapeDtypeStruct(b.shape, b.dtype)
        ),
        interpret=interpret,
        **extra,
    )(*args)
    return out
