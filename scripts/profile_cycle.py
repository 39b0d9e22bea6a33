#!/usr/bin/env python
"""Per-component cycle profile at 256³ on the real chip.

Times each V-cycle constituent with an in-program repeat loop (lax.scan)
so the relay's ~2.4 ms fixed dispatch overhead amortizes away, then the
whole cycle, then the whole solve.  All grid arrays / the hierarchy are
jit ARGUMENTS (closing over them inlines HLO constants → relay HTTP 413).
Reads are real host readbacks (the relay does not honor
block_until_ready).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

from openmg_tpu import SolverConfig, setup
from openmg_tpu.core.cycle import run_cycle
from openmg_tpu.models.poisson import rhs_random
from openmg_tpu.ops.smoothers import smooth
from openmg_tpu.ops.stencil import residual
from openmg_tpu.ops.transfer import prolong, restrict


def timeit(name, fn, carry0, *args, reps=30):
    """fn(carry, *args) -> carry of the same shape; per-rep time via scan."""

    @jax.jit
    def f(c, *a):
        return lax.scan(lambda cc, _: (fn(cc, *a), 0.0), c, None,
                        length=reps)[0]

    out = f(carry0, *args)
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    t0 = time.perf_counter()
    out = f(carry0, *args)
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    shape = (256, 256, 256)
    cfg = SolverConfig(smoother="rbgs", transfer="linear",
                       residual_dtype="doublefloat", cycles=60)
    solver = setup(shape, cfg)
    h = solver.hierarchy
    b = jnp.asarray(rhs_random(shape, seed=0), dtype=jnp.float32)
    x = jnp.zeros_like(b)
    L0 = h.levels[0]

    timeit("pre-smooth rbgs x2 (4 half-sweeps) L0",
           lambda xx, A, ind, bb: smooth("rbgs", A, ind, bb, xx, 2, 2/3.),
           x, L0.A, L0.inv_diag, b)
    timeit("jacobi sweep x1 L0",
           lambda xx, A, ind, bb: smooth("jacobi", A, ind, bb, xx, 1, 2/3.),
           x, L0.A, L0.inv_diag, b)
    timeit("residual L0 (pallas)",
           lambda xx, A, bb: residual(A, bb, xx), x, L0.A, b)

    r = jax.jit(lambda A, bb, xx: residual(A, bb, xx))(L0.A, b, x)

    def rest(rr, hh):
        cc = restrict(rr, hh.transfer)
        return prolong(cc, shape, hh.transfer)
    timeit("restrict+prolong roundtrip L0", rest, r, h)

    timeit("full v-cycle (pre2 post2 rbgs)",
           lambda rr, hh: run_cycle(hh, rr, "v", 2, 2, "rbgs", 2/3.),
           r, h, reps=10)

    # everything below the fine level: one v-cycle on the coarse grid
    rc = jax.jit(lambda rr, hh: restrict(rr, hh.transfer))(r, h)
    from openmg_tpu.core.hierarchy import Hierarchy
    h1 = Hierarchy(levels=h.levels[1:], coarse_inv=h.coarse_inv,
                   fine_hi=h.fine_hi, fine_hi_lo=h.fine_hi_lo,
                   stats=h.stats[1:], transfer=h.transfer)
    timeit("coarse sub-cycle (levels 1..)",
           lambda rr, hh: run_cycle(hh, rr, "v", 2, 2, "rbgs", 2/3.),
           rc, h1, reps=10)

    from openmg_tpu.core.solver import exact_residual_terms
    from openmg_tpu.ops import kernels
    terms = exact_residual_terms(h)
    if terms is not None and kernels.supports_fused_update(
            h.fine_hi.offsets, shape):
        offs = h.fine_hi.offsets
        bl = jnp.zeros_like(b)

        def df_step(xx, rr, bb, bbl):
            xh, _, _ = kernels.df_update_residual_const_3d(
                offs, terms, xx, bbl, rr, bb, bbl)
            return xh

        timeit("df fused update+residual", df_step, x, r, b, bl)

    solver.solve(b)  # warm
    t0 = time.perf_counter()
    _, info = solver.solve(b)
    dt = time.perf_counter() - t0
    print(f"solve: cycles={info['cycles']} conv={info['converged']} "
          f"total={dt*1e3:.1f} ms -> {dt*1e3/max(info['cycles'],1):.2f} "
          f"ms/cycle", flush=True)


if __name__ == "__main__":
    main()
