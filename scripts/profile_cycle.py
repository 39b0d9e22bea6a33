#!/usr/bin/env python
"""Per-component V-cycle breakdown on the real chip (dev tool).

Times each cycle component by chaining it N times inside one jitted
``lax.fori_loop`` program (one dispatch, so the remote-relay overhead
amortizes to <2%), synced by a scalar host readback.  Components:

  - presmooth+residual fused (per level)
  - post-smooth (per level)
  - restrict+prolong pair (per level)
  - df update+residual fused kernel (fine level)
  - coarse direct solve
  - the whole run_cycle, and the whole _solve_device body

Usage: python scripts/profile_cycle.py [N [reps]]   (default 256, 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from openmg_tpu import SolverConfig, setup
from openmg_tpu.core.cycle import coarse_solve, run_cycle, v_cycle
from openmg_tpu.models.poisson import rhs_random
from openmg_tpu.ops import fused, kernels
from openmg_tpu.ops.smoothers import smooth
from openmg_tpu.ops.transfer import prolong, restrict


def timeit(fn, *args, reps):
    """fn must be jitted and return a pytree; sync via scalar readback."""
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # compile + sync
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = time.perf_counter() - t0
    return dt / reps


def chain(body, reps):
    """Jitted program running `body` reps times via fori_loop.

    ``body(ctx, *carry) -> carry``; ``ctx`` is a loop-invariant pytree
    passed through jit as an argument (NEVER closed over: captured arrays
    inline as HLO constants and overflow the remote-compile relay)."""

    @jax.jit
    def run(ctx, *carry):
        return lax.fori_loop(0, reps, lambda i, c: body(ctx, *c), carry)

    return run


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    shape = (n, n, n)
    cfg = SolverConfig(
        smoother="rbgs", transfer="linear", residual_dtype="doublefloat"
    )
    solver = setup(shape, cfg)
    h = solver.hierarchy
    print(f"levels: {[s[0] for s in h.stats]}", flush=True)

    total = 0.0
    for lvl in range(h.num_levels - 1):
        gs = h.levels[lvl].grid_shape
        b = jnp.asarray(rhs_random(gs, seed=lvl), dtype=jnp.float32)

        # pre-smooth + residual fused (zero start)
        def pre_body(L, x, r):
            out = fused.presmooth_residual_fused("rbgs", L.A, r, 2, 2 / 3)
            if out is None:
                x2 = smooth("rbgs", L.A, L.inv_diag, r, jnp.zeros_like(r), 2, 2 / 3)
                from openmg_tpu.ops.stencil import residual as st_res

                return x2, st_res(L.A, r, x2)
            return out

        t_pre = timeit(chain(pre_body, reps), h.levels[lvl], b, b, reps=reps)

        # post-smooth (existing iterate)
        def post_body(ctx, x):
            L, bb = ctx
            return (smooth("rbgs", L.A, L.inv_diag, bb, x, 2, 2 / 3),)

        t_post = timeit(chain(post_body, reps), (h.levels[lvl], b), b, reps=reps)

        # restrict + prolong round trip
        def rp_body(ctx, x):
            c = restrict(x, h.transfer)
            return (x + 1e-6 * prolong(c, gs, h.transfer),)

        t_rp = timeit(chain(rp_body, reps), None, b, reps=reps)

        lvl_sum = t_pre + t_post + t_rp
        total += lvl_sum
        print(
            f"L{lvl} {str(gs):>18}: pre+res {t_pre*1e3:7.3f}  "
            f"post {t_post*1e3:7.3f}  R+P {t_rp*1e3:7.3f}  "
            f"sum {lvl_sum*1e3:7.3f} ms",
            flush=True,
        )

    # coarse solve
    cs = h.levels[-1].grid_shape
    bc = jnp.asarray(rhs_random(cs, seed=99), dtype=jnp.float32)
    t_cs = timeit(
        chain(lambda hh, x: (coarse_solve(hh, x),), reps), h, bc, reps=reps
    )
    print(f"coarse solve {cs}: {t_cs*1e3:7.3f} ms", flush=True)
    total += t_cs

    # df fused update+residual at fine level
    gs = h.grid_shape
    b = jnp.asarray(rhs_random(gs, seed=7), dtype=jnp.float32)
    from openmg_tpu.core.solver import exact_residual_terms

    terms = exact_residual_terms(h)
    if terms is not None and kernels.supports_fused_update(
        h.fine_hi.offsets, gs
    ):
        offs = h.fine_hi.offsets

        def df_body(ctx, xh, xl, e):
            bb, bl = ctx
            xh2, xl2, r2 = kernels.df_update_residual_const_3d(
                offs, terms, xh, xl, e, bb, bl
            )
            return xh2, xl2, r2

        zero = jnp.zeros_like(b)
        t_df = timeit(
            chain(df_body, reps), (b, zero), zero, zero, b, reps=reps
        )
        print(f"df update+residual: {t_df*1e3:7.3f} ms", flush=True)
        total += t_df

        # norm reduction on top
        def dfn_body(ctx, xh, xl, e):
            bb, bl = ctx
            xh2, xl2, r2 = kernels.df_update_residual_const_3d(
                offs, terms, xh, xl, e, bb, bl
            )
            rn = jnp.sqrt(jnp.sum(r2 * r2))
            return xh2, xl2, r2 * (1.0 + 0.0 * rn)

        t_dfn = timeit(
            chain(dfn_body, reps), (b, zero), zero, zero, b, reps=reps
        )
        print(f"df update+residual+norm: {t_dfn*1e3:7.3f} ms", flush=True)

    # whole inner cycle
    def cyc_body(hh, r):
        return (run_cycle(hh, r, "v", 2, 2, "rbgs", 2 / 3),)

    t_cyc = timeit(chain(cyc_body, reps), h, b, reps=reps)
    print(f"run_cycle total: {t_cyc*1e3:7.3f} ms", flush=True)
    print(f"sum of parts:    {total*1e3:7.3f} ms", flush=True)

    # whole-solve slope: cycles at two fixed budgets isolates per-cycle
    # cost from the dispatch/readback constant
    import dataclasses as _dc

    def solve_fixed(ncyc):
        c2 = _dc.replace(cfg, cycles=ncyc, threshold=1e-30)
        s2 = type(solver)(h, c2)
        bb = jnp.asarray(rhs_random(gs, seed=3), dtype=jnp.float32)
        s2.solve(bb)  # warm
        t0 = time.perf_counter()
        _, info = s2.solve(bb)
        return time.perf_counter() - t0, info["cycles"]

    t_a, k_a = solve_fixed(4)
    t_b, k_b = solve_fixed(12)
    slope = (t_b - t_a) / (k_b - k_a)
    const = t_a - slope * k_a
    print(
        f"whole-solve slope: {slope*1e3:7.3f} ms/cycle "
        f"(+ {const*1e3:.1f} ms const; {k_a}->{k_b} cycles)",
        flush=True,
    )


if __name__ == "__main__":
    main()
