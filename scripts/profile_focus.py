#!/usr/bin/env python
"""Focused V-cycle breakdown at 256³ on the real chip (few programs, so
relay compile time stays bounded): fine-level components, the coarse
remainder (sub-cycle from level 1), run_cycle, and the whole-solve slope.
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
from openmg_tpu.core.cycle import run_cycle
from openmg_tpu.core.hierarchy import Hierarchy
from openmg_tpu.models.poisson import rhs_random
from openmg_tpu.ops import fused, kernels
from openmg_tpu.ops.smoothers import smooth
from openmg_tpu.ops.transfer import prolong, restrict


def timeit(fn, *args, reps):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / reps


def chain(body, reps):
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
    L0 = h.levels[0]
    gs = L0.grid_shape
    b = jnp.asarray(rhs_random(gs, seed=7), dtype=jnp.float32)

    def pre_body(L, x, r):
        return fused.presmooth_residual_fused("rbgs", L.A, r, 2, 2 / 3)

    t = timeit(chain(pre_body, reps), L0, b, b, reps=reps)
    print(f"L0 pre+res fused: {t*1e3:7.3f} ms", flush=True)

    def post_body(ctx, x):
        L, bb = ctx
        return (smooth("rbgs", L.A, L.inv_diag, bb, x, 2, 2 / 3),)

    t = timeit(chain(post_body, reps), (L0, b), b, reps=reps)
    print(f"L0 post-smooth:   {t*1e3:7.3f} ms", flush=True)

    def rp_body(ctx, x):
        c = restrict(x, h.transfer)
        return (x + 1e-6 * prolong(c, gs, h.transfer),)

    t = timeit(chain(rp_body, reps), None, b, reps=reps)
    print(f"L0 R+P pair:      {t*1e3:7.3f} ms", flush=True)

    from openmg_tpu.core.solver import exact_residual_terms

    terms = exact_residual_terms(h)
    offs = h.fine_hi.offsets

    def dfn_body(ctx, xh, xl, e):
        bb, bl = ctx
        xh2, xl2, r2 = kernels.df_update_residual_const_3d(
            offs, terms, xh, xl, e, bb, bl
        )
        rn = jnp.sqrt(jnp.sum(r2 * r2))
        return xh2, xl2, r2 * (1.0 + 0.0 * rn)

    zero = jnp.zeros_like(b)
    t = timeit(chain(dfn_body, reps), (b, zero), zero, zero, b, reps=reps)
    print(f"df upd+res+norm:  {t*1e3:7.3f} ms", flush=True)

    # coarse remainder: sub-cycle starting at level 1
    h1 = Hierarchy(levels=h.levels[1:], coarse_inv=h.coarse_inv,
                   fine_hi=h.fine_hi, fine_hi_lo=h.fine_hi_lo,
                   stats=h.stats[1:], transfer=h.transfer)
    r1 = jnp.ones(h.levels[1].grid_shape, jnp.float32)

    def sub_body(hh, rr):
        return (run_cycle(hh, rr, "v", 2, 2, "rbgs", 2 / 3),)

    t = timeit(chain(sub_body, reps), h1, r1, reps=reps)
    print(f"sub-cycle L1+:    {t*1e3:7.3f} ms", flush=True)

    t = timeit(chain(sub_body, reps), h, b, reps=reps)
    print(f"run_cycle total:  {t*1e3:7.3f} ms", flush=True)

    import dataclasses as _dc

    def solve_fixed(ncyc):
        c2 = _dc.replace(cfg, cycles=ncyc, threshold=1e-30)
        s2 = type(solver)(h, c2)
        bb = jnp.asarray(rhs_random(gs, seed=3), dtype=jnp.float32)
        s2.solve(bb)
        t0 = time.perf_counter()
        _, info = s2.solve(bb)
        return time.perf_counter() - t0, info["cycles"]

    t_a, k_a = solve_fixed(4)
    t_b, k_b = solve_fixed(12)
    slope = (t_b - t_a) / (k_b - k_a)
    const = t_a - slope * k_a
    print(f"whole-solve slope: {slope*1e3:7.3f} ms/cycle "
          f"(+ {const*1e3:.1f} ms const)", flush=True)


if __name__ == "__main__":
    main()
