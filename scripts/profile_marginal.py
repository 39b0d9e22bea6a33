#!/usr/bin/env python
"""Marginal-cost V-cycle profile at 256³ on the real chip.

Standalone component chains over-estimate (Mosaic scheduling differs in
context), so this measures run_cycle with components toggled and takes
differences, plus sub-cycles per starting level and a 0-cycle solve to
isolate the whole-solve constant.
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
    b = jnp.asarray(rhs_random(shape, seed=7), dtype=jnp.float32)

    def cyc(pre, post):
        def body(hh, r):
            return (run_cycle(hh, r, "v", pre, post, "rbgs", 2 / 3),)

        return body

    base = timeit(chain(cyc(2, 2), reps), h, b, reps=reps)
    print(f"cycle pre=2 post=2: {base*1e3:7.3f} ms", flush=True)
    t = timeit(chain(cyc(2, 0), reps), h, b, reps=reps)
    print(f"cycle pre=2 post=0: {t*1e3:7.3f} ms  (post marginal "
          f"{(base-t)*1e3:+.3f})", flush=True)
    t = timeit(chain(cyc(0, 2), reps), h, b, reps=reps)
    print(f"cycle pre=0 post=2: {t*1e3:7.3f} ms  (pre marginal "
          f"{(base-t)*1e3:+.3f})", flush=True)

    # sub-cycles per starting level
    prev = base
    for k in range(1, min(4, len(h.levels) - 1)):
        hk = Hierarchy(levels=h.levels[k:], coarse_inv=h.coarse_inv,
                       fine_hi=h.fine_hi, fine_hi_lo=h.fine_hi_lo,
                       stats=h.stats[k:], transfer=h.transfer)
        rk = jnp.ones(h.levels[k].grid_shape, jnp.float32)

        def sub(hh, rr):
            return (run_cycle(hh, rr, "v", 2, 2, "rbgs", 2 / 3),)

        t = timeit(chain(sub, reps), hk, rk, reps=reps)
        print(f"sub-cycle from L{k} {h.stats[k][0]}: {t*1e3:7.3f} ms  "
              f"(level L{k-1} marginal {(prev-t)*1e3:+.3f})", flush=True)
        prev = t

    # whole-solve constant: a solve that converges instantly (huge threshold)
    import dataclasses as _dc

    c0 = _dc.replace(cfg, threshold=1e30, cycles=100)
    s0 = type(solver)(h, c0)
    bb = jnp.asarray(rhs_random(shape, seed=3), dtype=jnp.float32)
    s0.solve(bb)
    t0 = time.perf_counter()
    _, info0 = s0.solve(bb)
    print(f"0-cycle solve: {(time.perf_counter()-t0)*1e3:7.1f} ms "
          f"(cycles={info0['cycles']})", flush=True)

    c1 = _dc.replace(cfg, threshold=1e-30, cycles=1)
    s1 = type(solver)(h, c1)
    s1.solve(bb)
    t0 = time.perf_counter()
    _, info1 = s1.solve(bb)
    print(f"1-cycle solve: {(time.perf_counter()-t0)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
