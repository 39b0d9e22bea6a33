#!/usr/bin/env python
"""Per-level cost breakdown of the V-cycle at 256³ on the real chip.

Times run_cycle on each level suffix (levels k..coarsest); successive
differences = per-level cost.  Also times the jnp smoother at sub-Pallas
sizes to locate XLA-op overhead.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

from openmg_tpu import SolverConfig, setup
from openmg_tpu.core.cycle import run_cycle
from openmg_tpu.core.hierarchy import Hierarchy
from openmg_tpu.ops.smoothers import smooth


def timeit(name, fn, carry0, *args, reps=20):
    @jax.jit
    def f(c, *a):
        return lax.scan(lambda cc, _: (fn(cc, *a), 0.0), c, None,
                        length=reps)[0]
    out = f(carry0, *args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = f(carry0, *args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    shape = (256, 256, 256)
    cfg = SolverConfig(smoother="rbgs", transfer="linear",
                       residual_dtype="doublefloat", cycles=60)
    solver = setup(shape, cfg)
    h = solver.hierarchy
    print("levels:", [s[0] for s in h.stats], flush=True)

    for k in range(len(h.levels) - 1):
        hk = Hierarchy(levels=h.levels[k:], coarse_inv=h.coarse_inv,
                       fine_hi=h.fine_hi, fine_hi_lo=h.fine_hi_lo,
                       stats=h.stats[k:], transfer=h.transfer)
        r = jnp.ones(h.levels[k].grid_shape, jnp.float32)
        timeit(f"sub-cycle from level {k} {h.stats[k][0]}",
               lambda rr, hh: run_cycle(hh, rr, "v", 2, 2, "rbgs", 2/3.),
               r, hk, reps=10)

    # jnp smoother at sub-Pallas sizes
    for k in range(len(h.levels)):
        L = h.levels[k]
        s = L.grid_shape
        x = jnp.zeros(s, jnp.float32)
        b = jnp.ones(s, jnp.float32)
        timeit(f"rbgs x2 smooth at {s}",
               lambda xx, A, ind, bb: smooth("rbgs", A, ind, bb, xx, 2, 2/3.),
               x, L.A, L.inv_diag, b)

    # dense coarse solve
    bc = jnp.ones(h.levels[-1].grid_shape, jnp.float32)
    from openmg_tpu.core.cycle import coarse_solve
    timeit("coarse dense solve",
           lambda bb, hh: coarse_solve(hh, bb) + bb * 0, bc, h)


if __name__ == "__main__":
    main()
