#!/usr/bin/env python
"""Locate the 512³ forced-partition gap (DISTCHIP r4: ratio 1.111).

Times the error cycle from each level suffix, single-device vs the
forced-partitioned pod per-device program, in ONE process — the
per-level differences show which levels carry the dist overhead.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from openmg_tpu import MeshConfig, SolverConfig, setup
from openmg_tpu.core.cycle import run_cycle
from openmg_tpu.core.hierarchy import Hierarchy
from openmg_tpu.parallel.dist import DistributedSolver


def timeit(name, fn, carry0, reps=8):
    @jax.jit
    def f(c):
        return lax.scan(lambda cc, _: (fn(cc), 0.0), c, None, length=reps)[0]

    t0 = time.perf_counter()
    out = f(carry0)
    float(jnp.sum(out))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = f(carry0)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt * 1e3:9.3f} ms   (first {compile_s:6.1f} s)",
          flush=True)
    return dt


def main():
    shape = tuple(int(s) for s in (sys.argv[1:4] or (512, 512, 512)))
    cfg = SolverConfig(smoother="rbgs", transfer="linear",
                       residual_dtype="doublefloat", cycles=60)
    solver = setup(shape, cfg)
    h = solver.hierarchy
    print("levels:", [s[0] for s in h.stats], flush=True)

    results = {}
    for k in range(len(h.levels) - 1):
        hk = Hierarchy(levels=h.levels[k:], coarse_inv=h.coarse_inv,
                       fine_hi=h.fine_hi, fine_hi_lo=h.fine_hi_lo,
                       stats=h.stats[k:], transfer=h.transfer)
        r = jnp.ones(h.levels[k].grid_shape, jnp.float32)
        ts = timeit(
            f"single sub-cycle from L{k} {h.stats[k][0]}",
            lambda rr, hh=hk: run_cycle(hh, rr, "v", 2, 2, "rbgs", 2 / 3.0),
            r,
        )
        sd = DistributedSolver(
            hk, cfg, MeshConfig(n_devices=1, force_partition=True)
        )
        td = timeit(
            f"dist   sub-cycle from L{k} {h.stats[k][0]}",
            lambda rr, s_=sd: s_._cycle(s_.level_data, s_.coarse_inv, rr),
            r,
        )
        results[k] = (ts, td)
        print(f"  -> ratio L{k}+ = {td / ts:.3f}   gap {1e3 * (td - ts):+.2f} ms",
              flush=True)

    print("\nmarginal per-level (suffix differences):", flush=True)
    ks = sorted(results)
    for a, b in zip(ks, ks[1:]):
        ms_s = (results[a][0] - results[b][0]) * 1e3
        ms_d = (results[a][1] - results[b][1]) * 1e3
        print(f"  level {a}: single {ms_s:8.3f} ms   dist {ms_d:8.3f} ms   "
              f"gap {ms_d - ms_s:+8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
