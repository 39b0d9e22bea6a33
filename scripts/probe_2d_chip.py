#!/usr/bin/env python
"""2D smoothing launch-floor probe (VERDICT r4 task 6) — updates the
``fused2d_smoothing`` section of an existing PROBES artifact.

Method: ``lax.fori_loop`` of 2-sweep smoothing calls inside ONE dispatch
(body traced once — a flat chain of 40 half-sweeps segfaulted the local
AOT compile at 1024², exit 139, host memory blowup).  Per fori
iteration the whole-plane fused tier runs ONE kernel (4 stages
in-kernel) vs FOUR per-half-sweep kernels, so the time difference is
three launch floors per iteration — resolvable even at this session's
~23 ms dispatch+sync round trip when loops ≫ 1.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PROBES_r05.json"
    from openmg_tpu import SolverConfig, setup
    from openmg_tpu.ops import fused as fused_mod
    from openmg_tpu.ops.smoothers import smooth

    LOOPS = 100

    def time_loops(op, inv_d, bb, reps=3):
        @jax.jit
        def f(A, ind, b_, x_):
            return lax.fori_loop(
                0, LOOPS,
                lambda i, xx: smooth("rbgs", A, ind, b_, xx, 2, 2 / 3.0),
                x_,
            )

        x_ = jnp.zeros(bb.shape, jnp.float32)
        float(jnp.sum(f(op, inv_d, bb, x_)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            y = f(op, inv_d, bb, x_)
            float(jnp.sum(y))
            best = min(best, time.perf_counter() - t0)
        return best / LOOPS  # seconds per 2-sweep application

    probes_2d = {}
    for n2 in (256, 512, 1024):
        s2d = (n2, n2)
        # NB default max_dense_coarse (full-depth hierarchy): a shallow
        # gridlevels=3 at 1024² leaves a 65k-row coarsest whose dense
        # inverse is 17 GB of host numpy — the "segfault" that was first
        # misdiagnosed as a Mosaic compile failure
        c2 = SolverConfig(smoother="rbgs", transfer="linear",
                          residual_dtype="doublefloat")
        sv2 = setup(s2d, c2)
        L2 = sv2.hierarchy.levels[0]
        b2 = jnp.ones(s2d, jnp.float32)
        t_f = time_loops(L2.A, L2.inv_diag, b2)
        orig2d = fused_mod._fused2d
        try:
            fused_mod._fused2d = lambda *a, **k: None
            t_u = time_loops(L2.A, L2.inv_diag, b2)
        finally:
            fused_mod._fused2d = orig2d
        nnz2 = 5 * n2 * n2 * 2
        probes_2d[f"{n2}x{n2}"] = {
            "method": f"fori_loop x{LOOPS} of 2-sweep smooth, one dispatch",
            "fused_ms_per_2sweeps": t_f * 1e3,
            "unfused_ms_per_2sweeps": t_u * 1e3,
            "speedup": t_u / t_f,
            "fused_nnz_per_s": nnz2 / t_f,
            "whole_plane_tier_engaged": bool(n2 <= 512),
        }
        print(f"2D rbgs x2 at {n2}²: fused {t_f * 1e3:.3f} ms vs per-sweep "
              f"{t_u * 1e3:.3f} ms -> {t_u / t_f:.2f}x "
              f"({nnz2 / t_f:.2e} nnz/s)", flush=True)

    data = json.load(open(out_path)) if os.path.exists(out_path) else {
        "backend": jax.default_backend(), "probes": {}}
    data["probes"]["fused2d_smoothing"] = probes_2d
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"updated {out_path}", flush=True)


if __name__ == "__main__":
    main()
