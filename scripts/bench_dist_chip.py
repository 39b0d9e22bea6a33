#!/usr/bin/env python
"""On-chip benchmark of the distributed fast tier (SURVEY.md §2B T10,
BASELINE north star; VERDICT r3 task 1).

With only ONE real chip attached, ``MeshConfig(force_partition=True)``
marks every level partitioned on a 1-device mesh: ``halo_planes``
degenerates to zero planes with no collective, so the compiled shard_map
program is exactly the per-device pod program — zero-halo Pallas bulk
kernels, boundary-plane epilogues, cornered fix-ups, and the fused
double-float edge-plane repair (parallel/fast.py) — Mosaic-compiled for
real.  Interpreter-mode CI cannot catch Mosaic lowering or VMEM failures
in that program; this script can, and records the dist/single device-time
ratio in ``DISTCHIP_r{N}.json``.

Device time is the chained-solve slope (bench.py's method): N solves with
one host-readback sync amortize the relay dispatch/D2H constant; the
slope (tN − t1)/(N − 1) is pure device+queue time per solve.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=[256, 256, 256])
    ap.add_argument("--transfer", default="linear",
                    choices=["linear", "aggregate"],
                    help="aggregate yields const-only coarse levels — "
                    "A/B isolates the cornered fix-up cost")
    ap.add_argument("--krylov", default="none", choices=["none", "pcg"],
                    help="pcg runs the distributed MG-preconditioned CG "
                    "inner solve (psum dots) in both programs")
    ap.add_argument("--out", type=str, default=None,
                    help="write a JSON artifact here")
    args = ap.parse_args()
    shape = tuple(args.shape)

    import jax
    import jax.numpy as jnp

    from openmg_tpu import MeshConfig, SolverConfig, setup
    from openmg_tpu.models.poisson import rhs_random
    from openmg_tpu.parallel.dist import DistributedSolver

    backend = jax.default_backend()
    print(f"backend: {backend}")
    cfg = SolverConfig(
        smoother="rbgs", transfer=args.transfer,
        residual_dtype="doublefloat", cycles=60, krylov=args.krylov,
    )
    b_np = rhs_random(shape, seed=2)
    b_np = b_np / np.linalg.norm(b_np.ravel())

    print("single-device solve:")
    s1 = setup(shape, cfg)
    b_dev = jax.device_put(jnp.asarray(b_np, jnp.float32))
    _ = float(jnp.sum(b_dev))
    x1, info1 = s1.solve(b_dev)  # warm/compile
    print(f"  cycles={info1['cycles']} converged={info1['converged']} "
          f"wall={info1['solve_time_s'] * 1e3:.1f} ms")

    def slope(run_one, sync):
        """Chained-solve device time: (t4 − t1)/3 with one sync per chain."""
        def run_n(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = run_one()
            sync(out)
            return time.perf_counter() - t0

        run_n(1)  # warm
        t1 = min(run_n(1) for _ in range(2))
        tn = min(run_n(4) for _ in range(2))
        return (tn - t1) / 3, t1

    from openmg_tpu.core.solver import _solve_device

    dev_kwargs = dict(
        limit=cfg.cycles, threshold=float(cfg.threshold),
        pre=cfg.pre_iterations, post=cfg.post_iterations,
        smoother=cfg.smoother, cycle_type=cfg.cycle_type,
        krylov=cfg.krylov, krylov_iters=cfg.krylov_iters, omega=cfg.omega,
        cycle_dtype=jnp.dtype(jnp.float32), df=True,
        exact_terms=s1._exact_terms,
    )
    t_single, wall1 = slope(
        lambda: _solve_device(s1.hierarchy, (b_dev, None), None, **dev_kwargs)[0],
        lambda xp: float(jnp.sum(xp[0])),
    )
    print(f"  device-time: {t_single * 1e3:.1f} ms/solve "
          f"(1-solve wall {wall1 * 1e3:.1f} ms)")

    print("forced-partitioned shard_map solve (the pod per-device program):")
    sd = DistributedSolver(
        s1.hierarchy, cfg, MeshConfig(n_devices=1, force_partition=True)
    )
    assert sd.plan[0] is True, "force_partition must mark the fine level"
    print(f"  plan={sd.plan} kinds={sd.kinds}")
    bd = sd._put_vec(b_dev)
    _ = float(jnp.sum(bd))
    t0 = time.perf_counter()
    xd, infod = sd.solve(bd)  # warm/compile (Mosaic-compiles the fast tier)
    compile_wall = time.perf_counter() - t0
    print(f"  cycles={infod['cycles']} converged={infod['converged']} "
          f"first wall={compile_wall * 1e3:.1f} ms")
    assert infod["converged"], "forced-partitioned solve must converge"
    assert abs(infod["cycles"] - info1["cycles"]) <= 1, (
        infod["cycles"], info1["cycles"])

    bh, bl = sd._put_vec(b_dev), sd._zeros_vec(bd)
    xh0, xl0 = sd._zeros_vec(bd), sd._zeros_vec(bd)
    t_dist, wall1d = slope(
        lambda: sd._solve_loop(
            sd.level_data, sd.coarse_inv, sd.fine_hi, sd.fine_lo,
            bh, bl, xh0, xl0,
        ),
        lambda out: float(jnp.sum(out[0])),
    )
    print(f"  device-time: {t_dist * 1e3:.1f} ms/solve "
          f"(1-solve wall {wall1d * 1e3:.1f} ms)")

    # same-process A/B (chip regimes oscillate between sessions; this
    # ratio is the only number comparable across artifacts)
    ratio = t_dist / t_single
    print(f"ratio dist/single (device-time) = {ratio:.3f}")

    # correctness cross-check on chip: forced-partitioned == single
    diff = float(jnp.max(jnp.abs(xd - x1)))
    print(f"max|x_dist − x_single| = {diff:.2e}")

    record = {
        "shape": list(shape),
        "backend": backend,
        "krylov": args.krylov,
        "single_device_time_s": t_single,
        "dist_forced_device_time_s": t_dist,
        "ratio": ratio,
        "cycles_single": info1["cycles"],
        "cycles_dist": infod["cycles"],
        "converged": bool(infod["converged"]),
        "max_abs_diff": diff,
        "partition_plan": list(sd.plan),
        "kinds": list(sd.kinds),
        "note": (
            "force_partition=True on a 1-device mesh: the shard_map "
            "program is the per-device pod program (Pallas half-sweeps "
            "with in-kernel halo planes + cornered fix-ups + fused df "
            "update/residual with in-kernel halos), Mosaic-compiled on "
            "the real chip; ppermutes degenerate to zero halo planes. "
            "Device time = chained-solve slope; A/B in one process "
            "(chip regimes oscillate). Per-component ratios are <= 1.2 "
            "(measured micro A/B); the residual overall gap is the "
            "single-device-only deep-fusion tier (ops/fused.py: "
            "multi-sweep + transfer-fused kernels), which needs "
            "radius-S halos to distribute."
        ),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {args.out}")
    return 0 if ratio < 1.5 and infod["converged"] else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())
