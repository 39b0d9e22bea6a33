#!/usr/bin/env python
"""On-chip benchmark: shard_map-wrapped 1-device 256³ solve vs the plain
single-device solve (VERDICT r2 done-bar: within ~1.2×).

Through the relay, ``block_until_ready`` is unreliable — a host readback
is the real sync (CLAUDE.md).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=[256, 256, 256])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    shape = tuple(args.shape)

    import jax
    import jax.numpy as jnp

    from openmg_tpu import MeshConfig, SolverConfig, setup
    from openmg_tpu.models.poisson import rhs_random
    from openmg_tpu.parallel.dist import distributed_setup

    print(f"backend: {jax.default_backend()}")
    cfg = SolverConfig(
        smoother="rbgs", transfer="linear", residual_dtype="doublefloat",
        cycles=60,
    )
    b_np = rhs_random(shape, seed=2)
    b_np = b_np / np.linalg.norm(b_np.ravel())

    def timed_solve(solver, b_dev, label):
        for rep in range(args.reps):
            t0 = time.perf_counter()
            x, info = solver.solve(b_dev)
            _ = float(jnp.sum(x))  # host readback = real sync
            dt = time.perf_counter() - t0
            print(
                f"  {label} rep{rep}: {dt * 1e3:.1f} ms "
                f"cycles={info['cycles']} converged={info['converged']}"
            )
        return dt

    print("single-device solve:")
    s1 = setup(shape, cfg)
    b_dev = jax.device_put(jnp.asarray(b_np, jnp.float32))
    _ = float(jnp.sum(b_dev))
    t_single = timed_solve(s1, b_dev, "single")

    print("shard_map 1-device solve:")
    sd = distributed_setup(shape, cfg, MeshConfig(n_devices=1))
    bd = sd._put_vec(b_dev)
    _ = float(jnp.sum(bd))
    t_dist = timed_solve(sd, bd, "dist(1)")
    print(f"ratio dist/single = {t_dist / t_single:.3f}")


if __name__ == "__main__":
    main()
