#!/usr/bin/env python
"""Is the smoother kernel HBM-bound or VPU-bound?

Times, with identical slab/BlockSpec structure at 256³ f32:
  copy   : out = x                 (2 streams)
  axpy   : out = x + b             (3 streams — the smoother's traffic)
  shifts : jacobi minus masks/rolls (z-neighbors only)
  jacobi : the real fused kernel
The gap between axpy and jacobi is VPU compute; the gap between axpy and
the 3-stream roofline (3·64 MB / 819 GB/s ≈ 0.235 ms) is DMA efficiency.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmg_tpu.ops import kernels as K


def timed(name, fn, x, b, reps=50):
    f = jax.jit(lambda xx, bb: lax.scan(
        lambda c, _: (fn(c, bb), 0.0), xx, None, length=reps)[0])
    float(jnp.sum(f(x, b)))
    t0 = time.perf_counter()
    float(jnp.sum(f(x, b)))
    dt = (time.perf_counter() - t0) / reps
    gb = x.size * x.dtype.itemsize / 1e9
    print(f"{name:28s} {dt*1e3:7.3f} ms   ({3*gb/dt:6.0f} GB/s at 3 streams)",
          flush=True)


def _mk(mode):
    def kern(t_ref, b_ref, o_ref):
        t = t_ref[...]
        if mode == "copy":
            o_ref[...] = t
        elif mode == "axpy":
            o_ref[...] = t + b_ref[...]
        elif mode == "zonly":
            # z-neighbor adds only: concat shifts, no rolls/masks
            tz = t.shape[0]
            z = jnp.zeros((1,) + t.shape[1:], t.dtype)
            up = jnp.concatenate([t[1:], z], axis=0)
            dn = jnp.concatenate([z, t[:-1]], axis=0)
            acc = 6.0 * t - up - dn
            o_ref[...] = t + (2.0 / 3.0 / 6.0) * (b_ref[...] - acc)
    def run(x, b):
        nz, ny, nx = x.shape
        tz = 8
        return pl.pallas_call(
            kern,
            grid=(nz // tz,),
            in_specs=[
                pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, b)
    return run


def main():
    shape = (256, 256, 256)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, dtype=jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), shape, dtype=jnp.float32)
    float(jnp.sum(x) + jnp.sum(b))

    timed("copy (2 streams)", _mk("copy"), x, b)
    timed("axpy (3 streams)", _mk("axpy"), x, b)
    timed("jacobi z-only (no rolls)", _mk("zonly"), x, b)

    offs = ((0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
            (0, 0, 1), (0, 0, -1))
    vals = jnp.asarray([6.0, -1, -1, -1, -1, -1, -1], dtype=jnp.float32)
    timed("jacobi full (7pt)",
          lambda xx, bb: K.jacobi_const_3d(vals, offs, bb, xx, 1, 2.0 / 3.0),
          x, b)


if __name__ == "__main__":
    main()
