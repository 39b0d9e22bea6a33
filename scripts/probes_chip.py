#!/usr/bin/env python
"""One-session on-chip probes backing README's performance table
(VERDICT r4 task 8: every number traces to a committed artifact).

Measures, all in ONE process (chip regimes oscillate across sessions —
CLAUDE.md):

* the 256³ Jacobi smoother sweep (the session's regime anchor),
* ELL DIA-kernel SpMV at 256³ Poisson,
* batched `solve_many` at (64, 64, 128) K=8 vs the same-process scalar,
* blocked-band BSR SpMV vs the XLA einsum path on a synthetic (64³, B=4)
  operator AND on the real vector-PDE operators (2D elasticity B=2 /
  coupled reaction–diffusion B=4 — models/elasticity.py), giving the BSR
  kernel an end-to-end win-case artifact (VERDICT r4 task 4).

Writes ``PROBES_r{N}.json``.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def chain_time(fn, x0, *args, reps=24):
    """Chained-application device time per call (one readback sync).

    Extra ``args`` are passed to ``fn`` as jit ARGUMENTS — closing over
    big device arrays inlines them as HLO constants and overflows the
    remote-compile relay (HTTP 413; CLAUDE.md)."""
    @jax.jit
    def run(c, *a):
        return lax.scan(
            lambda cc, _: (fn(cc, *a), 0.0), c, None, length=reps
        )[0]

    out = run(x0, *args)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x0, *args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PROBES_r05.json"
    record = {"backend": jax.default_backend(), "probes": {}}

    def flush_record():
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1)

    from openmg_tpu import SolverConfig, setup
    from openmg_tpu.models.poisson import poisson, rhs_random
    from openmg_tpu.ops.smoothers import smooth

    # ---- regime anchor: 256³ fused jacobi sweep (bench.py's metric:
    # 50 fused sweeps per dispatch, per-sweep slope) -----------------------
    shape = (256, 256, 256)
    cfg = SolverConfig(smoother="rbgs", transfer="linear",
                       residual_dtype="doublefloat", cycles=60)
    solver = setup(shape, cfg)
    L0 = solver.hierarchy.levels[0]
    b = jnp.ones(shape, jnp.float32)
    t_sweep = chain_time(
        lambda x, A, ind, bb: smooth("jacobi", A, ind, bb, x, 50, 2 / 3.0),
        jnp.zeros(shape, jnp.float32),
        L0.A, L0.inv_diag, b,
        reps=1,
    ) / 50
    nnz = 7 * np.prod(shape)
    record["probes"]["jacobi_sweep_256"] = {
        "ms": t_sweep * 1e3,
        "nnz_per_s": nnz / t_sweep,
        "roofline_fraction_vs_8e10": nnz / t_sweep / 8e10,
    }
    print(f"jacobi sweep 256³: {t_sweep * 1e3:.3f} ms = "
          f"{nnz / t_sweep:.3e} nnz/s", flush=True)
    flush_record()

    # ---- ELL DIA kernel at 256³ ------------------------------------------
    from openmg_tpu.models.poisson import poisson_ell_device
    from openmg_tpu.ops.sparse import spmv

    M = poisson_ell_device(shape)
    x0 = jnp.ones((M.shape[0],), jnp.float32)
    t_ell = chain_time(lambda v, Mm: spmv(Mm, v), x0, M)
    record["probes"]["ell_spmv_256"] = {
        "ms": t_ell * 1e3,
        "nnz_per_s": M.nnz / t_ell,
        "roofline_fraction_vs_8e10": M.nnz / t_ell / 8e10,
    }
    print(f"ELL SpMV 256³: {t_ell * 1e3:.3f} ms = {M.nnz / t_ell:.3e} nnz/s",
          flush=True)
    flush_record()

    # ---- solve_many vs scalar at (64, 64, 128) K=8 -----------------------
    sshape = (64, 64, 128)
    scfg = SolverConfig(smoother="rbgs", transfer="linear",
                        residual_dtype="doublefloat", cycles=60)
    s2 = setup(sshape, scfg)
    K = 8
    bs_np = np.stack([
        rhs_random(sshape, seed=i).reshape(-1) for i in range(K)
    ])
    bs_np /= np.linalg.norm(bs_np, axis=1, keepdims=True)
    bs = jax.device_put(
        jnp.asarray(bs_np.reshape(K, *sshape), jnp.float32))
    b1 = bs[0]
    _ = float(jnp.sum(bs))
    # warm both programs + their sync reductions (r4 traps)
    xw, _ = s2.solve(b1)
    _ = float(jnp.sum(xw))
    xm, _ = s2.solve_many(bs)
    _ = float(jnp.sum(xm))
    t0 = time.perf_counter()
    xs, _ = s2.solve(b1)
    _ = float(jnp.sum(xs))
    t_scalar = time.perf_counter() - t0
    t0 = time.perf_counter()
    xm, _ = s2.solve_many(bs)
    _ = float(jnp.sum(xm))
    t_batch = time.perf_counter() - t0
    record["probes"]["solve_many_64_64_128_K8"] = {
        "scalar_ms": t_scalar * 1e3,
        "batch_ms": t_batch * 1e3,
        "per_rhs_speedup": t_scalar * K / t_batch,
    }
    print(f"solve_many K=8: batch {t_batch * 1e3:.1f} ms vs scalar "
          f"{t_scalar * 1e3:.1f} ms -> {t_scalar * K / t_batch:.2f}x/rhs",
          flush=True)
    flush_record()

    # ---- 2D tiers: whole-plane fused vs per-half-sweep -------------------
    # (VERDICT r4 task 6.)  The scan-per-rep method has a ~1 ms/iteration
    # floor on this backend (measured: 256² and 512², fused or not, all
    # timed 1.02 ms/rep), so this uses bench.py's method instead: MANY
    # smoothing iterations per dispatch — the fused path runs them all in
    # ONE kernel, the per-sweep path in 2·iters kernels, so the
    # difference isolates the launch floor the fusion removes.
    from openmg_tpu.ops import fused as fused_mod

    def time_sweeps(op, inv_d, bb, iters, reps=3):
        f = jax.jit(
            lambda A, ind, b_, x_: smooth(
                "rbgs", A, ind, b_, x_, iters, 2 / 3.0
            )
        )
        x_ = jnp.zeros(bb.shape, jnp.float32)
        float(jnp.sum(f(op, inv_d, bb, x_)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            y = f(op, inv_d, bb, x_)
            float(jnp.sum(y))
            best = min(best, time.perf_counter() - t0)
        return best

    probes_2d = {}
    for n2 in (256, 512, 1024):
        try:
            s2d = (n2, n2)
            c2 = SolverConfig(smoother="rbgs", transfer="linear",
                              residual_dtype="doublefloat", gridlevels=3,
                              max_dense_coarse=1 << 22)
            sv2 = setup(s2d, c2)
            L2 = sv2.hierarchy.levels[0]
            b2 = jnp.ones(s2d, jnp.float32)
            iters = 20
            t_f = time_sweeps(L2.A, L2.inv_diag, b2, iters)
            orig2d = fused_mod._fused2d
            try:
                fused_mod._fused2d = lambda *a, **k: None
                t_u = time_sweeps(L2.A, L2.inv_diag, b2, iters)
            finally:
                fused_mod._fused2d = orig2d
            nnz2 = 5 * n2 * n2 * iters
            probes_2d[f"{n2}x{n2}"] = {
                "iters_per_dispatch": iters,
                "fused_ms": t_f * 1e3,
                "unfused_ms": t_u * 1e3,
                "speedup": t_u / t_f,
                "fused_nnz_per_s": nnz2 / t_f,
            }
            print(f"2D rbgs x{iters} at {n2}²: fused {t_f * 1e3:.2f} ms vs "
                  f"per-sweep {t_u * 1e3:.2f} ms -> {t_u / t_f:.2f}x "
                  f"({nnz2 / t_f:.2e} nnz/s)", flush=True)
        except Exception as e:  # record partial results, never lose the run
            probes_2d[f"{n2}x{n2}"] = {"error": repr(e)[:300]}
            print(f"2D probe at {n2}² failed: {e!r}", flush=True)
        record["probes"]["fused2d_smoothing"] = probes_2d
        flush_record()

    # ---- BSR kernel vs einsum: synthetic + real vector-PDE ---------------
    from openmg_tpu.ops import bsr as bsr_mod
    from openmg_tpu.ops.sparse import bsr_from_scipy

    probes_bsr = {}
    for label, kind, B in (
        ("coupled_diffusion_64cubed_B4", "coup64", 4),
        ("elasticity_256x256_B2", "elas", 2),
        ("coupled_diffusion_48cubed_B4", "coup48", 4),
    ):
        from openmg_tpu.models.elasticity import coupled_diffusion, elasticity
        if kind == "coup64":
            As = coupled_diffusion((64, 64, 64), ndof=B, seed=1)
        elif kind == "elas":
            As = elasticity((256, 256))
        else:
            As = coupled_diffusion((48, 48, 48), ndof=B)
        Mb = bsr_from_scipy(As, blocksize=(B, B))
        v = jnp.ones((Mb.shape[0],), jnp.float32)
        entry = {"n": Mb.shape[0], "kb": Mb.kb, "nnz": Mb.nnz,
                 "banded": Mb.slot_offsets is not None,
                 "pallas_supported": bsr_mod.supports(Mb)}
        if bsr_mod.supports(Mb):
            t_k = chain_time(
                lambda u, Mm: bsr_mod.spmv_bsr(Mm, u), v, Mb
            )
            t_j = chain_time(
                lambda u, Mm: bsr_mod.spmv_banded_jnp(Mm, u), v, Mb
            )
            entry.update({
                "pallas_ms": t_k * 1e3, "jnp_banded_ms": t_j * 1e3,
                "pallas_nnz_per_s": Mb.nnz / t_k,
                "speedup_vs_jnp": t_j / t_k,
            })
            print(f"BSR {label}: pallas {t_k * 1e3:.3f} ms "
                  f"({Mb.nnz / t_k:.3e} nnz/s), jnp {t_j * 1e3:.3f} ms "
                  f"-> {t_j / t_k:.2f}x", flush=True)
        probes_bsr[label] = entry
    record["probes"]["bsr"] = probes_bsr
    flush_record()

    # ---- ELL DIA kernel vs jnp shifted-slices: crossover map -------------
    # (VERDICT r4 weak #5: the prefer_kernel heuristic was trusted beyond
    # one measured point — this sweeps band width H and size n)
    from openmg_tpu.ops import ell as ell_mod
    from openmg_tpu.ops.sparse import ell_from_scipy
    import scipy.sparse as sp

    def banded(n, H):
        offs = [-H, -1, 0, 1, H] if H > 1 else [-2, -1, 0, 1, 2]
        vals = [-1.0, -2.0, 6.5, -2.0, -1.0]
        return sp.diags(vals, offsets=offs, shape=(n, n), format="csr")

    crossover = {}
    for n, H in ((1 << 20, 2), (1 << 22, 2), (1 << 20, 1024),
                 (1 << 22, 1024), (1 << 21, 1 << 14), (1 << 24, 1 << 16)):
        M = ell_from_scipy(banded(n, H))
        if M.slot_offsets is None or not ell_mod.supports(M):
            continue
        v = jnp.ones((n,), jnp.float32)
        so = M.slot_offsets
        t_k = chain_time(
            lambda u, Mm: ell_mod.spmv_ell(Mm, u), v, M, reps=16
        )
        t_j = chain_time(
            lambda u, d, so=so: ell_mod.spmv_banded_jnp(d, so, u),
            v, M.data, reps=16,
        )
        key = f"n{n}_H{H}"
        crossover[key] = {
            "n": n, "H": H, "pallas_ms": t_k * 1e3, "jnp_ms": t_j * 1e3,
            "pallas_wins": t_k < t_j,
            "prefer_kernel_says": bool(ell_mod.prefer_kernel(M)),
        }
        print(f"ELL crossover n={n} H={H}: pallas {t_k * 1e3:.3f} ms, "
              f"jnp {t_j * 1e3:.3f} ms, heuristic="
              f"{ell_mod.prefer_kernel(M)}", flush=True)
    record["probes"]["ell_crossover"] = crossover
    flush_record()

    # ---- elasticity end-to-end: BSR vs ELL hierarchy solve ---------------
    from openmg_tpu.core.algebraic import setup_sparse
    from openmg_tpu.models.elasticity import elasticity

    eshape = (128, 128)
    Ae = elasticity(eshape)
    base = dict(smoother="jacobi", transfer="linear", gridlevels=4,
                max_dense_coarse=4096, cycles=100, threshold=1e-8)
    be = np.random.default_rng(0).standard_normal(Ae.shape[0])
    be /= np.linalg.norm(be)
    res = {}
    for fmt, bsz in (("bsr", 2), ("ell", 0)):
        c = SolverConfig(format=fmt, blocksize=max(bsz, 1), **base)
        sv = setup_sparse(Ae, eshape, c, dofs=2)
        x, info = sv.solve(be)  # warm
        t0 = time.perf_counter()
        x, info = sv.solve(be)
        dt = time.perf_counter() - t0
        res[fmt] = {"solve_ms": dt * 1e3, "cycles": info["cycles"],
                    "converged": bool(info["converged"])}
        print(f"elasticity 128² end-to-end [{fmt}]: {dt * 1e3:.1f} ms, "
              f"{info['cycles']} cycles", flush=True)
    record["probes"]["elasticity_end_to_end"] = res
    flush_record()

    record["note"] = (
        "All probes in ONE process (chip regimes oscillate between "
        "sessions; see CLAUDE.md). jacobi_sweep is the session's regime "
        "anchor. Device times are chained-application slopes with a "
        "host-readback sync."
    )
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
