#!/usr/bin/env python
"""BSR / ELL-crossover / elasticity-end-to-end probes — updates those
sections of an existing PROBES artifact (split from probes_chip.py so a
failure in one section never loses another's data)."""
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


def chain_time(fn, x0, *args, reps=16):
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


def load(out_path):
    if os.path.exists(out_path):
        return json.load(open(out_path))
    return {"backend": jax.default_backend(), "probes": {}}


def save(out_path, data):
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PROBES_r05.json"
    data = load(out_path)

    import scipy.sparse as sp

    from openmg_tpu import SolverConfig
    from openmg_tpu.core.algebraic import setup_sparse
    from openmg_tpu.models.elasticity import coupled_diffusion, elasticity
    from openmg_tpu.ops import bsr as bsr_mod
    from openmg_tpu.ops import ell as ell_mod
    from openmg_tpu.ops.sparse import bsr_from_scipy, ell_from_scipy

    # ---- BSR kernel vs jnp banded on real vector-PDE operators ----------
    probes_bsr = {}
    for label, kind, B in (
        ("coupled_diffusion_64cubed_B4", "coup64", 4),
        ("elasticity_256x256_B2", "elas", 2),
        ("coupled_diffusion_48cubed_B4", "coup48", 4),
    ):
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
            t_k = chain_time(lambda u, Mm: bsr_mod.spmv_bsr(Mm, u), v, Mb)
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
        data["probes"]["bsr"] = probes_bsr
        save(out_path, data)

    # ---- ELL DIA kernel vs jnp shifted: crossover map --------------------
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
        so = M.slot_offsets
        v = jnp.ones((n,), jnp.float32)
        t_k = chain_time(lambda u, Mm: ell_mod.spmv_ell(Mm, u), v, M)
        t_j = chain_time(
            lambda u, d, so=so: ell_mod.spmv_banded_jnp(d, so, u),
            v, M.data,
        )
        crossover[f"n{n}_H{H}"] = {
            "n": n, "H": H, "pallas_ms": t_k * 1e3, "jnp_ms": t_j * 1e3,
            "pallas_wins": bool(t_k < t_j),
            "prefer_kernel_says": bool(ell_mod.prefer_kernel(M)),
        }
        print(f"ELL crossover n={n} H={H}: pallas {t_k * 1e3:.3f} ms, "
              f"jnp {t_j * 1e3:.3f} ms, heuristic="
              f"{ell_mod.prefer_kernel(M)}", flush=True)
        data["probes"]["ell_crossover"] = crossover
        save(out_path, data)

    # ---- elasticity end-to-end: BSR vs ELL hierarchy solve ---------------
    eshape = (128, 128)
    Ae = elasticity(eshape)
    base = dict(smoother="jacobi", transfer="linear", gridlevels=4,
                max_dense_coarse=4096, cycles=100, threshold=1e-8)
    be = np.random.default_rng(0).standard_normal(Ae.shape[0])
    be /= np.linalg.norm(be)
    res = {}
    for fmt, bsz in (("bsr", 2), ("ell", 1)):
        c = SolverConfig(format=fmt, blocksize=bsz, **base)
        sv = setup_sparse(Ae, eshape, c, dofs=2)
        x, info = sv.solve(be)  # warm
        t0 = time.perf_counter()
        x, info = sv.solve(be)
        dt = time.perf_counter() - t0
        res[fmt] = {"solve_ms": dt * 1e3, "cycles": info["cycles"],
                    "converged": bool(info["converged"])}
        print(f"elasticity 128² end-to-end [{fmt}]: {dt * 1e3:.1f} ms, "
              f"{info['cycles']} cycles", flush=True)
    data["probes"]["elasticity_end_to_end"] = res
    data["note"] = (
        "All probes on-chip; sections may span two processes of the same "
        "build (probes_chip.py + probe_bsr_chip.py + probe_2d_chip.py) — "
        "the jacobi_sweep_256 anchor records each session's regime. "
        "Device times are chained-application slopes with a host-readback "
        "sync."
    )
    save(out_path, data)
    print(f"updated {out_path}", flush=True)


if __name__ == "__main__":
    main()
