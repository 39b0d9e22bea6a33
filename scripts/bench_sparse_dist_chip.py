"""On-chip validation + A/B for the distributed general-sparse engine
(parallel/sparse_dist.py), mirroring scripts/bench_dist_chip.py's method:
``MeshConfig(force_partition=True)`` on the 1-device mesh compiles the
exact per-device pod program (halo slabs degenerate to zeros, gathers to
identity), so the single chip can compile-check and time the partitioned
program against the replicated one IN THE SAME PROCESS (chip regimes
oscillate between sessions — CLAUDE.md; never compare across processes).

Also micro-A/Bs the engine's gather-free jnp banded SpMV
(``_spmv_banded_full``: zero-pad + per-slot static shifted slices) against
the Pallas DIA kernel (``ops/ell.py::spmv_ell``) at the same size — the
two implementations of the same slot-offset structure.

Writes SPARSEDIST_r04.json.  Run ON THE TPU (no CPU forcing).
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(x):
    # block_until_ready does not reliably block through the axon relay; a
    # host readback is the real sync (CLAUDE.md)
    return float(jnp.sum(x))


def pentadiag(n):
    return sp.diags(
        [-1.0, -2.0, 6.5, -2.0, -1.0],
        offsets=[-2, -1, 0, 1, 2],
        shape=(n, n),
        format="csr",
    )


def timed_solves(solver, b_dev, reps=3):
    """Warm once, then time back-to-back device-native solves (synced)."""
    x, info = solver.solve(b_dev)  # warm/compile
    sync(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x, info = solver.solve(b_dev)
    sync(x)
    dt = (time.perf_counter() - t0) / reps
    return dt, info


def main():
    from openmg_tpu import SolverConfig, setup_sparse_distributed
    from openmg_tpu.core.algebraic import setup_sparse
    from openmg_tpu.core.config import MeshConfig

    out = {"runs": [], "backend": str(jax.devices()[0])}

    for name, A, n in [
        ("pentadiag-4M", pentadiag(1 << 22), 1 << 22),
    ]:
        log(f"== {name}: setup ==")
        cfg = SolverConfig(
            threshold=1e-10, cycles=60, format="ell",
            residual_dtype="doublefloat", transfer="linear",
        )
        t0 = time.perf_counter()
        s_repl = setup_sparse_distributed(
            A, (n,), cfg, MeshConfig(n_devices=1)
        )
        t_setup = time.perf_counter() - t0
        s_part = setup_sparse_distributed(
            A, (n,), cfg, MeshConfig(n_devices=1, force_partition=True)
        )
        log(f"setup {t_setup:.1f}s; plans repl={s_repl.plan} "
            f"part={s_part.plan}")

        rng = np.random.default_rng(0)
        b = rng.standard_normal(n)
        b /= np.linalg.norm(b)
        b_dev = jax.device_put(jnp.asarray(b, jnp.float32))
        sync(b_dev)

        t_repl, i_repl = timed_solves(s_repl, b_dev)
        t_part, i_part = timed_solves(s_part, b_dev)
        ratio = t_part / t_repl
        log(f"replicated: {t_repl*1e3:.1f} ms/solve "
            f"({i_repl['cycles']} cycles, conv={i_repl['converged']})")
        log(f"force-partitioned: {t_part*1e3:.1f} ms/solve "
            f"({i_part['cycles']} cycles, conv={i_part['converged']}) "
            f"ratio {ratio:.3f}")

        # single-device engine, device-native rhs (same-process A/B)
        s_single = setup_sparse(A, (n,), cfg)
        t_single, i_s = timed_solves(s_single, b_dev)
        log(f"AlgebraicSolver (device-native rhs): {t_single*1e3:.1f} ms "
            f"({i_s['cycles']} cycles)")

        out["runs"].append({
            "case": name,
            "n": n,
            "gridlevels": i_repl["gridlevels"],
            "repl_wall_s": t_repl,
            "part_wall_s": t_part,
            "ratio_part_over_repl": ratio,
            "cycles": [i_repl["cycles"], i_part["cycles"]],
            "converged": [i_repl["converged"], i_part["converged"]],
            "single_engine_devnative_wall_s": t_single,
            "partition_plan_forced": list(s_part.plan),
        })

    # ---- micro A/B: jnp banded SpMV vs Pallas DIA kernel --------------
    log("== micro: jnp shifted-slice banded SpMV vs Pallas DIA ==")
    from openmg_tpu.ops.ell import spmv_ell, supports
    from openmg_tpu.ops.sparse import ell_from_scipy
    from openmg_tpu.parallel.sparse_dist import _spmv_banded_full

    n = 1 << 22
    M = ell_from_scipy(pentadiag(n), dtype=np.float32)
    assert M.slot_offsets is not None and supports(M)
    H = max(abs(d) for d in M.slot_offsets)
    x = jax.device_put(jnp.asarray(
        np.random.default_rng(1).standard_normal(n), jnp.float32))

    jnp_prog = jax.jit(
        lambda dat, v: _spmv_banded_full(dat, M.slot_offsets, H, v)
    )
    pallas_prog = jax.jit(lambda Mv, v: spmv_ell(Mv, v))

    y1 = jnp_prog(M.data, x); sync(y1)
    y2 = pallas_prog(M, x); sync(y2)
    err = float(jnp.max(jnp.abs(y1 - y2)))
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        y1 = jnp_prog(M.data, x)
    sync(y1)
    t_jnp = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        y2 = pallas_prog(M, x)
    sync(y2)
    t_pal = (time.perf_counter() - t0) / reps
    nnz = M.nnz
    log(f"jnp banded: {t_jnp*1e3:.3f} ms = {nnz/t_jnp:.3e} nnz/s; "
        f"pallas DIA: {t_pal*1e3:.3f} ms = {nnz/t_pal:.3e} nnz/s; "
        f"max|diff|={err:.2e}")
    out["spmv_micro"] = {
        "n": n, "nnz": nnz, "max_abs_diff": err,
        "jnp_banded_s": t_jnp, "pallas_dia_s": t_pal,
        "jnp_nnz_per_s": nnz / t_jnp, "pallas_nnz_per_s": nnz / t_pal,
    }

    with open("SPARSEDIST_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote SPARSEDIST_r04.json")


if __name__ == "__main__":
    main()
