"""Distributed layer on the 8-fake-CPU-device mesh (SURVEY.md §4.2-3):
halo exchange, partition plan, and partitioned-vs-single-device parity
(T9/T10/T11/T16)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from openmg_tpu import SolverConfig, setup
from openmg_tpu.core.config import MeshConfig
from openmg_tpu.models.poisson import poisson_stencil, rhs_random
from openmg_tpu.ops.stencil import StencilOperator, apply, shift
from openmg_tpu.parallel.dist import DistributedSolver, distributed_setup, partition_plan
from openmg_tpu.parallel.halo import (
    apply_ext,
    apply_overlapped,
    halo_exchange,
    halo_planes,
)
from openmg_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (fake) devices"
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_partition_plan():
    shapes = [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4)]
    plan = partition_plan(shapes, 8, min_rows_per_device=2)
    # 64/8=8 even ✓; 32/8=4 even ✓; 16/8=2 even ✓; 8/8=1 < 2 ✗; coarsest ✗
    assert plan == (True, True, True, False, False)
    assert partition_plan(shapes, 1) == (False,) * 5
    # once replicated, stays replicated
    plan2 = partition_plan([(8, 8), (64, 64), (32, 32)], 8)
    assert plan2 == (False, False, False)


def test_halo_exchange_matches_global_stencil():
    """shard_map halo SpMV == single-device SpMV, elementwise-identical."""
    shape = (32, 16)
    offsets, coeffs = poisson_stencil(shape, dtype=np.float32)
    x = rhs_random(shape, seed=0).astype(np.float32)
    op = StencilOperator(jnp.asarray(coeffs), offsets)
    expected = np.asarray(apply(op, jnp.asarray(x)))

    mesh = make_mesh()
    n = mesh.devices.size

    def local_spmv(c, v):
        v_ext = halo_exchange(v, "x", n)
        return apply_ext(StencilOperator(c, offsets), v_ext)

    f = jax.jit(
        jax.shard_map(
            local_spmv,
            mesh=mesh,
            in_specs=(P(None, "x"), P("x")),
            out_specs=P("x"),
        )
    )
    got = np.asarray(f(jnp.asarray(coeffs), jnp.asarray(x)))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("exclude_diag", [False, True])
@pytest.mark.parametrize("constant", [False, True])
def test_overlapped_apply_matches_plain(exclude_diag, constant):
    """apply_overlapped == halo_exchange + apply_ext to fp roundoff (the
    halo terms are summed last instead of in offset order) — for both
    varying and constant operators (T10 overlap invariant)."""
    shape = (32, 16)
    offsets, coeffs = poisson_stencil(shape, dtype=np.float32)
    x = rhs_random(shape, seed=3).astype(np.float32)
    mesh = make_mesh()
    n = mesh.devices.size
    mid = tuple(s // 2 for s in shape)  # interior point: true stencil values
    vals = jnp.asarray([coeffs[k][mid] for k in range(len(offsets))])

    def make_op(c, local_shape):
        if constant:
            return StencilOperator(None, offsets, vals, tuple(local_shape))
        return StencilOperator(c, offsets)

    def plain(c, v):
        return apply_ext(make_op(c, v.shape), halo_exchange(v, "x", n), exclude_diag)

    def overlapped(c, v):
        lower, upper = halo_planes(v, "x", n)
        return apply_overlapped(make_op(c, v.shape), v, lower, upper, exclude_diag)

    specs = dict(in_specs=(P(None, "x"), P("x")), out_specs=P("x"))
    f_plain = jax.jit(jax.shard_map(plain, mesh=mesh, **specs))
    f_over = jax.jit(jax.shard_map(overlapped, mesh=mesh, **specs))
    a = np.asarray(f_plain(jnp.asarray(coeffs), jnp.asarray(x)))
    o = np.asarray(f_over(jnp.asarray(coeffs), jnp.asarray(x)))
    np.testing.assert_allclose(o, a, rtol=1e-6, atol=1e-6)
    if constant and not exclude_diag:
        # constant-op zero-truncation must also match the global stencil
        op_full = StencilOperator(None, offsets, vals, shape)
        ref = np.asarray(apply(op_full, jnp.asarray(x)))
        np.testing.assert_allclose(o, ref, rtol=1e-6, atol=1e-6)


def test_overlapped_solve_matches_reference_path():
    """Full distributed solve with overlap on == off (same trajectory)."""
    shape = (64, 32)
    cfg = SolverConfig(
        smoother="rbgs",
        transfer="linear",
        residual_dtype="doublefloat",
        cycles=40,
        gridlevels=3,
        max_dense_coarse=4096,
        threshold=1e-9,
    )
    b = rhs_random(shape, seed=4)
    single = setup(shape, cfg)
    d_over = DistributedSolver(
        single.hierarchy, cfg, MeshConfig(n_devices=8, overlap_halo=True)
    )
    d_ref = DistributedSolver(
        single.hierarchy, cfg, MeshConfig(n_devices=8, overlap_halo=False)
    )
    x_o, info_o = d_over.solve(b)
    x_r, info_r = d_ref.solve(b)
    assert info_o["converged"] and info_r["converged"]
    assert abs(info_o["cycles"] - info_r["cycles"]) <= 1
    np.testing.assert_allclose(
        np.asarray(x_o), np.asarray(x_r), rtol=1e-8, atol=1e-10
    )


@pytest.mark.parametrize(
    "shape,transfer,smoother",
    [
        ((64,), "aggregate", "jacobi"),
        ((64, 32), "linear", "rbgs"),
        ((32, 16, 16), "linear", "rbgs"),
        ((16, 16), "linear", "jacobi"),
    ],
)
def test_distributed_matches_single_device(shape, transfer, smoother):
    """Partitioned solve == single-device solve: same cycle count and
    near-identical residual trajectory (norm reduction order differs)."""
    cfg = SolverConfig(
        smoother=smoother,
        transfer=transfer,
        residual_dtype="doublefloat",
        cycles=60,
        gridlevels=3,
        max_dense_coarse=4096,
        threshold=1e-9,
    )
    b = rhs_random(shape, seed=1)
    single = setup(shape, cfg)
    x1, info1 = single.solve(b)
    dist = DistributedSolver(single.hierarchy, cfg, MeshConfig(n_devices=8))
    x8, info8 = dist.solve(b)
    assert info8["n_devices"] == 8
    assert info8["partition_plan"][0] is True
    assert info8["converged"] == info1["converged"]
    assert abs(info8["cycles"] - info1["cycles"]) <= 1
    np.testing.assert_allclose(
        np.asarray(x8), np.asarray(x1), rtol=1e-8, atol=1e-10
    )
    n = min(len(info1["residual_norms"]), len(info8["residual_norms"]))
    # norms differ only by fp reduction order; near the 1e-11 convergence
    # floor the relative difference grows, hence the atol term
    np.testing.assert_allclose(
        info1["residual_norms"][:n],
        info8["residual_norms"][:n],
        rtol=1e-4,
        atol=1e-12,
    )


def test_distributed_setup_convenience():
    shape = (32, 32)
    cfg = SolverConfig(transfer="linear", cycles=60, gridlevels=3,
                       max_dense_coarse=4096)
    solver = distributed_setup(shape, cfg, MeshConfig(n_devices=4))
    b = rhs_random(shape, seed=2)
    x, info = solver.solve(b)
    assert info["converged"]
    assert info["n_devices"] == 4
    assert info["final_norm"] < 1e-10


def test_distributed_rejects_indivisible():
    cfg = SolverConfig(residual_dtype="doublefloat", gridlevels=2,
                       max_dense_coarse=4096)
    single = setup((12, 12), cfg)  # 12 % 8 != 0
    with pytest.raises(ValueError):
        DistributedSolver(single.hierarchy, cfg, MeshConfig(n_devices=8))


def test_distributed_device_loop_matches_host_loop():
    """The one-dispatch while_loop solve == the per-cycle host loop."""
    import dataclasses

    shape = (32, 16)
    cfg = SolverConfig(
        transfer="linear", cycles=60, gridlevels=3, max_dense_coarse=4096
    )
    b = rhs_random(shape, seed=7)
    dev = distributed_setup(shape, cfg, MeshConfig(n_devices=4))
    x_d, info_d = dev.solve(b)
    assert info_d["outer_loop"] == "device"
    host = distributed_setup(
        shape,
        dataclasses.replace(cfg, outer_loop="host"),
        MeshConfig(n_devices=4),
    )
    x_h, info_h = host.solve(b)
    assert info_h.get("outer_loop", "host") == "host"
    assert info_d["cycles"] == info_h["cycles"]
    assert info_d["converged"] == info_h["converged"]
    np.testing.assert_allclose(np.asarray(x_d), np.asarray(x_h), rtol=0, atol=0)
    np.testing.assert_allclose(
        info_d["residual_norms"], info_h["residual_norms"], rtol=1e-6
    )
