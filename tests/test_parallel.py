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
from openmg_tpu.parallel.halo import apply_ext, halo_exchange
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
