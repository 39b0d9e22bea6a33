#!/usr/bin/env python
"""Tour of the public API (reference-parity surface + native surface).

Every entry point of the reference maps onto one of these calls
(SURVEY.md R7 / §2B T14); run this file to see them all work end to end.
"""

import numpy as np

from openmg_tpu import SolverConfig, mg_solve, setup, solve
from openmg_tpu.models.poisson import poisson, rhs_random
from openmg_tpu.utils.observe import solve_report

shape = (64, 64)
b = rhs_random(shape, seed=0)

# 1. reference-compatible driver: mg_solve(A, b, parameters) --------------
A = poisson(shape)  # scipy CSR, same matrices as the reference's poisson()
parameters = {
    "problemshape": shape,
    "gridlevels": 4,
    "iterations": 2,  # pre-smoothing sweeps (reference vocabulary)
    "cycles": 400,  # the reference's aggregation transfer converges slowly
    "threshold": 1e-10,
    "verbose": False,
}
x, info = mg_solve(A, b, parameters)
print(f"mg_solve:     {info['cycles']} cycles, ‖r‖ = {info['final_norm']:.2e}")

# 2. one-shot native API ---------------------------------------------------
x, info = solve(shape, b, SolverConfig(smoother="rbgs", transfer="linear"))
print(f"solve():      {info['cycles']} cycles, ‖r‖ = {info['final_norm']:.2e}")

# 3. build once, solve many right-hand sides ------------------------------
solver = setup(shape, SolverConfig(smoother="rbgs", transfer="linear"))
for seed in range(3):
    bk = rhs_random(shape, seed=seed)
    xk, infok = solver.solve(bk)
    print(f"rhs {seed}:        {infok['cycles']} cycles")

# 4. structured report (T13/T15) ------------------------------------------
rep = solve_report(solver, infok)
print(
    f"report:       ρ = {rep['convergence_factor']:.3f}, "
    f"backend = {rep['backend']}"
)

# 5. general sparse matrices (not grid stencils) go through the same door -
import scipy.sparse as sp

rng = np.random.default_rng(0)
n = int(np.prod(shape))
# perturb Poisson into a non-stencil SPD matrix: add a few random couplings
C = sp.random(n, n, density=2e-4, random_state=0, format="csr")
A2 = (A + 0.01 * (C + C.T) + 0.1 * sp.eye(n)).tocsr()
x2, info2 = mg_solve(A2, b, {"problemshape": shape, "cycles": 80})
print(f"general A:    {info2['cycles']} cycles, ‖r‖ = {info2['final_norm']:.2e}")

# 6. verify against the direct solve (the reference's oracle, R11) --------
import scipy.sparse.linalg as spla

x_dir = spla.spsolve(A.tocsc(), np.asarray(b, dtype=np.float64).ravel())
err = np.linalg.norm(np.asarray(x).ravel() - x_dir) / np.linalg.norm(x_dir)
print(f"vs direct:    relative error {err:.2e}")
