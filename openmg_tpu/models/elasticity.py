"""Vector-PDE problem generators — dense-block operators for the BSR
engine (SURVEY.md §2B T1/T3 BSR clause; VERDICT r4 task 4).

The scalar Poisson/diffusion families exercise the stencil and ELL
engines; these generators produce matrices whose natural unit is a dense
``B×B`` block per node pair — the case where the blocked-band Pallas BSR
kernel (:mod:`openmg_tpu.ops.bsr`) beats scalar formats (a scalar ELL
layout pads the block structure ~B×; BSR streams 4 B/nnz with zero index
traffic).

Two families:

* :func:`elasticity` — 2D plane-strain linear elasticity
  ``−μ∇²u − (λ+μ)∇(∇·u) = f`` on a regular node grid, 2 dofs/node,
  central differences (the ∂xy cross term couples the components through
  purely off-diagonal 2×2 corner blocks).  The classic vector-PDE
  multigrid test problem.
* :func:`coupled_diffusion` — a B-species coupled reaction–diffusion
  system ``(L ⊗ M) + (I ⊗ C)`` with SPD diffusion-coupling ``M`` and
  reaction ``C`` matrices: every block of the operator is dense B×B, and
  the whole matrix is SPD by construction (Kronecker products of SPD
  factors).  ``B=4`` divides the 128-lane TPU register row, so these
  hierarchies run the Pallas BSR kernel end to end.

Both return scipy CSR on the flat dof vector (node-major, dof-minor
ordering — dof index = node·B + c), matching the reference convention of
problem generators returning assembled sparse matrices (SURVEY.md §2A
R1; the reference itself has no vector-PDE generator — this is
beyond-parity surface).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["elasticity", "coupled_diffusion"]


def _shift2d(shape, dy, dx):
    """Scalar node-shift matrix ``S[i, j] = 1`` iff node j is node i
    offset by (dy, dx) — Dirichlet: out-of-grid neighbors dropped."""
    ny, nx = shape
    return sp.kron(sp.eye(ny, ny, k=dy), sp.eye(nx, nx, k=dx), format="csr")


def elasticity(shape, lam: float = 1.0, mu: float = 1.0):
    """2D plane-strain linear elasticity on an ``(ny, nx)`` node grid.

    Discretizes ``−μ∇²u − (λ+μ)∇(∇·u) = f`` (Navier–Cauchy, homogeneous
    Dirichlet, unit mesh) with central differences: 3-point ``∂xx``/
    ``∂yy`` and the 4-corner cross stencil for ``∂xy``.  The block
    stencil is 9-point with 2×2 blocks; the four corner blocks are
    purely off-diagonal (the u_x↔u_y coupling) — dense-block structure
    no scalar format captures.

    Returns scipy CSR of shape ``(2·ny·nx, 2·ny·nx)`` (node-major,
    component-minor).  Symmetric; positive-definite for lam, mu > 0
    (verified spectrally in tests/test_elasticity.py).
    """
    ny, nx = (int(s) for s in shape)
    if ny < 3 or nx < 3:
        raise ValueError(f"elasticity needs at least a 3x3 grid, got {shape}")
    lam = float(lam)
    mu = float(mu)
    if lam <= 0 or mu <= 0:
        raise ValueError(f"Lamé parameters must be positive: lam={lam} mu={mu}")
    lm = lam + mu
    d0 = 4.0 * mu + 2.0 * lm  # −μ∇² diag + −(λ+μ)∂cc diag, per component

    def blk(a, b, c, d):
        return np.array([[a, b], [c, d]], dtype=np.float64)

    stencil = {
        (0, 0): blk(d0, 0.0, 0.0, d0),
        (0, 1): blk(-(lam + 2 * mu), 0.0, 0.0, -mu),
        (0, -1): blk(-(lam + 2 * mu), 0.0, 0.0, -mu),
        (1, 0): blk(-mu, 0.0, 0.0, -(lam + 2 * mu)),
        (-1, 0): blk(-mu, 0.0, 0.0, -(lam + 2 * mu)),
    }
    for dy in (1, -1):
        for dx in (1, -1):
            c = -lm / 4.0 * (dy * dx)
            stencil[(dy, dx)] = blk(0.0, c, c, 0.0)

    A = None
    for (dy, dx), B in stencil.items():
        term = sp.kron(_shift2d((ny, nx), dy, dx), sp.csr_matrix(B))
        A = term if A is None else A + term
    return A.tocsr()


def coupled_diffusion(shape, ndof: int = 4, *, coupling: float = 0.3,
                      reaction: float = 0.5, seed: int = 0):
    """B-species coupled reaction–diffusion operator ``(L ⊗ M) + (I ⊗ C)``
    on a 1D/2D/3D node grid.

    ``L`` is the scalar (2d+1)-point Dirichlet Laplacian on ``shape``
    (the same matrix :func:`openmg_tpu.models.poisson.poisson` builds),
    ``M = I + coupling·(QᵀQ)/‖QᵀQ‖`` a dense SPD diffusion-coupling
    matrix (species diffuse into each other), and
    ``C = reaction·(I + QᵀQ/‖QᵀQ‖)`` a dense SPD linearized-reaction
    matrix.  Kronecker products of SPD factors ⇒ the operator is SPD with
    every node-pair block dense ``ndof×ndof`` — the blocked-band BSR win
    case.  Returns scipy CSR of shape ``(B·n, B·n)``.
    """
    from openmg_tpu.models.poisson import poisson

    B = int(ndof)
    if B < 2:
        raise ValueError(f"ndof must be >= 2 for a coupled system, got {B}")
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((B, B))
    G = Q.T @ Q
    G = G / np.linalg.norm(G, 2)
    M = np.eye(B) + float(coupling) * G
    C = float(reaction) * (np.eye(B) + G)
    L = sp.csr_matrix(poisson(tuple(int(s) for s in shape)))
    n = L.shape[0]
    A = sp.kron(L, sp.csr_matrix(M)) + sp.kron(
        sp.eye(n, format="csr"), sp.csr_matrix(C)
    )
    return A.tocsr()
