"""Static communication/compute model for the distributed V-cycle
(SURVEY.md §2B T13; BASELINE weak-scaling north star).

This environment has ONE real chip, so measured multi-device numbers come
from fake CPU devices and carry CPU-contention noise, not scaling signal
(WEAKSCALE_r03 recorded 0.10 "efficiency" at 8 devices for exactly that
reason).  What CAN be computed exactly is the per-cycle halo traffic and
HBM traffic of the compiled program — both are static functions of the
partition plan, the level shapes, and the dispatch rules in
``parallel/dist.py``/``parallel/fast.py``.  From those, a roofline-style
efficiency bound for a real pod:

    t_comp  = hbm_bytes / hbm_bw          (the solve is bandwidth-bound)
    t_comm  = halo_bytes / ici_bw         (neighbor ppermutes ride ICI)
    bound_overlap    = t_comp / max(t_comp, t_comm)
    bound_no_overlap = t_comp / (t_comp + t_comm)

The model intentionally over-counts communication slightly (it charges
every exchange serially per device) and under-counts compute constants,
so the bounds are conservative.  Default bandwidths: HBM 819 GB/s
(measured on this v5e by bench.py's stream test); ICI 4.5e10 B/s per
direction is a placeholder for one v5e ICI link — pass your pod's number.

Chip calibration (MODELCAL_r05.json, scripts/calibrate_model.py): at
512³ forced-partition — where HBM bytes dominate the launch floors —
the model's per-cycle bytes are **0.67×** the measured cycle-time ×
stream-bandwidth product.  The gap is fused-window re-reads
((4S−2)/tz extra plane streams per chunk) and redundant halo recompute,
which the model deliberately does not charge; the under-count makes the
efficiency bounds conservative (comm fraction over-weighted).  XLA cost
analysis cannot validate this model: Pallas custom calls carry no byte
counts (it reported 5.3e7 B for a whole 256³ cycle).  The CI pin is
tests/test_parallel.py::test_comm_model_calibration.
"""

from __future__ import annotations

__all__ = ["comm_model", "comm_model_sparse"]


def comm_model(
    solver,
    ici_bytes_per_s: float = 4.5e10,
    hbm_bytes_per_s: float = 8.19e11,
    cycles: int = 1,
):
    """Per-V-cycle halo-bytes / HBM-bytes accounting for a
    :class:`~openmg_tpu.parallel.dist.DistributedSolver`, plus modeled
    weak-scaling efficiency bounds.

    Mirrors the dispatch rules: deep-fused const levels exchange
    depth-deep slabs once per fused pass; per-sweep levels exchange one
    plane pair per half-sweep/residual/transfer; the
    partitioned→replicated boundary all-gathers the restricted rhs; the
    fine level's fused df outer step exchanges (x_hi, x_lo, e) plane
    pairs.  All quantities are per device, per cycle.

    Unit note: "per cycle" means one V/W/FMG cycle.  With
    ``krylov='pcg'`` each outer defect-correction step runs
    ``krylov_iters`` cycles plus one fine-level SpMV and three psum
    scalars per CG step — multiply accordingly when projecting pcg
    configurations (the psum scalars are negligible next to halo
    traffic).
    """
    from openmg_tpu.ops import fused

    cfg = solver.config
    plan = solver.plan
    kinds = solver.kinds
    stats = solver.stats  # per level: (shape, ..., nnz)
    n_dev = solver.n_dev
    pre, post = cfg.pre_iterations, cfg.post_iterations
    half_per_sweep = 2 if cfg.smoother == "rbgs" else 1
    per_level = []
    halo_bytes = 0.0
    hbm_bytes = 0.0
    num_levels = len(plan)
    for lvl in range(num_levels):
        shape = tuple(stats[lvl][0])
        level_elems = 1
        for s in shape:
            level_elems *= int(s)
        local_elems = level_elems // (n_dev if plan[lvl] else 1)
        local_bytes = 4 * local_elems
        plane = 4 * (level_elems // int(shape[0]))  # one z-plane, f32
        lv_halo = 0.0
        lv_hbm = 0.0
        last = lvl == num_levels - 1
        if last:
            # replicated dense coarse solve: tiny, identical everywhere
            lv_hbm += 2 * local_bytes
            per_level.append(
                {"level": lvl, "shape": list(shape), "partitioned": False,
                 "halo_bytes": 0.0, "hbm_bytes": lv_hbm}
            )
            hbm_bytes += lv_hbm
            continue

        deep_pre = deep_post = False
        d_pre = d_post = None
        if plan[lvl] and lvl + 1 < num_levels:
            local_shape = (int(shape[0]) // n_dev,) + tuple(
                int(s) for s in shape[1:]
            )
            # mirror _dist_v_cycle.deep_fusable: const AND cornered
            # levels deep-fuse, and the pre/post fusions are independent
            if (
                plan[lvl + 1]
                and kinds[lvl] in ("const", "corner")
                and len(shape) == 3
                and solver.coarsened_axes[lvl] == (0, 1, 2)
            ):
                is_corner = kinds[lvl] == "corner"
                k_off = len(solver.offsets_per_level[lvl])
                d_pre = fused.plan_presmooth_restrict(
                    cfg.smoother, k_off, local_shape, pre, cfg.omega,
                    solver.transfer, halo=True, corner=is_corner,
                )
                d_post = fused.plan_prolong_smooth(
                    cfg.smoother, k_off, local_shape, post, cfg.omega,
                    solver.transfer, halo=True, corner=is_corner,
                )
                deep_pre = d_pre is not None
                deep_post = d_post is not None
        deep = deep_pre and deep_post
        part_pre = part_post = False
        d_rr = d_p1 = None
        if plan[lvl] and lvl + 1 < num_levels and not deep:
            # partial-fusion tiers (VERDICT r4 task 1) on deep_fusable
            # levels where the full staged fusions miss VMEM: stage-free
            # residual+restrict, and prolong + FIRST post-sweep
            if (
                plan[lvl + 1]
                and kinds[lvl] in ("const", "corner")
                and len(shape) == 3
                and solver.coarsened_axes[lvl] == (0, 1, 2)
            ):
                is_corner = kinds[lvl] == "corner"
                k_off = len(solver.offsets_per_level[lvl])
                if not deep_pre:
                    d_rr = fused.plan_residual_restrict(
                        k_off, local_shape, solver.transfer, halo=True,
                        corner=is_corner,
                    )
                    part_pre = d_rr is not None
                if not deep_post and post > 1:
                    d_p1 = fused.plan_prolong_smooth(
                        cfg.smoother, k_off, local_shape, 1, cfg.omega,
                        solver.transfer, halo=True, corner=is_corner,
                    )
                    part_post = d_p1 is not None
        if plan[lvl]:
            # pre side: fused presmooth+residual+restrict, or per-sweep
            # halos + residual + restrict exchanges.  (The chunked
            # multi-half-sweep tier exchanges 2c planes per c-chunk —
            # byte-equal to c per-sweep exchanges, so no separate case.)
            if deep_pre:
                lv_halo += 2 * d_pre * plane  # b slabs (x is zero-start)
                lv_hbm += 2.5 * local_bytes
            elif part_pre:
                lv_halo += 2 * plane * pre * half_per_sweep  # smoothing
                lv_halo += 2 * 2 * d_rr * plane  # b + x depth-2 slabs
                # smoothing passes + the stage-free kernel (b, x in,
                # bc/8 out)
                lv_hbm += (3 * pre * half_per_sweep + 2.2) * local_bytes
            else:
                lv_halo += 2 * plane * pre * half_per_sweep
                lv_halo += 2 * plane  # residual
                lv_halo += 2 * plane  # restrict halo_exchange
                lv_hbm += (3 * pre * half_per_sweep + 3 + 1.3) * local_bytes
            # post side: fused prolong+postsmooth, or per-sweep + prolong
            if deep_post:
                dc = d_post // 2
                lv_halo += 2 * d_post * plane * 2  # b + x slabs
                lv_halo += (2 * dc + 1) * (plane / 4)  # coarse ec slabs
                lv_hbm += 3.5 * local_bytes
            elif part_post:
                dc = d_p1 // 2
                lv_halo += 2 * d_p1 * plane * 2  # b + x slabs
                lv_halo += (2 * dc + 1) * (plane / 4)  # coarse ec slabs
                lv_halo += 2 * plane * (post - 1) * half_per_sweep
                lv_hbm += (
                    3.5 + 3 * (post - 1) * half_per_sweep
                ) * local_bytes
            else:
                lv_halo += 2 * plane * post * half_per_sweep
                if lvl + 1 < num_levels and plan[lvl + 1]:
                    lv_halo += 2 * (plane / 4)  # prolong (coarse planes)
                lv_hbm += (3 * post * half_per_sweep + 1.3) * local_bytes
        else:
            lv_hbm += (
                3 * (pre + post) * half_per_sweep + 3 + 2.6
            ) * local_bytes
        # partitioned→replicated redistribution: all_gather of the
        # restricted rhs (ring: each device sends/receives the full
        # coarse grid minus its own share)
        if lvl + 1 < num_levels and plan[lvl] and not plan[lvl + 1]:
            coarse_elems = 1
            for s in stats[lvl + 1][0]:
                coarse_elems *= int(s)
            lv_halo += 4 * coarse_elems * (n_dev - 1) / n_dev
        per_level.append(
            {"level": lvl, "shape": list(shape), "partitioned": bool(plan[lvl]),
             "deep_fused": deep,
             "partial_fused": bool(part_pre or part_post),
             "partial_pre": part_pre, "partial_post": part_post,
             "halo_bytes": lv_halo, "hbm_bytes": lv_hbm}
        )
        halo_bytes += lv_halo
        hbm_bytes += lv_hbm

    # fine-level outer defect-correction step (fused df kernel): 8-stream
    # pass + (x_hi, x_lo, e) plane pairs
    fine_shape = tuple(stats[0][0])
    fine_elems = 1
    for s in fine_shape:
        fine_elems *= int(s)
    fine_local = 4 * fine_elems // (n_dev if plan[0] else 1)
    hbm_bytes += 8 * fine_local
    if plan[0]:
        halo_bytes += 6 * 4 * (fine_elems // int(fine_shape[0]))

    t_comp = cycles * hbm_bytes / hbm_bytes_per_s
    t_comm = cycles * halo_bytes / ici_bytes_per_s
    return {
        "per_level": per_level,
        "halo_bytes_per_cycle": halo_bytes,
        "hbm_bytes_per_cycle": hbm_bytes,
        "comm_fraction_no_overlap": (
            t_comm / (t_comp + t_comm) if t_comp + t_comm else 0.0
        ),
        "efficiency_bound_overlap": (
            t_comp / max(t_comp, t_comm) if t_comp else 1.0
        ),
        "efficiency_bound_no_overlap": (
            t_comp / (t_comp + t_comm) if t_comp + t_comm else 1.0
        ),
        "assumed_hbm_bytes_per_s": hbm_bytes_per_s,
        "assumed_ici_bytes_per_s": ici_bytes_per_s,
    }


def comm_model_sparse(
    solver,
    ici_bytes_per_s: float = 4.5e10,
    hbm_bytes_per_s: float = 8.19e11,
    cycles: int = 1,
):
    """Per-V-cycle halo-bytes / HBM-bytes accounting for a
    :class:`~openmg_tpu.parallel.sparse_dist.DistributedAlgebraicSolver`
    (the banded general-sparse engine), with the same efficiency bounds
    as :func:`comm_model`.

    Dispatch mirror (parallel/sparse_dist.py): every ``Ax`` on a
    partitioned level exchanges two ``H``-row f32 slabs (one ring hop
    each way); smoothing applies ``Ax`` once per Jacobi iteration, once
    per color per multicolor-GS iteration, and ``iterations`` times for
    Chebyshev; the level residual is one more ``Ax``.  Transfers
    all-gather the full source vector (each device receives
    ``(n_dev−1)/n_dev`` of it) whenever the source level is partitioned;
    restriction gathers the fine vector, prolongation the coarse one.
    The outer df residual exchanges (x_hi, x_lo) slab pairs once per
    cycle.  HBM charges the banded streams: ``k`` data planes + x + b +
    out per ``Ax`` pass (~(k+3)·4 B/row), all per device per cycle.
    """
    cfg = solver.config
    plan = solver.plan
    n_dev = solver.n_dev
    pre, post = cfg.pre_iterations, cfg.post_iterations
    per_level = []
    halo_bytes = 0.0
    hbm_bytes = 0.0
    num_levels = solver.hierarchy.num_levels

    def ax_per_smooth(iters, lvl):
        if iters <= 0:
            return 0
        if cfg.smoother == "rbgs":
            nc = max(solver.num_colors[lvl], 1)
            return iters * nc
        return iters  # jacobi / chebyshev: one Ax per iteration

    for lvl in range(num_levels):
        n, k, _ = solver.stats[lvl]
        n = int(n)
        k = max(int(k), 1)
        local_rows = n // (n_dev if plan[lvl] else 1)
        last = lvl == num_levels - 1
        lv_halo = 0.0
        if last:
            lv_hbm = 4.0 * 2 * local_rows  # replicated dense solve in/out
        else:
            n_ax = ax_per_smooth(pre, lvl) + ax_per_smooth(post, lvl) + 1
            lv_hbm = n_ax * (k + 3) * 4.0 * local_rows
            if plan[lvl]:
                H = solver.halos_per_level[lvl]
                lv_halo += n_ax * 2 * H * 4.0
                # restriction all-gathers the fine residual
                lv_halo += 4.0 * n * (n_dev - 1) / n_dev
                # separable transfers stream ~2 passes over the gathered
                # vector; matrix transfers similar order
                lv_hbm += 2 * 4.0 * n
            else:
                lv_hbm += 2 * 4.0 * n
            # prolongation gathers the coarse correction when partitioned
            if lvl + 1 < num_levels and plan[lvl + 1]:
                nc_rows = int(solver.stats[lvl + 1][0])
                lv_halo += 4.0 * nc_rows * (n_dev - 1) / n_dev
        per_level.append(
            {"level": lvl, "rows": n, "partitioned": bool(plan[lvl]),
             "halo_bytes": lv_halo, "hbm_bytes": lv_hbm}
        )
        halo_bytes += lv_halo
        hbm_bytes += lv_hbm

    # outer df residual: k hi+lo data planes + 4 vectors, plus the
    # (x_hi, x_lo) halo slab pairs
    n0, k0, _ = solver.stats[0]
    rows0 = int(n0) // (n_dev if plan[0] else 1)
    hbm_bytes += (2 * max(int(k0), 1) + 4) * 4.0 * rows0
    if plan[0]:
        halo_bytes += 2 * 2 * solver.fine_halo * 4.0

    t_comp = cycles * hbm_bytes / hbm_bytes_per_s
    t_comm = cycles * halo_bytes / ici_bytes_per_s
    return {
        "per_level": per_level,
        "halo_bytes_per_cycle": halo_bytes,
        "hbm_bytes_per_cycle": hbm_bytes,
        "comm_fraction_no_overlap": (
            t_comm / (t_comp + t_comm) if t_comp + t_comm else 0.0
        ),
        "efficiency_bound_overlap": (
            t_comp / max(t_comp, t_comm) if t_comp else 1.0
        ),
        "efficiency_bound_no_overlap": (
            t_comp / (t_comp + t_comm) if t_comp + t_comm else 1.0
        ),
        "assumed_hbm_bytes_per_s": hbm_bytes_per_s,
        "assumed_ici_bytes_per_s": ici_bytes_per_s,
    }
