#!/usr/bin/env python
"""Weak-scaling harness + north-star comm-model projection →
WEAKSCALE_r{N}.json (BASELINE north star; VERDICT r4 tasks 1/5).

Fake-CPU-mesh efficiency numbers are CPU-contention noise (documented in
the artifact); the signal is the static comm model of the exact compiled
program: per-cycle halo bytes vs HBM bytes at the 512³/8-device
north-star configuration, now including the r5 partial-fusion tiers
(stage-free residual+restrict, prolong+1-sweep) on the 512²-plane levels
the full staged fusion cannot fit (scoped-VMEM cap: 0.9·K·E·plane —
E ≥ 3·depth with halo slabs exceeds 56 MB at 1 MB planes for any
stage-carrying depth; the partial tiers are the depth-2 fusions that DO
fit).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "WEAKSCALE_r05.json"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from weak_scaling import run_weak_scaling

    from openmg_tpu import MeshConfig, SolverConfig, setup
    from openmg_tpu.parallel.dist import DistributedSolver
    from openmg_tpu.parallel.model import comm_model

    cfg = SolverConfig(
        smoother="rbgs", transfer="linear", residual_dtype="doublefloat",
        cycles=8, threshold=0.0, gridlevels=3, max_dense_coarse=1 << 22,
    )
    records = run_weak_scaling(16, 16, 16, 8, cfg=cfg)
    for r in records:
        print(f"n={r['devices']} eff={r['weak_scaling_efficiency']:.3f}",
              flush=True)

    # north star: 512³ row-partitioned over 8 devices (static model of
    # the exact per-device program; no solve executed)
    ns_cfg = SolverConfig(
        smoother="rbgs", transfer="linear", residual_dtype="doublefloat",
        cycles=60,
    )
    solver = setup((512, 512, 512), ns_cfg)
    sd = DistributedSolver(solver.hierarchy, ns_cfg, MeshConfig(n_devices=8))
    ns = comm_model(sd)
    print("north star per level:", flush=True)
    for pl in ns["per_level"]:
        print(
            f"  L{pl['level']} {tuple(pl['shape'])} part={pl['partitioned']}"
            f" deep={pl.get('deep_fused')} partial={pl.get('partial_fused')}"
            f" hbm={pl['hbm_bytes']:.3e}",
            flush=True,
        )
    print(
        f"efficiency bound (no overlap) = "
        f"{ns['efficiency_bound_no_overlap']:.3f}",
        flush=True,
    )

    record = {
        "round": 5,
        "backend": "cpu-fake-mesh (model: v5e)",
        "note": (
            "harness validation on 8 fake CPU devices (one real TPU chip "
            "in this environment; the BASELINE north star needs a >=2-host "
            "pod slice). Fake devices share host cores, so measured "
            "efficiency is CPU-contention noise; the signal is comm_model: "
            "static per-cycle halo/HBM bytes of the exact compiled "
            "program. r5: the 512^2-plane levels now run the PARTIAL "
            "fusion tiers (stage-free residual+restrict, prolong+1-sweep "
            "-- partial_pre/partial_post flags); the full staged fusion "
            "cannot fit those planes in scoped VMEM at any "
            "stage-carrying depth (0.9*K*E*plane vs the 56 MB cap with "
            "E >= 3*depth under halo slabs), so partial_fused=true is "
            "the design point, verified on-chip by DISTCHIP_r05/"
            "PROFILE512_r05."
        ),
        "records": records,
        "north_star_projection": {
            "shape": [512, 512, 512],
            "devices": 8,
            "partition_plan": list(sd.plan),
            "comm_model": ns,
            "note": (
                "static model for the BASELINE 512^3 >=2-host north star "
                "(>70% weak-scaling nnz/s efficiency): per-cycle halo "
                "bytes vs HBM bytes of the exact compiled program at "
                "8-way row partition; no solve executed."
            ),
        },
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
