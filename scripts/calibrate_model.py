#!/usr/bin/env python
"""Validate comm_model's HBM accounting against the chip (VERDICT r4
task 5).

Two independent measurements of the forced-partitioned per-device cycle
program at a given shape, in ONE process:

* **XLA cost analysis** of the compiled program (``compiled.cost_analysis()
  ['bytes accessed']``) — the compiler's own operand/result byte count.
  Caveat: Pallas custom calls charge full operand buffers per operand, so
  plane-window re-reads overcount slightly; fusion savings XLA applies to
  jnp code are counted exactly.
* **Measured device time × measured HBM stream bandwidth** — the solve is
  bandwidth-bound, so ``t_cycle · BW`` estimates true bytes moved (the
  small levels' launch floors inflate this at small shapes).

Writes ``MODELCAL_r{N}.json`` with all three numbers per shape; the CI
test (tests/test_parallel.py::test_comm_model_calibration) re-runs the
model at the recorded configs and pins agreement with the recorded
measurements, so any tier change that shifts the model without
recalibration fails CI.
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


def stream_bw():
    """Measured HBM copy bandwidth (bytes/s) — bench.py's amortized
    fori_loop chain (a small 256 MB × 8-step scan under-measured 143
    vs 819 GB/s here: the chain is too short to amortize relay dispatch
    latency)."""
    from bench import measure_stream_bandwidth

    return measure_stream_bandwidth()


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MODELCAL_r05.json"
    from openmg_tpu import MeshConfig, SolverConfig, setup
    from openmg_tpu.parallel.dist import DistributedSolver
    from openmg_tpu.parallel.model import comm_model

    bw = stream_bw()
    print(f"stream bandwidth: {bw / 1e9:.0f} GB/s", flush=True)

    records = []
    for shape in ((256, 256, 256), (512, 512, 512)):
        cfg = SolverConfig(smoother="rbgs", transfer="linear",
                           residual_dtype="doublefloat", cycles=60)
        solver = setup(shape, cfg)
        sd = DistributedSolver(
            solver.hierarchy, cfg,
            MeshConfig(n_devices=1, force_partition=True),
        )
        model = comm_model(sd)
        r0 = jnp.ones(shape, jnp.float32)

        # compiled cycle program: cost analysis + chained timing
        def cyc(rr, s_=sd):
            return s_._cycle(s_.level_data, s_.coarse_inv, rr)

        reps = 24 if shape[0] <= 256 else 8

        @jax.jit
        def chain(c):
            return lax.scan(
                lambda cc, _: (cyc(cc), 0.0), c, None, length=reps
            )[0]

        t0 = time.perf_counter()
        lowered = jax.jit(cyc).lower(r0)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        xla_bytes = float(ca.get("bytes accessed", float("nan")))
        print(f"{shape}: compile+analysis {time.perf_counter() - t0:.1f}s",
              flush=True)

        out = chain(r0)
        float(jnp.sum(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = chain(r0)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / reps)
        tbw_bytes = best * bw
        model_bytes = float(model["hbm_bytes_per_cycle"])
        # the model's separate df outer-step charge is NOT in the cycle
        # program; subtract it for the comparison
        fine_elems = 1
        for s in shape:
            fine_elems *= s
        df_bytes = 8 * 4 * fine_elems
        model_cycle = model_bytes - df_bytes
        rec = {
            "shape": list(shape),
            "model_hbm_bytes_per_cycle_total": model_bytes,
            "model_hbm_bytes_cycle_only": model_cycle,
            "xla_cost_analysis_bytes": xla_bytes,
            "cycle_time_s": best,
            "stream_bw_bytes_per_s": bw,
            "time_x_bw_bytes": tbw_bytes,
            "model_over_xla": model_cycle / xla_bytes if xla_bytes else None,
            "model_over_timebw": model_cycle / tbw_bytes,
            "per_level": model["per_level"],
        }
        records.append(rec)
        print(
            f"  model(cycle) {model_cycle:.3e} B | xla {xla_bytes:.3e} B "
            f"(ratio {rec['model_over_xla']:.2f}) | t*bw {tbw_bytes:.3e} B "
            f"(ratio {rec['model_over_timebw']:.2f})",
            flush=True,
        )

    with open(out_path, "w") as f:
        json.dump({
            "backend": jax.default_backend(),
            "records": records,
            "note": (
                "comm_model HBM validation on the real chip (forced-"
                "partitioned per-device cycle program): model vs XLA "
                "cost analysis (custom calls charge full operand "
                "buffers -- slight overcount of plane windows) and vs "
                "measured cycle time x measured stream bandwidth "
                "(launch floors inflate small-level time). One process."
            ),
        }, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
