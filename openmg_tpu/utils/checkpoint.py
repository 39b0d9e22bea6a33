"""Checkpoint / resume between outer cycles (SURVEY.md §5.4).

The reference has no checkpointing — solves are monolithic (SURVEY.md §5).
For the build the solver state is tiny by design: the outer
defect-correction loop's state is exactly ``(x, cycle_index)`` — the
hierarchy is deterministic and recomputable from the config — so a
checkpoint is one npz file holding the full-precision solution iterate, the
cycle counter, the residual history, and a hash of the solver config.  This
bounds lost work on long multi-host benchmark runs (and makes solves
restartable across processes / after preemption).

Format: numpy ``.npz`` (portable, dependency-free).  The double-float
iterate is stored as its exact f64 merge — ``df_split`` on load reproduces
the two-f32 pair bit-exactly (hi is the f32 round of the f64 value, lo the
remainder, both exactly representable).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import numpy as np

__all__ = ["config_hash", "save_checkpoint", "load_checkpoint"]

_VERSION = 1


def config_hash(config, grid_shape) -> str:
    """Stable hash of (solver config, grid shape) — a checkpoint is only
    resumable into a solver with the identical per-cycle iteration map on
    an identical problem.  Fields that do not change the iteration map —
    the stopping criteria (``cycles``, ``threshold``) and ``verbose`` —
    are excluded, so a run can be resumed with a higher cycle cap or a
    tighter tolerance (the checkpoint/resume use case, SURVEY.md §5.4)."""
    fields = json.loads(config.to_json())
    for k in ("cycles", "threshold", "verbose", "outer_loop"):
        fields.pop(k, None)
    payload = json.dumps(
        {"config": fields, "shape": list(grid_shape)}, sort_keys=True
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save_checkpoint(path, x_np, cycle: int, residual_norms, cfg_hash: str):
    """Atomically write the solve state (write temp + rename)."""
    path = str(path)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                version=np.int64(_VERSION),
                x=np.asarray(x_np, dtype=np.float64),
                cycle=np.int64(cycle),
                residual_norms=np.asarray(residual_norms, dtype=np.float64),
                cfg_hash=np.str_(cfg_hash),
            )
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path, cfg_hash: str):
    """Load a checkpoint; returns ``(x, cycle, residual_norms)`` or raises
    ``ValueError`` on config mismatch."""
    with np.load(str(path)) as z:
        if int(z["version"]) != _VERSION:
            raise ValueError(f"unsupported checkpoint version {z['version']}")
        stored = str(z["cfg_hash"])
        if stored != cfg_hash:
            raise ValueError(
                f"checkpoint config hash {stored} != solver {cfg_hash}; "
                "refusing to resume into a different solver/problem"
            )
        return (
            np.asarray(z["x"], dtype=np.float64),
            int(z["cycle"]),
            [float(v) for v in z["residual_norms"]],
        )
