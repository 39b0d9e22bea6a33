"""CLI surface (python -m openmg_tpu) — subprocess smoke tests."""

import json
import subprocess
import sys

import pytest


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "openmg_tpu", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_cli_solve_report(tmp_path):
    rep_path = tmp_path / "report.json"
    p = _run(
        [
            "--shape", "32", "32",
            "--backend", "cpu",
            "--transfer", "linear",
            "--report", str(rep_path),
        ]
    )
    assert p.returncode == 0, p.stderr[-2000:]
    rep = json.loads(rep_path.read_text())
    assert rep["converged"] is True
    assert rep["shape"] == [32, 32]
    assert 0 < rep["convergence_factor"] < 1


def test_cli_config_file_and_overrides(tmp_path):
    from openmg_tpu import SolverConfig

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(SolverConfig(smoother="jacobi", cycles=200).to_json())
    p = _run(
        [
            "--shape", "16", "16",
            "--backend", "cpu",
            "--config", str(cfg_path),
            "--smoother", "rbgs",  # override wins
        ]
    )
    assert p.returncode == 0, p.stderr[-2000:]
    rep = json.loads(p.stdout)
    assert rep["config"]["smoother"] == "rbgs"
    assert rep["config"]["cycles"] == 200


def test_cli_krylov_and_mesh_shape(tmp_path, capsys):
    from openmg_tpu.cli import main

    rc = main([
        "--shape", "32", "16",
        "--krylov", "pcg", "--krylov-iters", "2",
        "--cycles", "60", "--gridlevels", "2",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["converged"]

    rc = main([
        "--shape", "32", "16", "--mesh-shape", "2", "4",
        "--cycles", "60", "--gridlevels", "2",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["converged"] and rep["n_devices"] == 8
