"""End-to-end CLI pipeline: the four jobs as a user would run them
(subprocess, fresh JVMs), bronze -> silver -> gold -> analytics."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from .rues_fixture import write_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(args: list[str]) -> dict:
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, "-m", "big_data_processing_with_aws_glue_workshop_spark.cli", *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_full_pipeline(tmp_path):
    paths = write_fixture(tmp_path / "raw")
    bronze, silver, gold = str(tmp_path / "b"), str(tmp_path / "s"), str(tmp_path / "g")

    b = run_job(["bronze", "--input", paths["raw_csv"], "--output", bronze])
    assert b["job"] == "bronze"

    s = run_job(
        [
            "silver",
            "--bronze", bronze,
            "--catalogs", str(tmp_path / "raw"),
            "--output", silver,
            "--error-logs", str(tmp_path / "logs"),
            "--reference-year", "2025",
        ]
    )
    assert s["violations"]["matricula_null"] == 1
    assert s["violations"]["antiguedad_negativa"] == 1

    g = run_job(["gold", "--silver", silver, "--output", gold, "--today", "2025-06-30"])
    assert g["dim_rows"] == g["fact_rows"] == 55
    assert g["orphan_matriculas"] == 1  # the NULL-matricula row

    a = run_job(["analytics", "--gold", gold, "--query", "q1"])
    assert a["total_rows"] > 0
    assert a["rows"][0]["total_empresas_activas"] >= a["rows"][-1]["total_empresas_activas"]
