"""Smoke-execute the documented entry points under examples/ (VERDICT r5
optional-hardening item: README prose was their only exercise, so a
refactor could rot them silently). Each runs in a subprocess exactly as
the README commands do, from a scratch cwd."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.slow
def test_quickstart_cli_full_load(tmp_path):
    res = _run(
        ["-m", "db_writer_redshift_spark", "--data",
         os.path.join(REPO, "examples", "quickstart")],
        cwd=tmp_path,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    payload = json.loads(res.stdout.strip().splitlines()[-1])
    assert payload["status"] == "success"
    assert payload["uploaded"] == ["simple"]
    assert (tmp_path / "spark-warehouse" / "people").is_dir() or any(
        (tmp_path / "spark-warehouse").glob("people*")
    )


@pytest.mark.slow
def test_curation_example(tmp_path):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata missing: {SF_DIR}")
    out = tmp_path / "curated"
    res = _run(
        [os.path.join(REPO, "examples", "curation", "run.py"), SF_DIR, str(out)],
        cwd=tmp_path,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.is_dir(), res.stdout[-2000:]


@pytest.mark.slow
def test_streaming_example(tmp_path):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata missing: {SF_DIR}")
    work = tmp_path / "work"
    res = _run(
        [os.path.join(REPO, "examples", "streaming", "run.py"), SF_DIR, str(work)],
        cwd=tmp_path,
    )
    assert res.returncode == 0, res.stderr[-2000:]
