"""CLI surface smoke (python -m pappermate_ray) in a fresh process —
guards the entry-point wiring the driver/user actually touches."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=180):
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "pappermate_ray", *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_extract_resume_report(tmp_path):
    out_dir = str(tmp_path / "out")
    dead_dir = str(tmp_path / "dead")
    r1 = _run(["extract", "--input", "/root/testdata/sf0.001", "--output", out_dir,
               "--n-parts", "8", "--dead-letter-dir", dead_dir])
    assert r1["written_partitions"] == 8
    assert r1["written_rows"] == 500
    assert r1["dead_letter_rows"] > 0

    r2 = _run(["extract", "--input", "/root/testdata/sf0.001", "--output", out_dir,
               "--n-parts", "8", "--resume"])
    assert r2["written_rows"] == 0  # resume over completed output is a no-op

    m = _run(["manifest", "--output", out_dir])
    assert m["rows"] == 500 and m["n_error"] > 0

    rep = _run(["report", "--output", out_dir])
    assert rep["status"]["converted"] + rep["status"]["error"] == 500
