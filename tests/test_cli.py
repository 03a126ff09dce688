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
def test_cli_kill_and_resume(tmp_path):
    """Hard-kill an extraction run mid-flight (SIGKILL, no cleanup), then
    resume: the atomic-rename partition markers must leave no torn state,
    the resumed run must skip completed partitions, and the final corpus
    must equal an uninterrupted run."""
    import signal
    import time

    out_kill = str(tmp_path / "killed")
    out_ref = str(tmp_path / "ref")

    env = dict(os.environ, RAY_GRAFT_CPUS="2")  # slow it down so the kill lands mid-run
    proc = subprocess.Popen(
        [sys.executable, "-m", "pappermate_ray", "extract",
         "--input", "/root/testdata/sf0.001", "--output", out_kill, "--n-parts", "16"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    # wait until at least one partition is durably committed, then SIGKILL
    deadline = time.time() + 120
    committed = 0
    while time.time() < deadline:
        if os.path.isdir(out_kill):
            committed = sum(1 for n in os.listdir(out_kill) if n.startswith("part="))
            if committed >= 1:
                break
        time.sleep(0.2)
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    # no torn partitions: every committed dir has data + meta; tmp dirs may
    # linger (the writer's scratch) but never count as completed
    for name in os.listdir(out_kill):
        if name.startswith("part="):
            files = os.listdir(os.path.join(out_kill, name))
            assert "data.parquet" in files and "_meta.json" in files

    r = _run(["extract", "--input", "/root/testdata/sf0.001", "--output", out_kill,
              "--n-parts", "16", "--resume"])
    ref = _run(["extract", "--input", "/root/testdata/sf0.001", "--output", out_ref,
                "--n-parts", "16"])
    assert ref["written_rows"] == 500

    import duckdb

    con = duckdb.connect()
    q = "SELECT url, status, md5(text) AS h FROM read_parquet('{}/part=*/data.parquet') ORDER BY url"
    got = con.execute(q.format(out_kill)).fetchall()
    want = con.execute(q.format(out_ref)).fetchall()
    assert got == want  # byte-identical corpus despite the kill


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


def test_cli_curate(tmp_path):
    """curate subcommand: extract → quality → near-dup survivors,
    partitioned parquet out."""
    out_dir = str(tmp_path / "curated")
    res = _run(["curate", "--input", "/root/testdata/sf0.001",
                "--output", out_dir, "--n-parts", "8"], timeout=300)
    assert res["written_partitions"] == 8
    # error rows + quality losers are dropped, most of the corpus survives
    assert 400 <= res["survivor_rows"] < 500
    import pyarrow.dataset as pads

    tb = pads.dataset(out_dir, partitioning="hive").to_table()
    assert set(tb.column_names) >= {"url", "quality", "n_tokens"}
    assert tb.num_rows == res["survivor_rows"]


def test_cli_curate_full(tmp_path):
    """curate-full subcommand: the composed corpus job writes the
    training-shard manifest through the resumable sink."""
    out_dir = str(tmp_path / "manifest")
    res = _run(["curate-full", "--input", "/root/testdata/sf0.001",
                "--output", out_dir, "--n-parts", "4"], timeout=400)
    assert res["written_partitions"] == 4
    assert res["manifest_rows"] > 300
    import pyarrow.dataset as pads

    tb = pads.dataset(out_dir, partitioning="hive").to_table()
    assert set(tb.column_names) >= {"doc_id", "url", "n_tokens",
                                    "start_offset", "shard_id", "shard_pos"}
    assert tb.num_rows == res["manifest_rows"]
