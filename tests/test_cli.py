"""CLI end-to-end (mirrors the reference's subprocess CLI test,
/root/reference/tests/unit_tests.py:1211-1317)."""

import subprocess
import sys

URLS = """https://www.example.org/article/one.html
https://www.example.org/article/one.html?utm_source=feed
http://example.org/feed
https://www.example.org/de/artikel.html
not-a-url
https://www.example.org/page/2/
https://other.net/story.html
"""


def _run(tmp_path, *extra):
    inp = tmp_path / "in.txt"
    out = tmp_path / "out.txt"
    rej = tmp_path / "rej.txt"
    inp.write_text(URLS)
    cmd = [sys.executable, "-m", "courlan_ray", "-i", str(inp),
           "-o", str(out), "-d", str(rej), "-p", "2", *extra]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                         cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-2000:]
    return (out.read_text().splitlines(),
            rej.read_text().splitlines() if rej.exists() else [])


def test_cli_filtering(tmp_path):
    accepted, rejected = _run(tmp_path)
    assert "https://www.example.org/article/one.html" in accepted
    assert "https://www.example.org/de/artikel.html" in accepted
    assert "not-a-url" in rejected
    assert "http://example.org/feed" in rejected
    assert "https://www.example.org/page/2/" in rejected


def test_cli_language_filter(tmp_path):
    accepted, _ = _run(tmp_path, "--language", "en")
    assert "https://www.example.org/article/one.html" in accepted
    assert all("/de/" not in u for u in accepted)


def test_cli_sample(tmp_path):
    inp = tmp_path / "in.txt"
    out = tmp_path / "out.txt"
    inp.write_text(URLS)
    cmd = [sys.executable, "-m", "courlan_ray", "-i", str(inp),
           "-o", str(out), "--sample", "1", "-p", "2"]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                         cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-2000:]
    lines = out.read_text().splitlines()
    hosts = {u.split("/", 3)[2] for u in lines}
    assert len(lines) >= 1                   # sampler must emit something
    assert len(hosts) == len(lines)          # one per host


def test_dedup_job_entrypoint(tmp_path, ray_session):
    """jobs/dedup_job.py runs the flagship end-to-end in-process (the same
    code path `ray job submit` drives on a real cluster) and writes
    partitioned parquet outputs + metrics.json."""
    import json
    import os
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo")
    from courlan_ray.sources.synth import synth_parquet
    from jobs.dedup_job import main

    inp = synth_parquet(500, 42, root=str(tmp_path / "in"))
    outdir = str(tmp_path / "out")
    rc = main(["--input", inp, "--output", outdir,
               "--checkpoint", str(tmp_path / "ck")])
    assert rc == 0
    m = json.load(open(os.path.join(outdir, "metrics.json")))
    assert m["rows_clusters"] > 400
    assert m["rows_counters"] >= 1
    got = pq.read_table(os.path.join(outdir, "clusters"))
    assert set(got.column_names) >= {"image_id", "cluster_id",
                                     "cluster_size", "is_representative"}
    # resume: a second run skips completed stages (manifest records)
    rc2 = main(["--input", inp, "--output", str(tmp_path / "out2"),
                "--checkpoint", str(tmp_path / "ck")])
    assert rc2 == 0
    from courlan_ray.state.manifest import Checkpoint
    from courlan_ray.config import DedupConfig
    recs = Checkpoint(str(tmp_path / "ck"), DedupConfig()).records()
    assert any(r.get("status") == "skipped" for r in recs)
