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
