"""BENCH_IDLE write guard (VERDICT r12 ask #3): the committed idle
bench artifact must be structurally unable to contain a loaded-box
measurement. Pure-JSON tests — no Spark session."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import IDLE_LOADAVG_MAX, refresh_bench_idle  # noqa: E402


def _detail(idle: bool, **over):
    d = {
        "metric": "headline_queries_total",
        "value": 95.0,
        "sf": 0.1,
        "idle": idle,
        "loadavg_start": [0.4 if idle else 3.4, 1.0, 1.0],
        "queries": {"pricing_summary": 0.2},
    }
    d.update(over)
    return d


def test_idle_threshold_is_one():
    # the documented threshold from the verdict ask; a silent change
    # here would re-admit loaded runs
    assert IDLE_LOADAVG_MAX == 1.0


def test_refresh_writes_only_when_idle(tmp_path):
    path = str(tmp_path / "BENCH_IDLE.json")
    assert not refresh_bench_idle(_detail(idle=False), path)
    assert not os.path.exists(path)
    assert refresh_bench_idle(_detail(idle=True), path)
    with open(path) as fh:
        assert json.load(fh)["idle"] is True
    # a later loaded run cannot clobber the idle artifact
    assert not refresh_bench_idle(_detail(idle=False, value=200.0), path)
    with open(path) as fh:
        assert json.load(fh)["value"] == 95.0


def test_missing_idle_tag_refuses(tmp_path):
    # pre-r13 artifacts have no "idle" key: refuse, don't guess
    d = _detail(idle=True)
    del d["idle"]
    assert not refresh_bench_idle(d, str(tmp_path / "BENCH_IDLE.json"))


def test_promote_tool_guards(tmp_path):
    tool = os.path.join(ROOT, "tools", "refresh_bench_idle.py")

    def run(detail):
        src = tmp_path / "detail.json"
        src.write_text(json.dumps(detail))
        return subprocess.run(
            [sys.executable, tool, "--from", str(src)],
            capture_output=True,
            text=True,
        )

    r = run(_detail(idle=False))
    assert r.returncode == 2 and "NOT idle" in r.stderr
    r = run(_detail(idle=True, sf=0.01))
    assert r.returncode == 2 and "sf" in r.stderr
    r = run(_detail(idle=True, failed=["q1"]))
    assert r.returncode == 2 and "failed" in r.stderr
