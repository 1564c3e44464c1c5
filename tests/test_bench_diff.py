"""bench_diff artifact parsing: all three shapes must load to the same
query->seconds map, and the truncated r4-era tail recovers partials."""

import json
import subprocess
import sys


def _load(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    sys.path.insert(0, "tools")
    import importlib

    import bench_diff
    importlib.reload(bench_diff)
    return bench_diff.load_times(str(p))


def test_stderr_capture_shape(tmp_path):
    t = {"q1": 0.5, "q2": 1.25}
    content = "# pass0 q1: 0.5s\n# all_query_times " + json.dumps(t) + "\n"
    assert _load(tmp_path, "cap.txt", content) == t


def test_driver_artifact_shape(tmp_path):
    t = {"q1": 0.5}
    content = json.dumps({"parsed": {"queries": t}, "tail": ""})
    assert _load(tmp_path, "bench.json", content) == t


def test_bare_stdout_shape(tmp_path):
    t = {"q1": 0.5}
    content = json.dumps({"metric": "x", "queries": t})
    assert _load(tmp_path, "line.json", content) == t


def test_truncated_tail_recovery(tmp_path):
    content = json.dumps(
        {"parsed": None, "tail": 'core": 0.66, "q_whole": 0.33, "sf": 0.1}'}
    )
    got = _load(tmp_path, "trunc.json", content)
    # the torn first entry ('core' is a mid-name fragment with no
    # opening quote) is correctly skipped; whole keys survive and
    # meta keys like sf are excluded
    assert got == {"q_whole": 0.33}


def test_cli_regression_exit_code(tmp_path):
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps({"metric": "x", "queries": {"q": 1.0, "r": 1.0}}))
    new.write_text(json.dumps({"metric": "x", "queries": {"q": 2.0, "r": 1.0}}))
    r = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1 and "REGRESSION" in r.stdout
    r2 = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(old)],
        capture_output=True, text=True,
    )
    assert r2.returncode == 0
