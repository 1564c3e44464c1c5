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


def test_calibration_loads_from_all_shapes(tmp_path):
    sys.path.insert(0, "tools")
    import bench_diff

    p1 = tmp_path / "cap.txt"
    p1.write_text("# calibration_wall 0.8s (400M-row fixed-work aggregate)\n"
                  '# all_query_times {"q": 1.0}\n')
    assert bench_diff.load_calib(str(p1)) == 0.8
    p2 = tmp_path / "line.json"
    p2.write_text(json.dumps({"queries": {"q": 1.0}, "calibration_wall": 0.5}))
    assert bench_diff.load_calib(str(p2)) == 0.5
    p3 = tmp_path / "driver.json"
    p3.write_text(json.dumps(
        {"parsed": {"queries": {"q": 1.0}, "calibration_wall": 0.25}, "tail": ""}
    ))
    assert bench_diff.load_calib(str(p3)) == 0.25
    p4 = tmp_path / "old.json"
    p4.write_text(json.dumps({"queries": {"q": 1.0}}))
    assert bench_diff.load_calib(str(p4)) is None


def test_cli_calibrated_ratio_gates(tmp_path):
    # a uniform 2x slowdown with a matching 2x calibration drift must
    # NOT gate (the r7 driver-box scenario); without calibration the
    # same numbers would
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps(
        {"queries": {"q": 1.0, "r": 2.0}, "calibration_wall": 0.5}))
    new.write_text(json.dumps(
        {"queries": {"q": 2.0, "r": 4.0}, "calibration_wall": 1.0}))
    r = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout
    assert "drift 2.00x" in r.stdout
    # and a REAL regression on top of drift still gates: q 4x raw on a
    # 2x-drift box is 2x calibrated > 1.5
    new.write_text(json.dumps(
        {"queries": {"q": 4.0, "r": 4.0}, "calibration_wall": 1.0}))
    r2 = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r2.returncode == 1 and "q" in r2.stdout.split("regression(s)")[-1]


def test_cli_faster_box_does_not_reinflate_noise_floor(tmp_path):
    # faster new box (drift 0.5): a sub-100ms unchanged query must NOT
    # gate — the noise floor applies to the calibrated time, not
    # before the drift division (review r8: 1.0/0.5 = 2.0 would have
    # tripped the 1.5x gate on an unchanged 50 ms query)
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps(
        {"queries": {"tiny": 0.05, "big": 2.0}, "calibration_wall": 1.0}))
    new.write_text(json.dumps(
        {"queries": {"tiny": 0.05, "big": 1.0}, "calibration_wall": 0.5}))
    r = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout


def test_cli_allow_waives_documented_scope_change(tmp_path):
    # --allow QUERY=REASON waives a deliberate scope change (r9:
    # bpe_doc_tokens grew a second certification engine) but still
    # prints it; an undocumented regression alongside still gates, a
    # reason-less allow is rejected, and a stale allow is surfaced
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps({"metric": "x", "queries": {"q": 1.0, "r": 1.0}}))
    new.write_text(json.dumps({"metric": "x", "queries": {"q": 3.0, "r": 1.0}}))
    r = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new),
         "--allow", "q=dual-engine certification"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout
    assert "ALLOWED (scope change: dual-engine certification)" in r.stdout
    # a second, unallowed regression still fails
    new.write_text(json.dumps({"metric": "x", "queries": {"q": 3.0, "r": 3.0}}))
    r2 = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new),
         "--allow", "q=dual-engine certification"],
        capture_output=True, text=True,
    )
    assert r2.returncode == 1 and "r" in r2.stdout.split("regression(s)")[-1]
    # reason-less allow is a usage error
    r3 = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new),
         "--allow", "q"],
        capture_output=True, text=True,
    )
    assert r3.returncode != 0
    # an allow that no longer trips is reported stale
    r4 = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(old),
         "--allow", "q=left over"],
        capture_output=True, text=True,
    )
    assert r4.returncode == 0 and "stale --allow" in r4.stdout


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


def test_cli_uniform_drift_median_normalization(tmp_path):
    # the r11/r12 driver scenario: query walls uniformly ~1.45x slower
    # while the cpu probe is FLAT (scheduler-side box drift the codegen
    # probe can't see). The median per-query drift estimator clears the
    # per-query board, but an UNEXPLAINED uniform drift now fails with
    # exit 2 (ADVICE r12: it used to be a stdout NOTE anyone could
    # miss) until the one-box A/B evidence is cited; a genuine outlier
    # riding on top of the drift still flags with exit 1
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    qs_old = {f"q{i}": 1.0 for i in range(10)}
    qs_new = {f"q{i}": 1.45 for i in range(10)}
    old.write_text(json.dumps({"queries": qs_old, "calibration_wall": 0.4}))
    new.write_text(json.dumps({"queries": qs_new, "calibration_wall": 0.4}))
    r = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r.returncode == 2, r.stdout
    assert "uniform drift" in r.stdout and "NOT explained" in r.stdout
    assert "REGRESSION" not in r.stdout
    # the documented waiver (citing A/B evidence) restores exit 0
    rw = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new),
         "--accept-uniform-drift", "one-box A/B in bench_captures/x.md"],
        capture_output=True, text=True,
    )
    assert rw.returncode == 0, rw.stdout
    assert "WAIVED" in rw.stdout
    # a reason-less waiver is a usage error
    re_ = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new),
         "--accept-uniform-drift", "  "],
        capture_output=True, text=True,
    )
    assert re_.returncode not in (0, 2)
    # a real 4x outlier on the same drifting box still gates (exit 1
    # takes precedence over the uniform-drift exit 2)
    qs_new["q9"] = 4.0
    new.write_text(json.dumps({"queries": qs_new, "calibration_wall": 0.4}))
    r2 = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r2.returncode == 1 and "q9" in r2.stdout.split("regression(s)")[-1]


def test_cli_uniform_drift_probe_explained_passes(tmp_path):
    # the same 1.45x uniform wall drift WITH a matching stable probe
    # drift is box movement, not code — exit 0, no waiver needed
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    qs_old = {f"q{i}": 1.0 for i in range(10)}
    qs_new = {f"q{i}": 1.45 for i in range(10)}
    old.write_text(json.dumps({"queries": qs_old, "calibration_wall": 0.4,
                               "calibration_spread": 1.1}))
    new.write_text(json.dumps({"queries": qs_new, "calibration_wall": 0.58,
                               "calibration_spread": 1.1}))
    r = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout


def test_cli_unstable_probe_cannot_explain_uniform_drift(tmp_path):
    # ADVICE r12: an UNSTABLE cpu probe (excluded from the per-query
    # gate) used to still count toward the probe-explained ceiling and
    # suppress the unexplained-uniform-drift check — now a 1.45x
    # uniform drift with only an unstable probe "explaining" it fails
    # with exit 2
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    qs_old = {f"q{i}": 1.0 for i in range(10)}
    qs_new = {f"q{i}": 1.45 for i in range(10)}
    old.write_text(json.dumps({"queries": qs_old, "calibration_wall": 0.4,
                               "calibration_spread": 1.1}))
    new.write_text(json.dumps({"queries": qs_new, "calibration_wall": 0.58,
                               "calibration_spread": 2.1}))
    r = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r.returncode == 2, r.stdout
    assert "UNSTABLE" in r.stdout


def test_cli_unstable_probe_excluded_from_gate(tmp_path):
    # a probe whose 5 samples spread past the 1.3x acceptance band is
    # excluded: its (spurious) 2x drift may NOT waive a real regression
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps({"queries": {"a": 1.0, "b": 1.0},
                               "calibration_wall": 0.4,
                               "calibration_spread": 1.05}))
    new.write_text(json.dumps({"queries": {"a": 2.0, "b": 1.0},
                               "calibration_wall": 0.8,
                               "calibration_spread": 2.1}))
    r = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1 and "UNSTABLE" in r.stdout
    # with a stable probe the same drift legitimately clears it
    new.write_text(json.dumps({"queries": {"a": 2.0, "b": 1.0},
                               "calibration_wall": 0.8,
                               "calibration_spread": 1.05}))
    r2 = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r2.returncode == 0, r2.stdout


def test_cli_shuffle_calibration_normalizes(tmp_path):
    # the shuffle yardstick alone (cpu probe flat) explains a uniform
    # 2x wall drift on a 2-query artifact (too few for the median path)
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps({"queries": {"a": 1.0, "b": 2.0},
                               "calibration_wall": 0.4,
                               "shuffle_calibration_wall": 0.5}))
    new.write_text(json.dumps({"queries": {"a": 2.0, "b": 4.0},
                               "calibration_wall": 0.4,
                               "shuffle_calibration_wall": 1.0}))
    r = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout
    assert "shuffle probe" in r.stdout
