"""Mechanical round-over-round bench comparison (VERDICT r5 item 7).

Usage: python tools/bench_diff.py OLD NEW [--threshold 1.5]
           [--allow QUERY=REASON ...]

--allow marks a DELIBERATE per-query scope change (round 9: a query
made bigger on purpose, e.g. bpe_doc_tokens growing a second
certification engine): the query's ratio is still printed (flagged
ALLOWED with the reason) but does not fail the gate. The reason is
mandatory — an allowance must document itself in the diff table the
round commits.

OLD/NEW each accept any of the three bench artifact shapes:
- a driver BENCH_r{N}.json ({"parsed": {"queries": {...}}, "tail": ...});
- a bench.py stderr capture (the `# all_query_times {json}` line —
  the FULL catalog map, preferred);
- a bare bench.py stdout JSON line ({"queries": {...}}).

Prints a per-query table of (old_s, new_s, ratio) sorted worst-first,
then a summary: total old/new, queries added/removed, and the list of
regressions past the threshold. Exit code 1 if any regression — usable
as a gate in round workflows.

Calibration (reworked round 12, VERDICT r11 items 1+2): box-speed
drift is estimated three ways and a query must exceed the threshold
under EVERY available normalization to flag —
- cpu: bench.py's fixed-work codegen probe ratio (median of 5 with a
  1.5x max/min acceptance band; excluded when unstable). The r12
  bisect proved this probe can stay FLAT while real query walls drift
  1.45-1.67x (scheduler/shuffle-side box differences), so it is never
  the only normalizer;
- shuffle/scheduler: bench.py's fixed-work shuffle probe ratio (the
  dimension that actually moved on the r11/r12 driver boxes);
- uniform: the MEDIAN per-query raw ratio over >= 8 above-noise
  common queries — probe-free and robust: a few real regressions
  cannot move it. When it exceeds 1.25x AND 1.25x of the largest
  TRUSTED probe drift, the run FAILS with exit 2 (round 13, ADVICE
  r12: a genuinely uniform code regression used to be absorbed with
  only a stdout NOTE) until the one-box A/B protocol (bench_captures/
  r12_bench_regression_bisect.md) is run and its evidence cited via
  --accept-uniform-drift REASON.
This min-over-normalizations gate cannot produce a false regression
from single-dimension box drift, while a genuine per-query regression
stands out under all estimators. The box-class delta (both probes +
spreads + uniform drift) prints FIRST so a cross-box capture is
self-explaining.
"""

from __future__ import annotations

import json
import sys


def load_times(path: str) -> dict[str, float]:
    with open(path) as f:
        text = f.read()
    # stderr capture: last `# all_query_times {...}` line wins
    lines = [l for l in text.splitlines() if l.startswith("# all_query_times ")]
    if lines:
        return json.loads(lines[-1][len("# all_query_times "):])
    obj = json.loads(text)
    # driver artifact
    if isinstance(obj, dict) and "parsed" in obj:
        parsed = obj.get("parsed")
        if isinstance(parsed, dict) and parsed.get("queries"):
            return {k: float(v) for k, v in parsed["queries"].items()}
        # truncated-tail artifact (r4-era parsed:null): recover whatever
        # `"name": 1.23` pairs survive in the tail — PARTIAL by nature
        import re

        meta = {"value", "sf", "n_queries", "n_queries_all",
                "n_queries_headline", "all_queries_total_wall",
                "headline31_total_wall", "headline34_total_wall",
                "calibration_wall"}
        pairs = {
            k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', obj.get("tail") or "")
            if k not in meta
        }
        if pairs:
            print(f"# {path}: parsed=null, recovered {len(pairs)} entries "
                  "from truncated tail (PARTIAL)", file=sys.stderr)
            return pairs
        raise SystemExit(f"{path}: driver artifact has no parsable query map")
    # bare stdout line
    if isinstance(obj, dict) and "queries" in obj:
        return {k: float(v) for k, v in obj["queries"].items()}
    raise SystemExit(f"{path}: unrecognized bench artifact shape")


def load_scalar(path: str, field: str) -> float | None:
    """A named scalar (calibration_wall, shuffle_calibration_wall,
    calibration_spread, ...) from any of the three artifact shapes;
    None when the artifact predates it."""
    with open(path) as f:
        text = f.read()
    lines = [l for l in text.splitlines()
             if l.startswith(f"# {field} ")]
    if lines:
        return float(lines[-1].split()[2].rstrip("sx"))
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        return None
    if isinstance(obj, dict) and "parsed" in obj:
        parsed = obj.get("parsed") or {}
        v = parsed.get(field) if isinstance(parsed, dict) else None
        if v is None:
            import re

            m = re.findall(rf'"{field}":\s*([0-9.]+)', obj.get("tail") or "")
            v = m[-1] if m else None
        return float(v) if v is not None else None
    if isinstance(obj, dict):
        v = obj.get(field)
        return float(v) if v is not None else None
    return None


def load_calib(path: str) -> float | None:
    """The fixed-work `calibration_wall` yardstick (back-compat name)."""
    return load_scalar(path, "calibration_wall")


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Round-over-round bench comparison", usage=__doc__
    )
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--allow", action="append", default=[], metavar="QUERY=REASON",
        help="deliberate scope change: exempt QUERY from the gate, "
             "printing REASON beside its ratio",
    )
    ap.add_argument(
        "--accept-uniform-drift", metavar="REASON", default=None,
        help="waive the unexplained-uniform-drift gate (exit 2) after "
             "running the one-box A/B protocol; REASON must cite the "
             "A/B evidence (e.g. the bench_captures file)",
    )
    ns = ap.parse_args()
    threshold = ns.threshold
    if ns.accept_uniform_drift is not None and not ns.accept_uniform_drift.strip():
        raise SystemExit("--accept-uniform-drift: empty reason")
    allowed: dict[str, str] = {}
    for item in ns.allow:
        if "=" not in item:
            raise SystemExit(f"--allow needs QUERY=REASON, got {item!r}")
        q, reason = item.split("=", 1)
        if not reason.strip():
            raise SystemExit(f"--allow {q}: empty reason")
        allowed[q] = reason.strip()
    old, new = load_times(ns.old), load_times(ns.new)
    cal_o, cal_n = load_calib(ns.old), load_calib(ns.new)
    # box-speed drift estimates, each >1 = new box/run slower:
    #  - drift_cpu: fixed-work codegen probe ratio. PROVEN BLIND to
    #    scheduler/shuffle-side drift (r12 bisect: r10 code re-run on
    #    the r12 box was 1.67x slower on query walls with this probe
    #    flat), so it cannot be the only normalizer.
    #  - drift_sched: fixed-work shuffle probe ratio (when both
    #    artifacts carry it) — the dimension that actually moved.
    #  - drift_uniform: MEDIAN per-query raw ratio over the common
    #    above-noise queries — a probe-free, robust estimator of the
    #    uniform component. A few real regressions can't move it; a
    #    genuinely uniform code regression would be absorbed, which is
    #    why a loud warning (not a silent pass) prints whenever the
    #    uniform component is large.
    #  - drift_sort: fixed-work partitioned-window-sort probe ratio
    #    (added r14, VERDICT r13 item 5: the cpu probe was unstable two
    #    driver rounds running, leaving the shuffle probe as the only
    #    trusted normalization) — exchange + sort + codegen blended,
    #    trimmed-mean estimator, measured spread ~1.06-1.17x idle.
    drift_cpu = (cal_n / cal_o) if (cal_o and cal_n) else None
    sch_o = load_scalar(ns.old, "shuffle_calibration_wall")
    sch_n = load_scalar(ns.new, "shuffle_calibration_wall")
    drift_sched = (sch_n / sch_o) if (sch_o and sch_n) else None
    srt_o = load_scalar(ns.old, "sort_calibration_wall")
    srt_n = load_scalar(ns.new, "sort_calibration_wall")
    drift_sort = (srt_n / srt_o) if (srt_o and srt_n) else None
    spread_o = load_scalar(ns.old, "calibration_spread")
    spread_n = load_scalar(ns.new, "calibration_spread")
    sch_spread_o = load_scalar(ns.old, "shuffle_calibration_spread")
    sch_spread_n = load_scalar(ns.new, "shuffle_calibration_spread")
    srt_spread_o = load_scalar(ns.old, "sort_calibration_spread")
    srt_spread_n = load_scalar(ns.new, "sort_calibration_spread")
    common = sorted(set(old) & set(new))

    def floored_ratio(o: float, n: float) -> float:
        # sub-100ms noise floor: ratios on tiny times are meaningless
        return n / o if o >= 0.1 else (1.0 if n < 0.1 else n / 0.1)

    eligible = [new[q] / old[q] for q in common
                if old[q] >= 0.1 and new[q] >= 0.1]
    drift_uniform = None
    if len(eligible) >= 8:  # median of a handful is not robust
        import statistics

        drift_uniform = statistics.median(eligible)
    # acceptance band on the cpu probe itself (VERDICT r11 item 2): a
    # probe whose 5 samples spread past 1.5x max/min is too unstable
    # to normalize with (idle-box spread after JIT warm-up measures
    # ~1.2-1.4x; past 1.5x the box is contended or the probe broken)
    cpu_probe_ok = not ((spread_o and spread_o > 1.5)
                        or (spread_n and spread_n > 1.5))
    if drift_cpu and not cpu_probe_ok:
        print("# WARNING: calibration probe spread exceeds the 1.5x "
              f"acceptance band (old {spread_o}, new {spread_n}) — "
              "cpu-calibrated ratios are untrusted", file=sys.stderr)
    # the same band applies to every probe (r14: the shuffle probe's
    # own spread hit 1.86x in the r12 capture — a one-legged trust
    # model was the r13 verdict's standing complaint)
    sched_probe_ok = not ((sch_spread_o and sch_spread_o > 1.5)
                          or (sch_spread_n and sch_spread_n > 1.5))
    if drift_sched and not sched_probe_ok:
        print("# WARNING: shuffle probe spread exceeds the 1.5x "
              f"acceptance band (old {sch_spread_o}, new {sch_spread_n})"
              " — shuffle-calibrated ratios are untrusted",
              file=sys.stderr)
    sort_probe_ok = not ((srt_spread_o and srt_spread_o > 1.5)
                         or (srt_spread_n and srt_spread_n > 1.5))
    if drift_sort and not sort_probe_ok:
        print("# WARNING: sort probe spread exceeds the 1.5x acceptance "
              f"band (old {srt_spread_o}, new {srt_spread_n}) — "
              "sort-calibrated ratios are untrusted", file=sys.stderr)

    # --- box-class delta FIRST (VERDICT r12 item 6): the probe pair is
    # a box fingerprint — leading with it makes a cross-box driver
    # capture self-explaining instead of needing a bisect doc ---
    print("== box-class delta (fixed-work probes; >1 = NEW box/run slower) ==")
    if drift_cpu:
        spread_txt = "".join(
            f", spread {s}x" for s in (spread_o, spread_n) if s) or ""
        print(f"cpu probe:     {cal_o:.3f}s -> {cal_n:.3f}s "
              f"(drift {drift_cpu:.2f}x{spread_txt}"
              + ("" if cpu_probe_ok else "; UNSTABLE, excluded from gate")
              + ")")
    elif cal_o or cal_n:
        print("cpu probe:     present in only one artifact")
    if drift_sched:
        spread_txt = "".join(
            f", spread {s}x" for s in (sch_spread_o, sch_spread_n) if s) or ""
        print(f"shuffle probe: {sch_o:.3f}s -> {sch_n:.3f}s "
              f"(drift {drift_sched:.2f}x{spread_txt}"
              + ("" if sched_probe_ok else "; UNSTABLE, excluded from gate")
              + ")")
    if drift_sort:
        spread_txt = "".join(
            f", spread {s}x" for s in (srt_spread_o, srt_spread_n) if s) or ""
        print(f"sort probe:    {srt_o:.3f}s -> {srt_n:.3f}s "
              f"(drift {drift_sort:.2f}x{spread_txt}"
              + ("" if sort_probe_ok else "; UNSTABLE, excluded from gate")
              + ")")
    elif srt_o or srt_n:
        print("sort probe:    present in only one artifact")
    if drift_uniform:
        print(f"uniform drift: {drift_uniform:.2f}x "
              f"(median per-query raw ratio, n={len(eligible)})")
    # probe-explained ceiling: the largest TRUSTED probe drift. An
    # unstable cpu probe is excluded here exactly as it is from the
    # per-query gate (ADVICE r12: it used to slip back in and suppress
    # the unexplained-uniform-drift check)
    probe_best = max(
        drift_cpu if (drift_cpu and cpu_probe_ok) else 1.0,
        drift_sched if (drift_sched and sched_probe_ok) else 1.0,
        drift_sort if (drift_sort and sort_probe_ok) else 1.0,
    )
    uniform_unexplained = bool(
        drift_uniform and drift_uniform > 1.25
        and drift_uniform > 1.25 * probe_best)
    if uniform_unexplained:
        print("NOTE: large uniform wall drift NOT explained by the "
              "fixed-work probes — per the r12 protocol this now FAILS "
              "the gate (exit 2) until confirmed by an A/B of old-code "
              "vs new-code on ONE box (see tools/bench_captures/"
              "r12_bench_regression_bisect.md); waive with "
              "--accept-uniform-drift REASON citing the A/B")
    print()

    rows = []
    for q in common:
        o, n = old[q], new[q]
        ratio = floored_ratio(o, n)
        # calibrate the TIME first, then apply the noise floor — the
        # floor clamps tiny-time ratios to 1.0, and dividing that
        # clamped 1.0 by a <1 drift factor would re-inflate sub-noise
        # queries into spurious gate failures on a faster box.
        # The gate is the MOST FORGIVING of the available drift
        # normalizations: a query must look regressed under EVERY
        # estimator to fail — box drift in any single dimension can't
        # produce a false regression, while a real per-query
        # regression stands out under all of them.
        cands = [ratio]
        if drift_cpu and cpu_probe_ok:
            cands.append(floored_ratio(o, n / drift_cpu))
        if drift_sched and sched_probe_ok:
            cands.append(floored_ratio(o, n / drift_sched))
        if drift_sort and sort_probe_ok:
            cands.append(floored_ratio(o, n / drift_sort))
        if drift_uniform:
            cands.append(floored_ratio(o, n / drift_uniform))
        gate = min(cands) if len(cands) > 1 else ratio
        rows.append((gate, ratio, q, o, n))
    rows.sort(reverse=True)
    drift = drift_cpu  # display factor for the per-row 'cal' column
    cal_hdr = f" {'cal':>6}" if drift else ""
    print(f"{'query':<42} {'old_s':>8} {'new_s':>8} {'ratio':>6}{cal_hdr}")
    for gate, ratio, q, o, n in rows:
        if gate > threshold and q in allowed:
            flag = f"  <-- ALLOWED (scope change: {allowed[q]})"
        elif gate > threshold:
            flag = "  <-- REGRESSION"
        else:
            flag = ""
        cal_col = f" {gate:>6.2f}" if drift else ""
        print(f"{q:<42} {o:>8.3f} {n:>8.3f} {ratio:>6.2f}{cal_col}{flag}")
    tot_o = sum(old[q] for q in common)
    tot_n = sum(new[q] for q in common)
    if common and tot_o > 0:
        raw = tot_n / tot_o
        cal_txt = (f", cpu-calibrated {raw / drift:.2f}x" if drift else "")
        # sort probe is the stable normalizer (r15: bench.py now also
        # emits sort-calibrated totals in its own JSON)
        srt_txt = (f", sort-calibrated {raw / drift_sort:.2f}x"
                   if (drift_sort and sort_probe_ok) else "")
        print(f"\ncommon {len(common)} queries: {tot_o:.2f}s -> {tot_n:.2f}s "
              f"({raw:.2f}x{cal_txt}{srt_txt})")
    else:
        print(f"\nno comparable queries between the two runs "
              f"(old={len(old)}, new={len(new)} entries)")
    print("gate: each query must exceed the threshold under EVERY "
          "available drift normalization to flag")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    waived = [q for gate, ratio, q, o, n in rows
              if gate > threshold and q in allowed]
    if waived:
        print(f"{len(waived)} allowed scope change(s): "
              + ", ".join(f"{q} ({allowed[q]})" for q in waived))
    stale = sorted(set(allowed) - set(waived))
    if stale:
        # an allowance that no longer trips the gate (or names an
        # unknown query) is stale — surface it so it gets removed from
        # the round workflow instead of silently waiving future runs
        print(f"stale --allow entries (did not trip the gate): "
              + ", ".join(stale))
    regs = [q for gate, ratio, q, o, n in rows
            if gate > threshold and q not in allowed]
    if regs:
        print(f"\n{len(regs)} regression(s) past {threshold}x"
              f"{' (calibrated)' if drift else ''}: {', '.join(regs)}")
        sys.exit(1)
    if uniform_unexplained:
        if ns.accept_uniform_drift:
            print(f"\nuniform-drift gate WAIVED: {ns.accept_uniform_drift}")
        else:
            print(f"\nunexplained uniform drift {drift_uniform:.2f}x "
                  f"(probe-explained ceiling {probe_best:.2f}x) — run the "
                  "one-box A/B protocol, then re-run with "
                  "--accept-uniform-drift REASON")
            sys.exit(2)


if __name__ == "__main__":
    main()
