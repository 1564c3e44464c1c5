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

Calibration (round 8, VERDICT r7 item 3): when BOTH artifacts carry
bench.py's fixed-work `calibration_wall` yardstick, every ratio is
also reported CALIBRATED — divided by (calib_new / calib_old) — so
uniform box-speed drift (the r7 driver capture ran ~1.28x slower on
ALL 31 common queries, untouched ones included) is mechanically
separable from real plan regressions. The regression gate then uses
the calibrated ratio; raw stays printed beside it.
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


def load_calib(path: str) -> float | None:
    """The fixed-work `calibration_wall` yardstick, from any of the
    three artifact shapes; None when the artifact predates it."""
    with open(path) as f:
        text = f.read()
    lines = [l for l in text.splitlines()
             if l.startswith("# calibration_wall ")]
    if lines:
        return float(lines[-1].split()[2].rstrip("s"))
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        return None
    if isinstance(obj, dict) and "parsed" in obj:
        parsed = obj.get("parsed") or {}
        v = parsed.get("calibration_wall") if isinstance(parsed, dict) else None
        if v is None:
            import re

            m = re.findall(r'"calibration_wall":\s*([0-9.]+)', obj.get("tail") or "")
            v = m[-1] if m else None
        return float(v) if v is not None else None
    if isinstance(obj, dict):
        v = obj.get("calibration_wall")
        return float(v) if v is not None else None
    return None


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
    ns = ap.parse_args()
    threshold = ns.threshold
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
    # box-speed drift factor: >1 means the new box/run was slower on
    # the fixed workload; dividing query ratios by it normalizes drift
    drift = (cal_n / cal_o) if (cal_o and cal_n) else None
    common = sorted(set(old) & set(new))

    def floored_ratio(o: float, n: float) -> float:
        # sub-100ms noise floor: ratios on tiny times are meaningless
        return n / o if o >= 0.1 else (1.0 if n < 0.1 else n / 0.1)

    rows = []
    for q in common:
        o, n = old[q], new[q]
        ratio = floored_ratio(o, n)
        # calibrate the TIME first, then apply the noise floor — the
        # floor clamps tiny-time ratios to 1.0, and dividing that
        # clamped 1.0 by a <1 drift factor would re-inflate sub-noise
        # queries into spurious gate failures on a faster box
        gate = floored_ratio(o, n / drift) if drift else ratio
        rows.append((gate, ratio, q, o, n))
    rows.sort(reverse=True)
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
        cal_txt = (f", calibrated {raw / drift:.2f}x" if drift else "")
        print(f"\ncommon {len(common)} queries: {tot_o:.2f}s -> {tot_n:.2f}s "
              f"({raw:.2f}x{cal_txt})")
    else:
        print(f"\nno comparable queries between the two runs "
              f"(old={len(old)}, new={len(new)} entries)")
    if drift:
        print(f"calibration: {cal_o:.3f}s -> {cal_n:.3f}s "
              f"(box drift {drift:.2f}x; gate uses calibrated ratios)")
    elif cal_o or cal_n:
        print("calibration present in only one artifact — raw ratios gate")
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


if __name__ == "__main__":
    main()
