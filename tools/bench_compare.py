#!/usr/bin/env python
"""Mechanical round-over-round bench comparison (r12 — VERDICT r11
task 6's second half): classify every per-query delta between two
recorded BENCH files as SIGNAL or NOISE so neither the builder nor
the judge burns attribution time on contention bands.

Method, per query:
  1. normalize the newer min by BOTH recorded calib ratios
     (BASELINE.md "Bench calibration": the fixed-work py_spin and
     jvm_fixed host-speed figures). The two usually agree; when they
     do not (measured r12: py ratio 1.12 vs jvm 1.60 across two runs
     on one idle host — the JVM figure swings with JIT/frequency
     state far beyond real drift), trusting either alone manufactures
     a wall of false regressions, so a row is SIGNAL only if its
     delta clears the band in the SAME direction under BOTH
     normalizations;
  2. the NOISE BAND is the larger of the two rounds' recorded
     relative spreads (p50/min - 1; older rounds without the field
     fall back to a 0.20 floor — the r11-observed small-row swing)
     plus a 0.05 measurement floor;
  3. anything not signal under both ratios -> noise (printed count
     only); signal rows print with direction and the range of
     normalized magnitudes.

Usage: python tools/bench_compare.py OLD.json NEW.json
Both driver-wrapper files ({n, rc, tail, parsed}) and raw bench.py
output lines are accepted. Exit code 0 always — this is a report,
not a gate (a regression CLAIM needs the spread's support; the claim
itself stays human).
"""

from __future__ import annotations

import json
import re
import sys


def load_bench(path: str) -> dict:
    """Extract {queries, queries_spread, calib} from either format.
    Driver tails are truncated; whatever is recoverable is used."""
    data = json.loads(open(path).read())
    if "queries" in data:
        return data
    if isinstance(data.get("parsed"), dict) and data["parsed"]:
        return data["parsed"]
    tail = data.get("tail", "")
    out: dict = {"queries": {}, "queries_spread": {}, "calib": {}}
    # the driver keeps only the LAST 2000 chars, so the '"queries": {'
    # opener may be truncated away; the queries object is the first
    # object-valued key in the line, so it still ENDS at the first '}'
    # — fall back to [0, first '}') unless marker keys show the tail
    # starts PAST the queries object (bench.py's _prior_mins logic)
    m = re.search(r'"queries"\s*:\s*\{', tail)
    start = m.end() if m else 0
    end = tail.find("}", start)
    sec = tail[start:end] if end != -1 else tail[start:]
    if m or not re.search(r'"(queries_p50|queries_spread|value_p50|calib)"', sec):
        out["queries"] = {
            g[0]: float(g[1])
            for g in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', sec)
        }
    m = re.search(r'"queries_spread"\s*:\s*\{', tail)
    if m:
        sec = tail[m.end():tail.find("}", m.end())]
        out["queries_spread"] = {
            g[0]: float(g[1])
            for g in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', sec)
        }
    for k in ("py_spin_sec", "jvm_fixed_sec"):
        m = re.search(rf'"{k}": ([0-9.]+)', tail)
        if m:
            out["calib"][k] = float(m.group(1))
    return out


SPREAD_FLOOR = 0.05   # measurement floor even on 5-sample rows
SPREAD_DEFAULT = 0.20  # rounds predating the spread field (r11 swings)


def main(argv: list[str]) -> None:
    if len(argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    old, new = load_bench(argv[0]), load_bench(argv[1])
    ratios = []
    for key in ("py_spin_sec", "jvm_fixed_sec"):
        c_old = old.get("calib", {}).get(key)
        c_new = new.get("calib", {}).get(key)
        r = (c_old / c_new) if (c_old and c_new) else 1.0
        ratios.append(r)
        print(f"# calib {key}: old={c_old} new={c_new} -> x{r:.3f}")
    if max(ratios) / min(ratios) > 1.15:
        print("# WARNING: the two calib ratios disagree beyond real "
              "host drift — signal requires BOTH to agree (below)")
    qs_old, qs_new = old.get("queries", {}), new.get("queries", {})
    sp_old = old.get("queries_spread", {})
    sp_new = new.get("queries_spread", {})
    shared = sorted(set(qs_old) & set(qs_new))
    print(f"# comparable rows: {len(shared)} "
          f"(old-only {len(set(qs_old) - set(qs_new))}, "
          f"new-only {len(set(qs_new) - set(qs_old))})")
    signal, noise = [], 0
    for name in shared:
        t_old = qs_old[name]
        if t_old <= 0:
            continue
        band = max(
            sp_old.get(name, SPREAD_DEFAULT),
            sp_new.get(name, SPREAD_DEFAULT),
            SPREAD_FLOOR,
        )
        deltas = [qs_new[name] * r / t_old - 1.0 for r in ratios]
        clears = [d for d in deltas if abs(d) > band]
        same_dir = len(clears) == len(deltas) and (
            all(d > 0 for d in deltas) or all(d < 0 for d in deltas)
        )
        if same_dir:
            signal.append((name, t_old, qs_new[name], deltas, band))
        else:
            noise += 1
    print(f"# noise rows (inside band, or calib-ratio-dependent): {noise}")
    if not signal:
        print("VERDICT: no row clears its noise band under both calib "
              "normalizations — no signal either direction.")
        return
    print(f"{'query':36s} {'old':>8s} {'raw new':>8s} "
          f"{'delta range':>16s} {'band':>6s}  direction")
    for name, a, b, ds, band in sorted(signal, key=lambda r: min(r[3])):
        arrow = "FASTER" if ds[0] < 0 else "SLOWER"
        lo, hi = min(ds), max(ds)
        print(f"{name:36s} {a:8.2f} {b:8.2f} {lo:+7.1%}..{hi:+7.1%} "
              f"{band:6.1%}  {arrow}")


if __name__ == "__main__":
    main(sys.argv[1:])
