#!/usr/bin/env python
"""Mechanical round-over-round bench comparison (r12 — VERDICT r11
task 6's second half): classify every per-query delta between two
recorded BENCH files as SIGNAL or NOISE so neither the builder nor
the judge burns attribution time on contention bands.

Method, per query:
  1. normalize the newer min by the calib ratio (BASELINE.md "Bench
     calibration": fixed-work host-speed figures recorded in each
     file; py_spin for Python-dominated rows is indistinguishable
     here, so the JVM figure is used for all — the two usually agree);
  2. the NOISE BAND is the larger of the two rounds' recorded
     relative spreads (p50/min - 1; older rounds without the field
     fall back to a 0.20 floor — the r11-observed small-row swing)
     plus a 0.05 measurement floor;
  3. |normalized delta| within the band -> noise; outside -> signal,
     printed with direction and magnitude.

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
    c_old = old.get("calib", {}).get("jvm_fixed_sec")
    c_new = new.get("calib", {}).get("jvm_fixed_sec")
    ratio = (c_old / c_new) if (c_old and c_new) else 1.0
    print(
        f"# calib jvm_fixed: old={c_old} new={c_new} "
        f"-> normalizing new mins by x{ratio:.3f}"
    )
    qs_old, qs_new = old.get("queries", {}), new.get("queries", {})
    sp_old = old.get("queries_spread", {})
    sp_new = new.get("queries_spread", {})
    shared = sorted(set(qs_old) & set(qs_new))
    print(f"# comparable rows: {len(shared)} "
          f"(old-only {len(set(qs_old) - set(qs_new))}, "
          f"new-only {len(set(qs_new) - set(qs_old))})")
    signal = []
    for name in shared:
        t_old = qs_old[name]
        t_new = qs_new[name] * ratio
        if t_old <= 0:
            continue
        delta = t_new / t_old - 1.0
        band = max(
            sp_old.get(name, SPREAD_DEFAULT),
            sp_new.get(name, SPREAD_DEFAULT),
            SPREAD_FLOOR,
        )
        if abs(delta) > band:
            signal.append((name, t_old, t_new, delta, band))
    if not signal:
        print("VERDICT: every shared row is inside its noise band — "
              "no signal either direction.")
        return
    print(f"{'query':36s} {'old':>8s} {'new*':>8s} {'delta':>8s} "
          f"{'band':>6s}  direction")
    for name, a, b, d, band in sorted(signal, key=lambda r: r[3]):
        arrow = "FASTER" if d < 0 else "SLOWER"
        print(f"{name:36s} {a:8.2f} {b:8.2f} {d:+8.1%} {band:6.1%}  {arrow}")


if __name__ == "__main__":
    main(sys.argv[1:])
