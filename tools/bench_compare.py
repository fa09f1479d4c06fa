#!/usr/bin/env python
"""Mechanical round-over-round bench comparison (r12 — VERDICT r11
task 6's second half): classify every per-query delta between two
recorded BENCH files as SIGNAL or NOISE so neither the builder nor
the judge burns attribution time on contention bands.

Method, per query:
  1. normalize the newer min by the FLEET-MEDIAN ratio: the median of
     t_old/t_new over all shared rows. Rationale (r12, measured):
     across three same-day runs on one idle host the recorded
     fixed-work calib figures swung 40-60% (py_spin 0.94 -> 0.84 ->
     0.65; jvm_fixed 0.27 -> 0.17 -> 0.09 — JIT ramp + burst-credit
     frequency) while the 114 per-row raw mins were stable to a few
     percent — so a single fixed-work loop is a WORSE host estimator
     than the benched fleet itself. The median of 114 per-row ratios
     absorbs genuine uniform host drift (the r5 1.25x finding) with
     114-sample support and is immune to any one row's change; both
     calib ratios are still printed for reference and a WARNING
     fires when they disagree with the fleet median beyond drift.
     The corollary trade is explicit: a change that uniformly slows
     EVERY row reads as host drift here — catching that class is
     what the absolute BASELINE bound (2x at same SF) is for;
  2. the NOISE BAND is the larger of the two rounds' recorded
     relative spreads (p50/min - 1; older rounds without the field
     fall back to a 0.20 floor — the r11-observed small-row swing)
     plus a 0.05 measurement floor;
  3. |median-normalized delta| within the band -> noise (printed
     count only); signal rows print with direction and magnitude.

Usage: python tools/bench_compare.py OLD.json NEW.json
Both driver-wrapper files ({n, rc, tail, parsed}) and raw bench.py
output lines are accepted. Exit code 0 always — this is a report,
not a gate (a regression CLAIM needs the spread's support; the claim
itself stays human).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_record import load_bench_file  # noqa: E402


def load_bench(path: str) -> dict:
    """Extract {queries, queries_spread, calib} from either format —
    delegated to tools/bench_record.py (r13, VERDICT r12 task 1) so
    this tool and bench.py's warm-up selection can never disagree on
    what a truncated driver tail means. The shared recovery prefers
    the compact names_v/mins_csv trailer, then a ``<stem>.mins.json``
    sidecar, and REFUSES ambiguous legacy tails instead of guessing
    (the r12 failure: spread ratios parsed as timings -> a x8.4
    phantom fleet ratio and 60 false FASTER rows)."""
    out = load_bench_file(path)
    if not out["queries"]:
        print(f"# WARNING: no per-query mins recoverable from {path} "
              "(truncated legacy tail without a mins_csv trailer or "
              ".mins.json sidecar) — rows from this file are excluded "
              "rather than guessed")
    return out


SPREAD_FLOOR = 0.05   # measurement floor even on 5-sample rows
SPREAD_DEFAULT = 0.20  # rounds predating the spread field (r11 swings)


def main(argv: list[str]) -> None:
    if len(argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    old, new = load_bench(argv[0]), load_bench(argv[1])
    sf_old, sf_new = old.get("sf"), new.get("sf")
    if sf_old is not None and sf_new is not None and sf_old != sf_new:
        # REFUSE, don't report (r13): every per-row ratio would
        # compare different workloads, so any FASTER/SLOWER verdict
        # below would be confidently wrong — the exact failure class
        # VERDICT r12 #1 flagged in this tool.
        print(f"# scale factors differ (old sf={sf_old}, new "
              f"sf={sf_new}) — per-row ratios would compare different "
              "workloads, not host or code speed")
        print("VERDICT: incomparable (different scale factors).")
        return
    calib_ratios = {}
    for key in ("py_spin_sec", "jvm_fixed_sec"):
        c_old = old.get("calib", {}).get(key)
        c_new = new.get("calib", {}).get(key)
        if c_old and c_new:
            calib_ratios[key] = c_old / c_new
            print(f"# calib {key}: old={c_old} new={c_new} "
                  f"-> x{calib_ratios[key]:.3f}")
    qs_old, qs_new = old.get("queries", {}), new.get("queries", {})
    sp_old = old.get("queries_spread", {})
    sp_new = new.get("queries_spread", {})
    shared = sorted(
        n for n in set(qs_old) & set(qs_new)
        if qs_old[n] > 0 and qs_new[n] > 0
    )
    print(f"# comparable rows: {len(shared)} "
          f"(old-only {len(set(qs_old) - set(qs_new))}, "
          f"new-only {len(set(qs_new) - set(qs_old))})")
    if not shared:
        print("VERDICT: no comparable rows.")
        return
    row_ratios = sorted(qs_old[n] / qs_new[n] for n in shared)
    r_med = row_ratios[len(row_ratios) // 2]
    print(f"# fleet-median host ratio (old/new over {len(shared)} rows): "
          f"x{r_med:.3f} — the normalizer (see docstring)")
    for key, r in calib_ratios.items():
        if max(r, r_med) / min(r, r_med) > 1.15:
            print(f"# WARNING: calib {key} ratio x{r:.3f} disagrees with "
                  "the fleet median — fixed-work figure untrusted here")
    signal, noise = [], 0
    for name in shared:
        t_old = qs_old[name]
        t_new = qs_new[name] * r_med
        band = max(
            sp_old.get(name, SPREAD_DEFAULT),
            sp_new.get(name, SPREAD_DEFAULT),
            SPREAD_FLOOR,
        )
        delta = t_new / t_old - 1.0
        if abs(delta) > band:
            signal.append((name, t_old, qs_new[name], delta, band))
        else:
            noise += 1
    print(f"# noise rows (inside band after median normalization): {noise}")
    if not signal:
        print("VERDICT: no row clears its noise band after fleet-median "
              "normalization — no per-row signal either direction.")
        return
    print(f"{'query':36s} {'old':>8s} {'raw new':>8s} "
          f"{'delta':>8s} {'band':>6s}  direction")
    for name, a, b, d, band in sorted(signal, key=lambda r: r[3]):
        arrow = "FASTER" if d < 0 else "SLOWER"
        print(f"{name:36s} {a:8.2f} {b:8.2f} {d:+8.1%} "
              f"{band:6.1%}  {arrow}")


if __name__ == "__main__":
    try:
        main(sys.argv[1:])
    except BrokenPipeError:  # `| head` closed the pipe — not an error
        pass
