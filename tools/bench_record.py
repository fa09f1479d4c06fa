#!/usr/bin/env python
"""Shared BENCH-record recovery (r13 — VERDICT r12 task 1).

The driver records only the LAST 2000 chars of bench.py's stdout
(``{n, rc, tail, parsed}``; ``parsed`` has been null every round).
bench.py's output line is ~5-6 KB at 114 HEADLINE rows, so the tail
starts mid-line and WHICH section it starts in depends on how many
sections follow the per-query mins:

- r02-r05: the tail starts inside the ``queries`` (mins) object —
  the legacy ``[0, first '}')`` fallback recovered real mins;
- r06-r11: the growing list pushed the tail start into
  ``queries_p50`` — the same fallback silently recovered P50s as
  mins (conservative for warm-up selection, wrong for comparisons);
- r12: the new ``queries_spread`` section pushed the start into the
  SPREAD object — the fallback recovered noise ratios (0.02-0.66) as
  timings, and tools/bench_compare.py reported a x8.4 phantom fleet
  ratio with 60 false FASTER rows (VERDICT r12 What's-wrong #1).

Three fixes live here, shared by bench.py and bench_compare.py so the
parsing can never drift between them again:

1. **Self-sufficient artifact**: bench.py now ends its JSON line with
   ``"names_v": K, "mins_csv": "..."`` — the per-query mins as a
   compact values-only CSV in HEADLINE order (~700 chars; the full
   named dict is ~3.2 KB and can NEVER fit the 2000-char tail), with
   the name list itself committed in ``tools/bench_names.json`` keyed
   by version. Being the LAST keys of the line, they always land
   inside the tail window; ``recover_queries`` zips them back.
2. **Refusing fallback**: the unanchored ``[0, first '}')`` guess is
   accepted ONLY when the key immediately after that first ``}`` is
   ``queries_p50`` — proof the closed object was ``queries`` itself.
   Any other continuation (``value_p50``, ``sf``, ``calib``) means
   the tail starts past the mins and the fallback now returns nothing
   instead of guessing (fed the literal r06/r12 tails in
   tests/test_bench_tools.py).
3. **Sidecar repair**: ``load_bench_file`` prefers a sibling
   ``<stem>.mins.json`` (``{"sf": .., "queries": {..}}``) when one
   exists. ``BENCH_r12.mins.json`` is committed from the complete
   same-run record ``.bench_last.json`` (verified sane by the r12
   judge), restoring the otherwise-unrecoverable r12 round to the
   cross-round history.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
NAMES_REGISTRY = _REPO / "tools" / "bench_names.json"


def _load_registry() -> dict[str, list[str]]:
    try:
        return json.loads(NAMES_REGISTRY.read_text())
    except (OSError, ValueError):
        return {}


def names_for_version(version: int) -> list[str] | None:
    """HEADLINE name list recorded under ``version``, or None."""
    return _load_registry().get(str(version))


def ensure_names_version(headline: list[str]) -> int:
    """Return the registry version whose list equals ``headline``,
    appending a new version if none matches. The registry is
    append-only: recorded BENCH lines reference their version forever,
    so entries are never rewritten. A unit test asserts the latest
    version matches bench.HEADLINE, so the file is committed BEFORE
    the driver runs; the runtime append is the self-healing fallback
    for an uncommitted HEADLINE edit."""
    reg = _load_registry()
    for v, names in reg.items():
        if names == headline:
            return int(v)
    next_v = max((int(v) for v in reg), default=0) + 1
    reg[str(next_v)] = list(headline)
    NAMES_REGISTRY.write_text(json.dumps(reg, indent=1))
    return next_v


def recover_queries(data: dict) -> dict[str, float]:
    """Per-query min timings from a bench record in ANY format:
    bench.py's own output line (top-level ``queries``), a driver
    wrapper with a parsed line, or a driver wrapper with only a
    truncated ``tail``. Returns {} when nothing can be recovered
    UNAMBIGUOUSLY — callers must treat {} as "no prior record", never
    as "all rows sub-second"."""
    if isinstance(data.get("queries"), dict):
        return {k: float(v) for k, v in data["queries"].items()}
    if isinstance(data.get("by_sf"), dict) and data["by_sf"]:
        # r13 .bench_last.json: one slot per scale factor. For
        # comparison purposes prefer the driver's cross-round scale
        # (sf0.1), else the largest recorded sf.
        slots = data["by_sf"]
        key = "0.1" if "0.1" in slots else sorted(slots, key=float)[-1]
        return {k: float(v) for k, v in slots[key].items()}
    if isinstance(data.get("parsed"), dict) and data["parsed"].get("queries"):
        return {
            k: float(v) for k, v in data["parsed"]["queries"].items()
        }
    tail = data.get("tail")
    if not isinstance(tail, str):
        return {}
    # Preferred: the compact trailer (format fix #1 above). names_v and
    # mins_csv are the line's last keys, so a 2000-char tail always
    # holds them in full.
    m = re.search(r'"names_v": (\d+), "mins_csv": "([0-9.,]*)"', tail)
    if m:
        names = names_for_version(int(m.group(1)))
        vals = [float(x) for x in m.group(2).split(",") if x]
        if names is not None and len(names) == len(vals):
            return dict(zip(names, vals))
        return {}  # registry out of sync — refuse, don't guess
    # Legacy anchored parse: the opener survived truncation (r01-r02).
    m = re.search(r'"queries"\s*:\s*\{', tail)
    if m:
        end = tail.find("}", m.end())
        sec = tail[m.end():end] if end != -1 else tail[m.end():]
        return {
            g[0]: float(g[1])
            for g in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', sec)
        }
    # Legacy unanchored fallback, now fail-closed (fix #2): accept
    # [0, first '}') as the mins object ONLY when the key right after
    # that '}' is queries_p50 — the section order is queries,
    # queries_p50, ... in every recorded round, so any other
    # continuation proves the tail starts PAST the mins.
    end = tail.find("}")
    if end == -1:
        return {}
    after = re.match(r'\s*,\s*"([a-z0-9_]+)"', tail[end + 1:])
    if not after or after.group(1) != "queries_p50":
        return {}
    return {
        g[0]: float(g[1])
        for g in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', tail[:end])
    }


def load_bench_file(path: str | Path) -> dict:
    """Load a bench record file for comparison: {queries,
    queries_spread, calib, sf}. Prefers a sibling ``<stem>.mins.json``
    sidecar (fix #3) for the mins; spread/calib still come from the
    main record when recoverable."""
    path = Path(path)
    data = json.loads(path.read_text())
    sf = data.get("sf")
    if sf is None and isinstance(data.get("parsed"), dict):
        sf = data["parsed"].get("sf")
    if sf is None and isinstance(data.get("tail"), str):
        # driver wrappers carry sf only inside the recorded line —
        # without this, bench_compare's cross-scale refusal could
        # never fire on the very files the driver writes
        m = re.search(r'"sf"\s*:\s*([0-9.]+)', data["tail"])
        if m:
            sf = float(m.group(1))
    if sf is None and isinstance(data.get("by_sf"), dict) and data["by_sf"]:
        slots = data["by_sf"]
        sf = float("0.1" if "0.1" in slots else sorted(slots, key=float)[-1])
    out: dict = {
        "queries": recover_queries(data),
        "queries_spread": {},
        "calib": {},
        "sf": sf,
    }
    if isinstance(data.get("queries_spread"), dict):
        out["queries_spread"] = data["queries_spread"]
    if isinstance(data.get("calib"), dict):
        out["calib"] = data["calib"]
    tail = data.get("tail")
    if isinstance(tail, str):
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
    sidecar = path.with_suffix(".mins.json")
    if sidecar.exists():
        try:
            rec = json.loads(sidecar.read_text())
            if isinstance(rec.get("queries"), dict):
                out["queries"] = {
                    k: float(v) for k, v in rec["queries"].items()
                }
                if out.get("sf") is None:
                    out["sf"] = rec.get("sf")
        except (OSError, ValueError):
            pass
    return out
