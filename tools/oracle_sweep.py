#!/usr/bin/env python
"""Run EVERY registry oracle at an arbitrary scale factor — the
cross-scale robustness sweep that caught the exact-half ROUND
divergence class (engines disagree on .xxxx5 boundaries that rational
ratios and integer micro-unit sums produce; see the floor-form
rounding discipline in operators/text_analysis.py:quality_scores).

The driver's correctness gate runs at sf0.01 and the local parity
suite at sf0.001; this sweep exists because some divergences only
have support on larger data (more rows -> more chances to land on a
boundary).

Usage: python tools/oracle_sweep.py [sf_dir]   (default sf0.1)
Prints one line per oracle-backed entry; exits nonzero on mismatch.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from lakehouse_to_rag_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(rows, cols):
    # floats normalize to 4dp BY DESIGN: this mirrors the round
    # driver's own comparison (sort columns by name, round doubles to
    # 4dp, value-hash) — the sweep checks exactly the contract the
    # gate checks, no more and no less
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    # spill OUTSIDE the repo: the heavier oracles (image-pHash DP
    # layers) spill tens of GB; an un-set temp_directory lands that
    # in ./.tmp and a killed sweep leaves multi-GB debris behind
    con.execute("SET temp_directory='/tmp/duckspill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    fails = []
    for name in qs:
        if name not in osql:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(osql[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = (
                sorted(sdf.columns) == sorted(dcols)
                and _norm(srows, sdf.columns) == _norm(drows, dcols)
            )
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            fails.append((name, f"ERROR {str(exc)[:120]}"))
            print(f"{name}: ERROR ({time.time() - t0:.0f}s)", flush=True)
            continue
        if not ok:
            fails.append((name, "mismatch"))
        print(
            f"{name}: {'OK' if ok else 'MISMATCH'} {len(srows)} rows "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
    print(f"\n{len(fails)} failures: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
