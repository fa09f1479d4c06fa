#!/usr/bin/env python
"""Dev harness for the unigram-LM oracle: run the canonical builder
(plans/registry.py::_unigram_oracle) against DuckDB and diff against
the engine at a given sf dir (default sf0.001)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import duckdb

    from lakehouse_to_rag_spark.functions.unigram import (
        unigram_encode,
        unigram_train,
    )
    from lakehouse_to_rag_spark.plans.registry import _unigram_oracle
    from lakehouse_to_rag_spark.session import get_spark
    from lakehouse_to_rag_spark.sources.tables import load_table

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sql = _unigram_oracle()
    print(f"oracle: {len(sql)} chars")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    t0 = time.time()
    want = dict(con.execute(sql).fetchall())
    print(f"duckdb: {time.time() - t0:.1f}s rows={len(want)}")

    spark = get_spark("dev-unigram")
    d = load_table(spark, sf, "documents")
    t0 = time.time()
    logp = unigram_train(d, sample_rows=500, max_multi=200, em_iters=2)
    enc = unigram_encode(
        load_table(spark, sf, "documents", parallelize=True), logp
    )
    got = {r["doc_id"]: r["n_tokens"] for r in enc.collect()}
    print(f"spark: {time.time() - t0:.1f}s rows={len(got)}")
    diff = {k: (got.get(k), want.get(k)) for k in set(got) | set(want)
            if got.get(k) != want.get(k)}
    print("EQUAL" if not diff else f"DIFF {len(diff)}: {list(diff.items())[:5]}")


if __name__ == "__main__":
    main()
