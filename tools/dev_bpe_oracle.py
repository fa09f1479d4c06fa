"""Dev harness for the bpe_token_counts oracle: runs the engine vs
DuckDB at one SF and diffs (doc_id, n_tokens) rows. Not part of the
suite. The SQL comes from the registry's ``_bpe_oracle`` builder once
installed; during bring-up this file owned the draft."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

if __name__ == "__main__":
    import duckdb

    from lakehouse_to_rag_spark.plans.registry import _bpe_oracle

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    drows = sorted(con.execute(_bpe_oracle(num_merges=200)).fetchall())
    print("duck rows:", len(drows))

    from lakehouse_to_rag_spark.plans.registry import QUERIES
    from lakehouse_to_rag_spark.session import get_spark

    spark = get_spark("dev-bpe")
    srows = sorted(
        tuple(r) for r in QUERIES["bpe_token_counts"](spark, SF).collect()
    )
    print("spark rows:", len(srows))
    bad = [(s, d) for s, d in zip(srows, drows) if s != d]
    print("mismatches:", len(bad), bad[:5])
