"""Dev harness for the knn_ivfpq oracle: runs engine vs DuckDB at one
SF and diffs rows. Not part of the suite.

The SQL comes from the registry's ``_ivfpq_oracle`` builder — the one
the driver actually executes — so this tool can never drift into
testing a stale copy of the pipeline (it used to carry a verbatim
duplicate of the ~200-line SQL; any fix to the real oracle silently
left the duplicate behind)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# the registry entry's pinned parameters (knn_ivfpq @ plans/registry.py)
NC, M, DSUB, PQK, ITERS, NPROBE, RERANK, K, SAMPLE = (
    16, 8, 8, 64, 3, 4, 50, 5, 2048,
)

if __name__ == "__main__":
    import duckdb

    from lakehouse_to_rag_spark.plans.registry import _ivfpq_oracle

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    oracle = _ivfpq_oracle(
        nc=NC, m=M, dsub=DSUB, pqk=PQK, iters=ITERS,
        nprobe=NPROBE, rerank=RERANK, k=K, sample=SAMPLE,
    )
    drows = sorted(con.execute(oracle).fetchall())
    print("duck rows:", len(drows))

    from pyspark.sql import functions as F

    import lakehouse_to_rag_spark.operators.similarity as simi
    from lakehouse_to_rag_spark.session import get_spark
    from lakehouse_to_rag_spark.sources.tables import load_table

    spark = get_spark("dev-ivfpq")
    e = load_table(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    srows = sorted(
        tuple(r)
        for r in simi.knn_ivfpq_rerank(
            e, queries, k=K, num_centroids=NC, nprobe=NPROBE, m=M,
            pq_k=PQK, rerank=RERANK, sample_rows=SAMPLE, iters=ITERS,
        ).collect()
    )
    print("spark rows:", len(srows))
    bad = [(a, b) for a, b in zip(srows, drows) if a != b]
    print("mismatches:", len(bad))
    for a, b in bad[:10]:
        print("  spark", a, " duck", b)
