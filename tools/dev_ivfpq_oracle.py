"""Dev harness for the knn_ivfpq oracle: builds the candidate SQL,
runs engine vs DuckDB at one SF, diffs rows. Not part of the suite."""
import sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# ---- oracle SQL (mirrors simi.knn_ivfpq_rerank with iters=3) --------
NC, M, DSUB, PQK, ITERS, NPROBE, RERANK, K, SAMPLE = 16, 8, 8, 64, 3, 4, 50, 5, 2048

D2 = (
    "list_inner_product({a}, {a}) - 2 * list_inner_product({a}, {b})"
    " + list_inner_product({b}, {b})"
)


def d2(a, b):
    return D2.format(a=a, b=b)


COARSE_ITER = """, ka{i} AS (
  SELECT pos, v, cid FROM (
    SELECT s.pos, s.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY s.pos
             ORDER BY ROUND(%s, 12) ASC, c.cid ASC) AS rn
    FROM samp s CROSS JOIN kc{prev} c
  ) WHERE rn = 1
), kc{i} AS (
  SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
  FROM kc{prev} p LEFT JOIN (
    SELECT cid, list(mu ORDER BY dim) AS cv FROM (
      -- exact integer-micros mean (order-independent; see _lloyd)
      SELECT cid, dim,
             CASE WHEN s >= 0 THEN FLOOR(s / cnt + 0.5)
                  ELSE -FLOOR(-s / cnt + 0.5) END / 1e12 AS mu
      FROM (
        SELECT cid, dim, SUM(ROUND(x * 1e12, 0)) AS s, COUNT(*) AS cnt
        FROM (
          SELECT cid, unnest(v) AS x, generate_subscripts(v, 1) AS dim
          FROM ka{i}
        ) GROUP BY cid, dim
      )
    ) GROUP BY cid
  ) n ON p.cid = n.cid
)""" % d2("s.v", "c.cv")

BOOK_ITER = """, ba{i} AS (
  SELECT pos, j, sv, code FROM (
    SELECT r.pos, r.j, r.sv, b.code,
           ROW_NUMBER() OVER (PARTITION BY r.pos, r.j
             ORDER BY ROUND(%s, 12) ASC, b.code ASC) AS rn
    FROM rsub r JOIN bk{prev} b ON r.j = b.j
  ) WHERE rn = 1
), bk{i} AS (
  SELECT p.j, p.code, COALESCE(n.bv, p.bv) AS bv
  FROM bk{prev} p LEFT JOIN (
    SELECT j, code, list(mu ORDER BY dim) AS bv FROM (
      SELECT j, code, dim,
             CASE WHEN s >= 0 THEN FLOOR(s / cnt + 0.5)
                  ELSE -FLOOR(-s / cnt + 0.5) END / 1e12 AS mu
      FROM (
        SELECT j, code, dim, SUM(ROUND(x * 1e12, 0)) AS s,
               COUNT(*) AS cnt
        FROM (
          SELECT j, code, unnest(sv) AS x,
                 generate_subscripts(sv, 1) AS dim
          FROM ba{i}
        ) GROUP BY j, code, dim
      )
    ) GROUP BY j, code
  ) n ON p.j = n.j AND p.code = n.code
)""" % d2("r.sv", "b.bv")

ORACLE = (
    f"""WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings
), unit AS (
  -- _maybe_unit: 6dp-quantized norm (parity anchor), then 12dp
  -- component round — both divisions bit-identical across engines
  SELECT vec_id, list_transform(v0, x -> ROUND(x / nrm, 12)) AS v
  FROM (
    SELECT vec_id, v0,
           CASE WHEN ROUND(sqrt(list_inner_product(v0, v0)), 6) = 0
                THEN 1.0
                ELSE ROUND(sqrt(list_inner_product(v0, v0)), 6) END AS nrm
    FROM raw)
), samp AS (
  -- training sample: first {SAMPLE} by id, position-tagged
  SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY vec_id) AS pos
  FROM unit ORDER BY vec_id LIMIT {SAMPLE}
), kc0 AS (
  -- coarse init: first {NC} DISTINCT sample vectors in sample order
  SELECT ROW_NUMBER() OVER (ORDER BY fp) - 1 AS cid, v AS cv
  FROM (SELECT v, MIN(pos) AS fp FROM samp GROUP BY v)
  ORDER BY fp LIMIT {NC}
)"""
    + "".join(COARSE_ITER.format(i=i, prev=i - 1) for i in range(1, ITERS + 1))
    + f"""
, kasg AS (
  -- FRESH sample assignment against the final centroids (the
  -- engine reassigns after the loop before taking residuals)
  SELECT pos, cid FROM (
    SELECT s.pos, c.cid,
           ROW_NUMBER() OVER (PARTITION BY s.pos
             ORDER BY ROUND({d2('s.v', 'c.cv')}, 12) ASC, c.cid ASC) AS rn
    FROM samp s CROSS JOIN kc{ITERS} c
  ) WHERE rn = 1
), sres AS (
  -- sample residuals vs final coarse assignment
  SELECT a.pos, list(s.x - c.y ORDER BY s.dim) AS rv
  FROM kasg a
  JOIN (SELECT pos, unnest(v) AS x, generate_subscripts(v, 1) AS dim
        FROM samp) s ON s.pos = a.pos
  JOIN (SELECT cid, unnest(cv) AS y, generate_subscripts(cv, 1) AS dim
        FROM kc{ITERS}) c ON c.cid = a.cid AND c.dim = s.dim
  GROUP BY a.pos
), rsub AS (
  SELECT pos, j, list_slice(rv, j * {DSUB} + 1, j * {DSUB} + {DSUB}) AS sv
  FROM sres CROSS JOIN (SELECT unnest(range({M})) AS j)
), bk0 AS (
  -- per-subspace codebook init: first {PQK} DISTINCT residual
  -- subvectors in sample order
  SELECT j, ROW_NUMBER() OVER (PARTITION BY j ORDER BY fp) - 1 AS code,
         sv AS bv
  FROM (SELECT j, sv, MIN(pos) AS fp FROM rsub GROUP BY j, sv)
  QUALIFY code < {PQK}
)"""
    + "".join(BOOK_ITER.format(i=i, prev=i - 1) for i in range(1, ITERS + 1))
    + f"""
, easg AS (
  -- encode: coarse-assign the WHOLE corpus
  SELECT vec_id, v, cid FROM (
    SELECT u.vec_id, u.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY u.vec_id
             ORDER BY ROUND({d2('u.v', 'c.cv')}, 12) ASC, c.cid ASC) AS rn
    FROM unit u CROSS JOIN kc{ITERS} c
  ) WHERE rn = 1
), eres AS (
  SELECT a.vec_id, a.cid, list(s.x - c.y ORDER BY s.dim) AS rv
  FROM easg a
  JOIN (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS dim
        FROM unit) s ON s.vec_id = a.vec_id
  JOIN (SELECT cid, unnest(cv) AS y, generate_subscripts(cv, 1) AS dim
        FROM kc{ITERS}) c ON c.cid = a.cid AND c.dim = s.dim
  GROUP BY a.vec_id, a.cid
), esub AS (
  SELECT vec_id, cid, j,
         list_slice(rv, j * {DSUB} + 1, j * {DSUB} + {DSUB}) AS sv
  FROM eres CROSS JOIN (SELECT unnest(range({M})) AS j)
), ecodes AS (
  SELECT vec_id, j, code FROM (
    SELECT e.vec_id, e.j, b.code,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id, e.j
             ORDER BY ROUND({d2('e.sv', 'b.bv')}, 12) ASC, b.code ASC) AS rn
    FROM esub e JOIN bk{ITERS} b ON e.j = b.j
  ) WHERE rn = 1
), probes AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ROUND({d2('q.v', 'c.cv')}, 12) ASC, c.cid ASC) AS rn
    FROM unit q CROSS JOIN kc{ITERS} c WHERE q.vec_id < 10
  ) WHERE rn <= {NPROBE}
), qres0 AS (
  -- per (query, probed cluster): the query's residual vector
  SELECT pb.query_id, pb.cid, list(qx.x - cy.y ORDER BY qx.dim) AS rv
  FROM probes pb
  JOIN (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS dim
        FROM unit) qx ON qx.vec_id = pb.query_id
  JOIN (SELECT cid, unnest(cv) AS y, generate_subscripts(cv, 1) AS dim
        FROM kc{ITERS}) cy ON cy.cid = pb.cid AND cy.dim = qx.dim
  GROUP BY pb.query_id, pb.cid
), qres AS (
  SELECT query_id, cid, j,
         list_slice(rv, j * {DSUB} + 1, j * {DSUB} + {DSUB}) AS qsv
  FROM qres0 CROSS JOIN (SELECT unnest(range({M})) AS j)
), adc AS (
  SELECT p.query_id, n.vec_id AS neighbor_id,
         ROUND(SUM({d2('qs.qsv', 'b.bv')}), 4) AS d
  FROM probes p
  JOIN easg n ON n.cid = p.cid AND n.vec_id <> p.query_id
  JOIN ecodes nc ON nc.vec_id = n.vec_id
  JOIN qres qs ON qs.query_id = p.query_id AND qs.cid = p.cid
              AND qs.j = nc.j
  JOIN bk{ITERS} b ON b.j = nc.j AND b.code = nc.code
  GROUP BY p.query_id, n.vec_id
), shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY d ASC, neighbor_id ASC) AS rn
    FROM adc) WHERE rn <= {RERANK}
), rr AS (
  SELECT s.query_id, s.neighbor_id,
         ROUND(list_cosine_similarity(q.v0, n.v0), 4) AS cosine
  FROM shortlist s
  JOIN raw q ON q.vec_id = s.query_id
  JOIN raw n ON n.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM rr)
WHERE rank <= {K}"""
)

if __name__ == "__main__":
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    drows = sorted(con.execute(ORACLE).fetchall())
    print("duck rows:", len(drows))

    from lakehouse_to_rag_spark.session import get_spark
    from lakehouse_to_rag_spark.sources.tables import load_table
    import lakehouse_to_rag_spark.operators.similarity as simi
    from pyspark.sql import functions as F

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
