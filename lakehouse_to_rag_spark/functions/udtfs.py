"""Python UDTFs (Spark 4 table-function API) — the row→table UDF
surface (SURVEY.md §2.9/2.10 breadth; the reference has only scalar
UDFs). Each UDTF here is deliberately simple enough to carry a SQL
oracle, so the UDTF execution path itself sits under the driver's
value-hash correctness gate."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="span_index: bigint, start: bigint, span: string")
class FixedSpans:
    """Fixed-stride span fan-out with offsets: one output row per
    ``size``-char window of the input (no overlap). The table-function
    twin of the fixed-stride chunker — used via LATERAL join:

        SELECT d.doc_id, s.* FROM documents d,
        LATERAL fixed_spans(d.text, 200) s
    """

    def eval(self, text: str, size: int):
        if text is None or size is None or size <= 0:
            return
        i, idx = 0, 0
        while i < len(text):
            yield idx, i, text[i : i + size]
            idx += 1
            i += size


def register_udtfs(spark) -> None:
    spark.udtf.register("fixed_spans", FixedSpans)
