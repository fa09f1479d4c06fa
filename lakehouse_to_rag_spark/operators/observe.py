"""Pipeline monitoring via Spark observed metrics.

The reference's "Monitoring" section (README.md:265-280) is log-line
counting around each Airflow task — row counts and null counts printed
per stage. Spark's native upgrade is ``Observation`` /
``DataFrame.observe``: metrics are computed *inside* the job on the
same pass as the transformation (accumulator-backed, exactly-once per
action), instead of a second count() job per stage.

At 100 TB the distinction is load-bearing: a monitoring count() per
layer re-reads that layer; ``observe`` rides the action that was
already running, so instrumenting bronze and silver costs zero extra
scans when gold is written. For streams the same metric expressions
surface in ``StreamingQueryProgress.observedMetrics`` per micro-batch.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from lakehouse_to_rag_spark.operators.bronze import bronze_transform
from lakehouse_to_rag_spark.operators.gold import gold_transform
from lakehouse_to_rag_spark.operators.pipeline import (
    DETERMINISTIC_TS,
    documents_as_raw,
)
from lakehouse_to_rag_spark.operators.silver import silver_transform
from lakehouse_to_rag_spark.sources.tables import load_table


def layer_metrics(content_col: str = "content") -> list:
    """Standard per-layer quality metrics (the reference's logged
    row/null counts, plus length stats)."""
    c = F.col(content_col)
    return [
        F.count(F.lit(1)).alias("rows"),
        F.count(F.when(c.isNull() | (F.length(c) == 0), 1)).alias("empty_rows"),
        F.round(F.avg(F.length(c)), 4).alias("avg_content_length"),
        F.max(F.length(c)).alias("max_content_length"),
    ]


def observed(
    df: DataFrame, name: str, content_col: str = "content"
) -> tuple[DataFrame, Observation]:
    """Attach an Observation to ``df``. The metrics materialize when
    the caller's next action over the returned frame runs — no extra
    job. ``obs.get`` blocks until that action completes."""
    obs = Observation(name)
    return df.observe(obs, *layer_metrics(content_col)), obs


def run_medallion_observed(
    spark: SparkSession,
    sf_dir: str,
    deterministic: bool = True,
    min_content_length: int = 50,
) -> tuple[dict[str, DataFrame], dict[str, Observation]]:
    """bronze→silver→gold with per-layer observed metrics.

    The instrumented bronze feeds silver and the instrumented silver
    feeds gold, so ONE action on gold (count/write) computes all three
    layers' metrics in the same pass — the monitoring upgrade over the
    reference's per-stage count logging (README.md:265-280).
    """
    ts = DETERMINISTIC_TS if deterministic else None
    raw = documents_as_raw(load_table(spark, sf_dir, "documents"))
    bronze = bronze_transform(
        raw, id_cols=("url", "source", "title", "doc_id", "lang"), processed_at=ts
    )
    bronze, bronze_obs = observed(bronze, "bronze")
    silver = silver_transform(
        bronze,
        key_col="url",
        order_cols=("processed_at", "doc_id"),
        min_content_length=min_content_length,
        silver_processed_at=ts,
    )
    silver, silver_obs = observed(silver, "silver")
    gold = gold_transform(silver, with_index=True)
    gold, gold_obs = observed(gold, "gold", content_col="chunk")
    layers = {"bronze": bronze, "silver": silver, "gold": gold}
    obs = {"bronze": bronze_obs, "silver": silver_obs, "gold": gold_obs}
    return layers, obs


def metrics_row(obs: Observation) -> dict[str, Any]:
    """Blocking fetch of an observation's metric row as a dict."""
    return dict(obs.get)
