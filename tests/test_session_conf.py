"""Session-factory conf contracts added by the r13 optimization round."""

import os

from lakehouse_to_rag_spark.session import get_spark


def test_blas_threads_pinned_in_worker_env(spark):
    """get_spark pins per-worker BLAS threading to 1 (guide §4.5:
    one Python worker per task slot — nested BLAS auto-threading
    oversubscribes cores slot×threads) unless the caller exported an
    explicit override."""
    for var in (
        "OPENBLAS_NUM_THREADS",
        "OMP_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
    ):
        expected = os.environ.get(var, "1")
        assert spark.conf.get(f"spark.executorEnv.{var}") == expected


def test_tiny_df_is_single_slice(spark):
    """tiny_df keeps driver-bounded row lists in ONE slice — the
    defaultParallelism fan-out made every single-task consumer
    (coalesce(1) writes above all) serially re-evaluate 32 pickled
    slices through the Python worker protocol."""
    from lakehouse_to_rag_spark.sources.tables import tiny_df

    df = tiny_df(spark, [(1, "a"), (2, "b")], "id long, s string")
    assert df.rdd.getNumPartitions() == 1
    assert sorted((r["id"], r["s"]) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    empty = tiny_df(spark, [], "id long")
    assert empty.count() == 0


def test_blas_pin_respects_explicit_env(monkeypatch):
    """An exported thread-count env var must win over the default pin
    (helper-level check — getOrCreate() would reuse the fixture's
    context without re-applying builder configs)."""
    from lakehouse_to_rag_spark.session import _blas_worker_env

    monkeypatch.setenv("OPENBLAS_NUM_THREADS", "4")
    env = _blas_worker_env()
    assert env["OPENBLAS_NUM_THREADS"] == "4"
    assert env["OMP_NUM_THREADS"] == "1"
    monkeypatch.delenv("OPENBLAS_NUM_THREADS")
    assert _blas_worker_env()["OPENBLAS_NUM_THREADS"] == "1"
