"""S3A object-store wiring for raw ingest (MinIO parity).

Reference storage is a MinIO endpoint with key-pair auth
(src/helpers/minio_service.py:11-23); objects land in buckets the ETL
reads back one at a time. Spark-native shape: configure the S3A
filesystem once per session, then every ``spark.read`` over an
``s3a://bucket/...`` URI lists and downloads objects DISTRIBUTED — no
driver-side byte shuttling, and the same glob/pushdown semantics as a
posix path (read_raw_json works unchanged on either).

Hadoop confs are applied at runtime on the live ``hadoopConfiguration``
(no session restart): nothing validates until the first s3a:// read
instantiates the filesystem, so this module is unit-testable by config
inspection in environments without an object store or the hadoop-aws
jar (this container).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# pinned defaults every MinIO deployment needs; overridable via kwargs
_S3A_BASE = {
    # MinIO serves a single host, not per-bucket virtual hosts
    "fs.s3a.path.style.access": "true",
    "fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
}


def configure_s3a(
    spark: SparkSession,
    endpoint: str,
    access_key: str | None = None,
    secret_key: str | None = None,
    secure: bool = False,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Point the session's S3A filesystem at an object store.

    Mirrors the reference's MinIO client surface (endpoint, key pair,
    ``secure`` TLS toggle — minio_service.py:11-23). Returns the confs
    applied, for inspection/logging. Credentials fall back to the
    chain provider (env vars / instance profile) when no key pair is
    given — the right default on a real cluster where keys should
    never ride in code.
    """
    conf = dict(_S3A_BASE)
    conf["fs.s3a.endpoint"] = endpoint
    conf["fs.s3a.connection.ssl.enabled"] = "true" if secure else "false"
    if access_key is not None and secret_key is not None:
        conf["fs.s3a.access.key"] = access_key
        conf["fs.s3a.secret.key"] = secret_key
        conf["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
        )
    if extra:
        conf.update(extra)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
    return conf


def s3a_url(bucket: str, key: str = "") -> str:
    """``s3a://bucket/key`` — the URI shape every reader here accepts."""
    key = key.lstrip("/")
    return f"s3a://{bucket}/{key}" if key else f"s3a://{bucket}"


def get_s3a_conf(spark: SparkSession, name: str) -> str | None:
    """Read back one live hadoop conf (None if unset)."""
    v = spark.sparkContext._jsc.hadoopConfiguration().get(name)
    return v if v is not None else None
