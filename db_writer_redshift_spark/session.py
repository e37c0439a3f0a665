"""SparkSession factory.

Reference parity: ``createConnection`` (Redshift.php:44-77) builds the PDO
connection and pins ``search_path``; ``testConnection`` (Redshift.php:321-324)
runs ``select current_date``. Here the "connection" is a SparkSession with the
settings every other module assumes:

* UTC session timezone — parquet test data is timestamp_ntz (naive); all
  date/timestamp arithmetic must agree with the DuckDB oracle.
* AQE on (runtime coalescing + skew-join handling) — the scale story for
  100 TB runs; harmless locally.
* shuffle.partitions sized from the env (local[32] default 32; a real
  cluster overrides via spark-submit conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "db_writer_redshift_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    When a session already exists (driver harness, pytest fixture) we return
    it untouched except for session-scoped confs that are safe to set late
    (timezone, AQE, Arrow).
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    builder = (
        builder.config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing knobs, env-overridable for cluster runs. NOTE
        # (round-8, measured): parallelismFirst=false (the "efficiency"
        # setting) coalesces small-BYTES shuffle reads to one task by
        # size — which serialized CPU-dense verify stages whose rows are
        # narrow but each cost an array_intersect (dedup_ppjoin_exact's
        # verify collapsed to a single 16 s task). Size is the wrong
        # proxy for CPU density, so the default stays parallelismFirst
        # (partition count floors at the cluster's parallelism); the
        # advisory size governs how big coalesced partitions get where
        # data IS the cost.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_AQE_ADVISORY_SIZE", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom-filter pushdown: a selective dim-side filter
        # builds a bloom filter that prunes the fact scan before the
        # shuffle — a large-join lever at 100 TB, negligible locally
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # cost-based optimizer: consume ANALYZE statistics
        # (catalog.analyze_table) for cardinality-based join ordering
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # naive parquet timestamps stay naive (match DuckDB semantics)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long and convert (plans/registry.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Session-scoped settings that must hold even on a pre-built session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def configure_existing(spark: SparkSession) -> SparkSession:
    """Pin the confs the engine relies on onto a session built elsewhere
    (e.g. the driver harness passes its own SparkSession into ``entry``)."""
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # a vanilla session defaults to 200 shuffle partitions — far too
        # many tasks for local runs (AQE coalesces, but task setup still
        # costs); align with the core count like get_spark does
        "spark.sql.shuffle.partitions": str(DEFAULT_SHUFFLE_PARTITIONS),
        # AQE coalescing knobs (see get_spark for the parallelismFirst
        # serial-tail rationale)
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": os.environ.get(
            "SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": os.environ.get(
            "SPARK_GRAFT_AQE_ADVISORY_SIZE", "64m"
        ),
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in some deployments; engine still works
    return spark


def configure_s3(spark: SparkSession, s3info: dict) -> dict[str, str]:
    """Wire a table's S3 block onto Hadoop's s3a connector (L-1 parity).

    The reference's COPY carries temporary STS credentials inline
    (Redshift.php:93-106 — access_key_id / secret_access_key /
    session_token — and region; downloadManifest builds its S3Client from
    the same block, Redshift.php:326-343). The Spark analog is the
    ``fs.s3a.*`` Hadoop configuration consulted when a FileSystem for the
    bucket is first created.

    Credentials are scoped PER BUCKET (``fs.s3a.bucket.<name>.*``) so two
    tables loading from different buckets with different STS grants never
    clobber each other — matching the reference, where each COPY statement
    carries its own credentials clause. Returns the conf dict it applied
    (used by tests; values land in the live hadoopConfiguration too).
    """
    creds = s3info.get("credentials", {})
    bucket = s3info.get("bucket")
    prefix = f"fs.s3a.bucket.{bucket}" if bucket else "fs.s3a"
    mapping = {
        f"{prefix}.access.key": creds.get("access_key_id"),
        f"{prefix}.secret.key": creds.get("secret_access_key"),
        f"{prefix}.session.token": creds.get("session_token"),
        f"{prefix}.endpoint.region": s3info.get("region"),
    }
    applied = {k: v for k, v in mapping.items() if v}
    if applied.get(f"{prefix}.session.token"):
        # session tokens require the temporary-credentials provider
        applied[f"{prefix}.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
        )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in applied.items():
        hconf.set(k, v)
    return applied


def test_connection(spark: SparkSession) -> None:
    """Smoke probe — reference ``testConnection`` runs ``select current_date``
    (Redshift.php:321-324)."""
    spark.sql("SELECT current_date()").collect()
