"""Iceberg table integration (feature-gated; parquet dirs are the stand-in).

The reference's V2 storage design is Iceberg end-to-end
(/root/reference/src/storage/iceberg.rs:317-334 — partition spec
``day(timestamp_ms), bucket(trace_id, 16)``; projected scan :226-306;
docs/ARCHITECTURE_V2_ICEBERG.md:198-209). On a real cluster this module is
the sink/source; in this sandbox the runtime jar is ABSENT and unresolvable
(negative probe: no ``*iceberg*`` jar under pyspark/jars, no ivy cache, and
``spark.jars.packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13``
kills the gateway on the offline host — documented in
.claude/skills/verify/SKILL.md), so every entry point feature-gates on
``iceberg_available`` and the tests skip with the probe message.

Usage on a cluster with the jar + catalog configured::

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=s3://... job.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PROBE_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an iceberg-spark-runtime jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_PROBE_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Projected Iceberg scan (S4, iceberg.rs:226-306). Column pruning and
    partition pruning are Catalyst's job — select/filter on the result and
    the scan reads only the needed files/columns."""
    _require(spark)
    return spark.read.format("iceberg").load(table)


def write_routed_iceberg(routed: DataFrame, table: str) -> None:
    """Routed-sink append with the reference's partition spec
    (iceberg.rs:317-334): ``days(timestamp), bucket(trace_k1, 16)`` plus the
    decision sink column. One DataFrameWriterV2 write, three logical sinks —
    the Iceberg analog of write_routed's partitioned parquet fan-out."""
    _require(routed.sparkSession)
    parts = []
    if "timestamp_ms" in routed.columns:
        routed = routed.withColumn("ts", F.timestamp_millis(F.col("timestamp_ms")))
        parts.append(F.days(F.col("ts")))
    if "trace_k1" in routed.columns:
        parts.append(F.bucket(16, F.col("trace_k1")))
    parts.append(F.col("decision"))
    routed.writeTo(table).partitionedBy(parts[0], *parts[1:]).createOrReplace()


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "iceberg-spark-runtime is not on the classpath; this sandbox has "
            "no jar and no network ivy resolution (negative probe in "
            ".claude/skills/verify/SKILL.md). Run with --packages "
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> on a "
            "connected cluster."
        )
