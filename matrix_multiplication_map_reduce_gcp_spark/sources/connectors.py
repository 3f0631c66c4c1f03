"""Optional-connector gates: Delta Lake, Iceberg, Kafka.

Their jars/packages aren't in this container, so each factory probes
for the dependency and raises a clear, actionable error instead of a
py4j class-not-found somewhere deep in a job. When the jars land, each
body is the real wiring (documented inline) — callers don't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    def __init__(self, name: str, hint: str):
        super().__init__(
            f"{name} support is not available in this environment: {hint}"
        )


def _has_jvm_class(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta table read (needs delta-spark on the classpath)."""
    if not _has_jvm_class(spark, "org.apache.spark.sql.delta.DeltaLog"):
        raise ConnectorUnavailable(
            "Delta Lake", "add delta-spark jars + spark.sql.extensions config"
        )
    return spark.read.format("delta").load(path)  # pragma: no cover


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table read (needs iceberg-spark-runtime + catalog conf)."""
    if not _has_jvm_class(spark, "org.apache.iceberg.Table"):
        raise ConnectorUnavailable(
            "Apache Iceberg",
            "add iceberg-spark-runtime jars + spark.sql.catalog.* config",
        )
    return spark.read.format("iceberg").load(table)  # pragma: no cover


def read_jdbc(
    spark: SparkSession, url: str, table: str, driver: str = "org.postgresql.Driver"
) -> DataFrame:
    """JDBC table read (needs the database's JDBC driver jar)."""
    if not _has_jvm_class(spark, driver):
        raise ConnectorUnavailable(
            "JDBC", f"driver class {driver} not on the classpath"
        )
    return (  # pragma: no cover
        spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
    )


def read_kafka_stream(spark: SparkSession, brokers: str, topic: str) -> DataFrame:
    """Kafka streaming source (needs spark-sql-kafka)."""
    if not _has_jvm_class(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    ):
        raise ConnectorUnavailable(
            "Kafka", "add spark-sql-kafka-0-10 jars to the classpath"
        )
    return (  # pragma: no cover
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .load()
    )
