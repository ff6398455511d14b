"""External stream connectors: Kafka source/sink wiring; tcp/syslog inputs.

Reference: the kafka input/output pair is the most common real deployment
edge (rakelib/plugins-metadata.json:424).  The Spark analog is the built-in
kafka datasource (``spark-sql-kafka-0-10``), which is NOT bundled with pip
pyspark — at deploy time submit with

    --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>

Everything here is option wiring + codec decode around that datasource so a
config's `kafka { bootstrap_servers topics codec }` maps 1:1; the functions
raise NotImplementedError with the exact submit flag when the jar is absent
(same honest gating as the avro codec).

Scale notes: one Spark input partition per Kafka partition — size the topic
partition count to the executor core count; `maxOffsetsPerTrigger` is the
micro-batch back-pressure knob (the reference's queue depth analog); the
sink's exactly-once story composes with the checkpointed commit log the
same way the file sink does (Kafka transactions are at-least-once from
Spark, so dedup on a key downstream or use the idempotent sink pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_available(spark: SparkSession) -> bool:
    """True when the kafka datasource jar is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:  # noqa: BLE001 - Py4J wraps ClassNotFoundException
        return False


_SUBMIT_HINT = ("kafka connector needs the datasource package: spark-submit "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>")


def kafka_source(spark: SparkSession, bootstrap_servers: str, topics: str,
                 codec: str = "json_lines", schema: str | None = None,
                 starting_offsets: str = "latest",
                 max_offsets_per_trigger: int | None = None) -> DataFrame:
    """kafka input analog: readStream + codec decode of the value bytes.

    codec "json_lines" parses value as JSON into `schema` columns (required);
    codec "line"/"plain" yields a `message` string column.  Kafka metadata
    (topic/partition/offset/timestamp) rides along like the reference's
    @metadata kafka fields.
    """
    if not kafka_available(spark):
        raise NotImplementedError(_SUBMIT_HINT)
    reader = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("subscribe", topics)
              .option("startingOffsets", starting_offsets))
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    raw = reader.load()
    meta = [F.col("topic"), F.col("partition"), F.col("offset"),
            F.col("timestamp").alias("kafka_ts")]
    val = F.col("value").cast("string")
    if codec in ("line", "plain"):
        return raw.select(val.alias("message"), *meta)
    if codec == "json_lines":
        if not schema:
            raise ValueError("kafka_source codec=json_lines needs a schema")
        return raw.select(F.from_json(val, schema).alias("j"), *meta) \
                  .select("j.*", *[c for c in ("topic", "partition", "offset", "kafka_ts")])
    raise ValueError(f"unsupported kafka codec {codec!r}")


def tcp_source(spark: SparkSession, host: str, port: int,
               codec: str = "line", schema: str | None = None) -> DataFrame:
    """tcp input analog (plugins-metadata.json: logstash-input-tcp) over
    Spark's built-in socket source (no extra jar).

    The socket source is NOT replayable (no offsets — same as the
    reference's tcp input before the persisted queue); for at-least-once
    delivery put a durable bus (kafka / files) in front, exactly as the
    reference docs recommend for tcp.  codec "line"/"plain" -> `message`
    string column; "json_lines" -> `schema` columns.
    """
    raw = (spark.readStream.format("socket")
           .option("host", host).option("port", int(port)).load())
    val = F.col("value")
    if codec in ("line", "plain"):
        return raw.select(val.alias("message"))
    if codec == "json_lines":
        if not schema:
            raise ValueError("tcp_source codec=json_lines needs a schema")
        return raw.select(F.from_json(val, schema).alias("j")).select("j.*")
    raise ValueError(f"unsupported tcp codec {codec!r}")


def syslog_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """syslog input analog (logstash-input-syslog): tcp + RFC3164 parse.

    The reference input is literally 'tcp/udp + grok SYSLOGLINE + priority
    decode' (its docs say as much) — composed here from :func:`tcp_source`,
    the grok SYSLOGBASE2 shape and the syslog_pri math, all pure Columns on
    the stream.  Unparsable lines tag `_syslogparsefailure` and keep the
    raw message (reference behavior).
    """
    from logstash_spark.functions.decorators import add_tag

    lines = tcp_source(spark, host, port, codec="line")
    # <PRI>MMM dd HH:mm:ss host program[pid]: msg
    pat = (r"^(?:<(\d+)>)?([A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) "
           r"(\S+) ([\w./-]+)(?:\[(\d+)\])?: (.*)$")
    pri = F.regexp_extract("message", pat, 1).try_cast("int")
    parsed = (lines
              .withColumn("priority", pri)
              .withColumn("facility", (pri / 8).cast("int"))
              .withColumn("severity", pri % 8)
              .withColumn("sys_ts", F.nullif(F.regexp_extract("message", pat, 2), F.lit("")))
              .withColumn("logsource", F.nullif(F.regexp_extract("message", pat, 3), F.lit("")))
              .withColumn("program", F.nullif(F.regexp_extract("message", pat, 4), F.lit("")))
              .withColumn("pid", F.regexp_extract("message", pat, 5).try_cast("int"))
              .withColumn("msg", F.nullif(F.regexp_extract("message", pat, 6), F.lit(""))))
    return add_tag(parsed, "_syslogparsefailure",
                   when=~F.col("message").rlike(pat))


def kafka_sink(df: DataFrame, bootstrap_servers: str, topic: str,
               checkpoint: str, key_col: str | None = None):
    """kafka output analog: rows serialized as JSON to `value`, started as a
    streaming query (caller awaits/stops)."""
    if not kafka_available(df.sparkSession):
        raise NotImplementedError(_SUBMIT_HINT)
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return (df.select(*cols).writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint)
            .start())
