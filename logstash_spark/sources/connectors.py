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
    if codec == "msgpack":
        from logstash_spark.operators.codecs_binary import msgpack_decode

        if not schema:
            raise ValueError("kafka_source codec=msgpack needs a schema")
        staged = raw.select(F.col("value").alias("__raw"), *meta)
        return msgpack_decode(staged, "__raw", schema).drop("__raw")
    if codec == "fluent":
        from logstash_spark.operators.codecs_binary import fluent_decode

        staged = raw.select(F.col("value").alias("__raw"), *meta)
        return fluent_decode(staged, "__raw")
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


def tcp_sink(df: DataFrame, host: str, port: int,
             message_col: str | None = None) -> int:
    """tcp output analog (logstash-output-tcp, client mode): each partition
    opens one socket and streams its rows as newline-delimited text —
    executor-side, no driver collect, connection count = partition count
    (bound it with coalesce upstream for a single-endpoint receiver).
    Returns the number of rows sent.  For streaming, call per micro-batch
    inside foreachBatch."""
    col = (F.col(message_col).cast("string") if message_col
           else F.to_json(F.struct(*df.columns)))
    payload = df.select(col.alias("line"))

    def send_partition(rows):
        import socket as _socket

        sent = 0
        sock = None
        try:
            for row in rows:
                if sock is None:  # connect lazily: empty partitions stay silent
                    sock = _socket.create_connection((host, int(port)), timeout=30)
                sock.sendall((row.line + "\n").encode("utf-8"))
                sent += 1
        finally:
            if sock is not None:
                sock.close()
        yield sent

    return sum(payload.rdd.mapPartitions(send_partition).collect())


def elasticsearch_sink(df: DataFrame, index: str, id_col: str,
                       path: str | None = None,
                       nodes: str | None = None) -> None:
    """elasticsearch output analog (plugins-metadata.json:
    logstash-output-elasticsearch).  Two modes:

    * ``path=`` — write the exact `_bulk` API wire format (es_bulk codec)
      as text files: the sandbox-testable shape, and directly POSTable.
    * ``nodes=`` — the real cluster mode via the es-hadoop datasource
      (`org.elasticsearch.spark.sql`), jar-gated like kafka/avro.
    """
    if path:
        from logstash_spark.functions.decorators import strip_metadata
        from logstash_spark.operators.codecs import es_bulk_encode

        clean = strip_metadata(df)
        doc_cols = [c for c in clean.columns if c != id_col] + [id_col]
        bulk = es_bulk_encode(clean, index=index, id_col=id_col,
                              doc_cols=doc_cols)
        bulk.select(F.col("bulk").alias("value")).write.mode("overwrite").text(path)
        return
    if nodes:
        try:
            (df.write.format("org.elasticsearch.spark.sql")
             .option("es.nodes", nodes)
             .option("es.mapping.id", id_col)
             .mode("append").save(index))
            return
        except Exception as exc:
            raise NotImplementedError(
                "elasticsearch cluster mode needs the es-hadoop jar: "
                "spark-submit --jars elasticsearch-spark-30_2.13-<ver>.jar "
                "(or use path= for the _bulk file form)") from exc
    raise ValueError("elasticsearch_sink needs path= or nodes=")


def s3_sink(df: DataFrame, bucket: str, prefix: str,
            codec: str = "json_lines", scheme: str = "s3a",
            compression: str | None = None,
            message_col: str | None = None,
            mode: str = "overwrite") -> None:
    """s3 output analog (plugins-metadata.json logstash-output-s3).

    The reference batches events into local temp files and uploads on
    time/size rotation (time_file/size_file) because it's a single-process
    writer; Spark's distributed write IS that batching — every partition
    uploads its own object in parallel and file sizing is partition
    sizing, so the rotation knobs have no analog.  codec line writes
    ``message_col`` (default `message`) as text; json_lines/csv/parquet
    write the full row.  ``compression='gzip'`` matches the reference's
    encoding=gzip.  Jar-gated on the s3a filesystem (same hint as
    s3_source); ``scheme='file'`` runs the identical write locally.
    """
    from logstash_spark.functions.decorators import strip_metadata
    from logstash_spark.sources.batch_inputs import _S3_HINT, s3a_available

    if scheme == "s3a" and not s3a_available(df.sparkSession):
        raise NotImplementedError(_S3_HINT)
    path = f"{scheme}://{bucket}/{prefix}" if scheme != "file" else \
        f"{bucket}/{prefix}"
    clean = strip_metadata(df)
    w = clean.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if codec in ("line", "plain"):
        col = message_col or "message"
        clean.select(F.col(col).cast("string").alias("value")) \
            .write.mode(mode) \
            .option("compression", compression or "none").text(path)
    elif codec == "json_lines":
        w.json(path)
    elif codec == "csv":
        w.option("header", "true").csv(path)
    elif codec == "parquet":
        w.parquet(path)
    else:
        raise ValueError(f"unsupported s3 sink codec {codec!r}")


def http_sink(df: DataFrame, url: str, format: str = "json_batch",
              batch_size: int = 50, content_type: str | None = None,
              retries: int = 2, headers: dict | None = None) -> int:
    """http output analog (logstash-output-http): executor-side POSTs.

    Mirrors the reference's formats — ``json`` (one event per request),
    ``json_batch`` (array of up to ``batch_size`` events per request, the
    reference's bulk shape), ``ndjson`` (newline-delimited batch).  Each
    partition posts its own rows (no driver collect); connection count =
    partition count, so coalesce upstream for a single small receiver.
    Failed requests retry ``retries`` times with doubling backoff (the
    reference's automatic_retries), then raise — the task retry is the
    at-least-once story, same as the reference's retry policy.  Returns
    rows sent.  For streaming, call per micro-batch inside foreachBatch.
    """
    if format not in ("json", "json_batch", "ndjson"):
        raise ValueError(f"unsupported http sink format {format!r}")
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("j"))
    ctype = content_type or "application/json"
    hdrs = dict(headers or {})

    def post_partition(rows):
        import time as _time
        import urllib.request as _rq

        def post(body: bytes) -> None:
            req = _rq.Request(url, data=body, method="POST",
                              headers={"Content-Type": ctype, **hdrs})
            for attempt in range(retries + 1):
                try:
                    with _rq.urlopen(req, timeout=30):
                        return
                except Exception:  # noqa: BLE001 — retry any transport error
                    if attempt == retries:
                        raise
                    _time.sleep(0.2 * (2 ** attempt))

        sent, batch = 0, []

        def flush():
            nonlocal sent, batch
            if not batch:
                return
            if format == "json_batch":
                post(("[" + ",".join(batch) + "]").encode())
            else:
                post("\n".join(batch).encode())
            sent += len(batch)
            batch = []

        for row in rows:
            if format == "json":
                post(row.j.encode())
                sent += 1
            else:
                batch.append(row.j)
                if len(batch) >= batch_size:
                    flush()
        flush()
        yield sent

    return sum(payload.rdd.mapPartitions(post_partition).collect())


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


# -- Iceberg (the north rule's table format; jar-gated in this sandbox) ------

_ICEBERG_HINT = (
    "iceberg needs the runtime package + catalog conf: spark-submit "
    "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> "
    "--conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog "
    "--conf spark.sql.catalog.lake.type=hadoop "
    "--conf spark.sql.catalog.lake.warehouse=<path>")


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001 - Py4J wraps ClassNotFoundException
        return False


def iceberg_stream_source(spark: SparkSession, table: str,
                          stream_from_timestamp: int | None = None) -> DataFrame:
    """Iceberg incremental stream (the production transcripts source: same
    offset/replay contract as the file source used in-sandbox — snapshot
    ids are the offsets in the checkpoint)."""
    if not iceberg_available(spark):
        raise NotImplementedError(_ICEBERG_HINT)
    r = spark.readStream.format("iceberg")
    if stream_from_timestamp is not None:
        r = r.option("stream-from-timestamp", str(stream_from_timestamp))
    return r.load(table)


def iceberg_merge_sink(table: str, merge_keys: list[str]):
    """foreachBatch body: MERGE INTO the Iceberg table on merge_keys —
    the exactly-once upsert ExactlyOnceParquetSink stands in for.  Returns
    a (df, epoch_id) callable for writeStream.foreachBatch."""

    def write(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        if not iceberg_available(spark):
            raise NotImplementedError(_ICEBERG_HINT)
        view = f"__ice_batch_{epoch_id}"
        df.createOrReplaceTempView(view)
        on = " AND ".join(f"t.{k} = s.{k}" for k in merge_keys)
        spark.sql(f"""
            MERGE INTO {table} t USING {view} s ON {on}
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """)

    return write
