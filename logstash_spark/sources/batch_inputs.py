"""Batch inputs: s3, elasticsearch, redis (reference plugins-metadata.json
meta:370 logstash-input-s3, meta:269 logstash-input-elasticsearch, meta:366
logstash-input-redis).

Shapes, Spark-first:

* **s3** — object listing + codec decode IS Spark's file source; the only
  s3-specific part is the ``s3a://`` filesystem, which needs the
  hadoop-aws jar (not bundled with pip pyspark).  ``s3_source`` is the
  codec/option wiring around ``spark.read`` with the jar honestly gated
  (exact ``--packages`` hint); a ``scheme`` override lets the identical
  plumbing run over ``file://`` so tests exercise everything but the jar.
  At scale this is the right plan: parallel split reads, partition pruning
  on prefix layout, no driver involvement.

* **elasticsearch** — two paths, auto-selected: the es-hadoop datasource
  (``org.elasticsearch.spark.sql``, jar-gated) gives parallel per-shard
  scan — the 100 TB path; without the jar, a stdlib HTTP ``_search``
  scroll pager drains matching docs on the driver (the reference input is
  also a single scroll client per pipeline) — right for dim-table pulls
  and re-index jobs, documented wrong for corpus-scale reads.

* **redis** — a queue DRAIN, not a scan: the reference input pops a list
  (or subscribes a channel).  A minimal RESP2 client (stdlib socket)
  drains the list driver-side in one LRANGE+DEL round trip per batch —
  a Redis list is a single hot key, so no engine can parallelize the pop
  itself; parallelism starts after ingestion.  Channels (pub/sub) are a
  stream — use the tcp/udp bridging recipe (tests/test_bridges.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_S3_HINT = ("s3 input needs the hadoop-aws package: spark-submit --packages "
            "org.apache.hadoop:hadoop-aws:<hadoop-version> (plus "
            "fs.s3a.access.key/secret.key or an instance profile)")

_ES_HADOOP_HINT = ("elasticsearch-hadoop datasource absent; using the "
                   "driver-side scroll pager (fine for dim pulls). For "
                   "parallel shard reads: spark-submit --packages "
                   "org.elasticsearch:elasticsearch-spark-30_2.13:<ver>")


def s3a_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem")
        return True
    except Exception:  # noqa: BLE001 — Py4J wraps ClassNotFoundException
        return False


def s3_source(spark: SparkSession, bucket: str, prefix: str = "",
              codec: str = "line", schema=None,
              scheme: str = "s3a") -> DataFrame:
    """logstash-input-s3 analog: read every object under a prefix.

    ``codec``: line/plain (gzip transparent via Hadoop codecs, matching
    the reference's gzip handling), json_lines, csv, parquet.
    ``scheme='file'`` runs the same plumbing over a local directory
    (tests; also useful against on-prem object stores mounted as fs).
    """
    if scheme == "s3a" and not s3a_available(spark):
        raise NotImplementedError(_S3_HINT)
    path = f"{scheme}://{bucket}/{prefix}" if scheme != "file" else \
        f"{bucket}/{prefix}"
    if codec in ("line", "plain"):
        return spark.read.text(path).withColumnRenamed("value", "message")
    if codec in ("json_lines", "json"):
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.json(path)
    if codec == "csv":
        return spark.read.option("header", "true").csv(path)
    if codec == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"unsupported s3 codec {codec!r}")


def es_hadoop_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.elasticsearch.spark.sql.DefaultSource")
        return True
    except Exception:  # noqa: BLE001
        return False


def _http_json(url: str, body: dict | None = None, method: str = "GET"):
    import urllib.request

    req = urllib.request.Request(
        url, method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


#: Default cap on the stdlib scroll fallback — it accumulates hits in a
#: driver-side list, so an uncapped pull of a large index is an OOM.  The
#: es-hadoop path (per-shard parallel scan) has no such cap.
ES_FALLBACK_MAX_DOCS = 100_000


def elasticsearch_source(spark: SparkSession, hosts, index: str,
                         query: dict | None = None, size: int = 1000,
                         scroll: str = "1m", schema=None,
                         max_docs: int | None = ES_FALLBACK_MAX_DOCS
                         ) -> DataFrame:
    """logstash-input-elasticsearch analog (meta:269: query + scroll +
    size options).  ``hosts`` is a host string or list of hosts.

    With es-hadoop on the classpath: the real datasource (per-shard
    parallel scan over every node in ``hosts``).  Otherwise: stdlib
    ``_search?scroll`` paging on the driver — each page is ``size`` docs,
    only the first host is paged, and ``max_docs`` bounds the pull
    (default 100k; a driver-side list is NOT the 100-TB path — install
    es-hadoop for that).  Pass ``max_docs=None`` to explicitly uncap.
    Returns one row per hit: (_id string, _index string, _source string
    json) — pipe ``_source`` through the json filter for typed columns
    (``schema`` applies from_json here when given).
    """
    host_list = hosts if isinstance(hosts, list) else [hosts]
    if es_hadoop_available(spark):
        r = (spark.read.format("org.elasticsearch.spark.sql")
             .option("es.nodes", ",".join(host_list))
             .option("es.resource", index))
        if query:
            r = r.option("es.query", json.dumps(query))
        return r.load()

    if len(host_list) > 1:
        import warnings

        warnings.warn(
            "elasticsearch_source: stdlib scroll fallback pages one host; "
            f"using {host_list[0]!r}, ignoring {host_list[1:]} (es-hadoop "
            "on the classpath uses the full node list)", stacklevel=2)
    hosts = host_list[0]
    base = hosts if hosts.startswith("http") else f"http://{hosts}"
    body = {"size": size, "query": query or {"match_all": {}}}
    page = _http_json(f"{base}/{index}/_search?scroll={scroll}", body, "POST")
    rows, scroll_id = [], page.get("_scroll_id")
    while True:
        hits = page.get("hits", {}).get("hits", [])
        if not hits:
            break
        for h in hits:
            rows.append((h.get("_id"), h.get("_index"),
                         json.dumps(h.get("_source", {}))))
            if max_docs is not None and len(rows) >= max_docs:
                import warnings

                warnings.warn(
                    f"elasticsearch_source: stopped at max_docs={max_docs}; "
                    "results may be truncated — pass max_docs=None to "
                    "uncap (driver memory!) or install es-hadoop for a "
                    "distributed scan", stacklevel=2)
                hits = []
                break
        if not hits or scroll_id is None:
            break
        page = _http_json(f"{base}/_search/scroll",
                          {"scroll": scroll, "scroll_id": scroll_id}, "POST")
    if scroll_id is not None:
        try:
            _http_json(f"{base}/_search/scroll",
                       {"scroll_id": scroll_id}, "DELETE")
        except Exception:  # noqa: BLE001 — cleanup best-effort
            pass
    out = spark.createDataFrame(
        rows, "_id string, _index string, _source string")
    if schema is not None:
        out = out.withColumn("doc", F.from_json("_source", schema))
    return out


# ---------------------------------------------------------------------------
# redis: minimal RESP2 client (list drain)
# ---------------------------------------------------------------------------

def _resp_encode(*args: str) -> bytes:
    out = [f"*{len(args)}\r\n".encode()]
    for a in args:
        b = a.encode()
        out.append(b"$" + str(len(b)).encode() + b"\r\n" + b + b"\r\n")
    return b"".join(out)


def _resp_read(f):
    """Parse one RESP2 reply from a buffered socket file."""
    line = f.readline()
    if not line:
        raise ConnectionError("redis: connection closed")
    t, rest = line[:1], line[1:-2]
    if t == b"+":
        return rest.decode()
    if t == b"-":
        raise RuntimeError(f"redis error: {rest.decode()}")
    if t == b":":
        return int(rest)
    if t == b"$":
        n = int(rest)
        if n == -1:
            return None
        data = f.read(n + 2)
        return data[:-2].decode()
    if t == b"*":
        n = int(rest)
        if n == -1:
            return None
        return [_resp_read(f) for _ in range(n)]
    raise RuntimeError(f"redis: unknown reply type {t!r}")


def redis_source_batch(spark: SparkSession, host: str, port: int,
                       key: str, batch_size: int = 10000,
                       max_items: int | None = None,
                       codec: str = "json_lines", schema=None) -> DataFrame:
    """logstash-input-redis, data_type=list (meta:366): drain a Redis list
    into a DataFrame.

    Atomic drain per round trip: ``LPOP key batch_size`` (Redis >= 6.2
    count form).  A list is one key on one shard — the pop itself cannot
    be parallelized by any engine, so the drain is driver-side (exactly
    the reference's single-client shape) and Spark parallelism begins at
    the returned DataFrame.  ``codec`` json_lines parses each element
    with ``schema``; line keeps raw strings in ``message``.
    """
    import socket

    rows: list[str] = []
    with socket.create_connection((host, port), timeout=30) as sock:
        f = sock.makefile("rb")
        while max_items is None or len(rows) < max_items:
            want = batch_size if max_items is None else \
                min(batch_size, max_items - len(rows))
            sock.sendall(_resp_encode("LPOP", key, str(want)))
            batch = _resp_read(f)
            if not batch:
                break
            rows.extend(batch if isinstance(batch, list) else [batch])
    df = spark.createDataFrame([(r,) for r in rows], "message string")
    if codec in ("json_lines", "json"):
        if schema is None:
            raise ValueError("redis json codec needs a schema")
        df = df.withColumn("doc", F.from_json("message", schema))
    return df
