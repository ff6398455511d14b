"""Round-5 fixes: minhash cache lifecycle, band-hash injectivity,
pipelines.yml multi-sender ordering, bounded ES scroll fallback.

Reference anchors are cited per-test; these harden behaviors the round-4
review flagged (VERDICT.md "What's wrong" / ADVICE.md).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestMinhashLifecycle:
    """VERDICT r4 #1: minhash_lsh_dedup used to persist signatures with no
    unpersist — one leaked CacheManager entry per call, unbounded storage
    growth in a long-lived session (the 10^12-turn mandate).

    Reference semantics anchor: the fingerprint-family dedup recipe in the
    reference docs (SURVEY §dedup); the *lifecycle* contract under test is
    ours: no CacheManager entry survives the call.
    """

    def _cache_manager_empty(self, spark) -> bool:
        return bool(
            spark._jsparkSession.sharedState().cacheManager().isEmpty())

    def test_no_cachemanager_entry_survives(self, spark, sf_dir):
        from logstash_spark.datahub.dedup import minhash_lsh_dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        assert self._cache_manager_empty(spark)
        pairs = minhash_lsh_dedup(docs, n_hashes=16, band_size=4)
        # the signature persist must be released before the call returns
        assert self._cache_manager_empty(spark), \
            "minhash_lsh_dedup leaked a persisted DataFrame"
        # ... and the returned pairs must still be usable (lineage was
        # truncated by the eager checkpoint, not severed)
        n = pairs.count()
        assert n >= 0
        rows = {(r.a, r.b) for r in pairs.collect()}
        assert all(a < b for a, b in rows)

    def test_repeated_calls_do_not_accumulate_cache(self, spark, sf_dir):
        from logstash_spark.datahub.dedup import minhash_lsh_dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        for _ in range(3):
            minhash_lsh_dedup(docs, n_hashes=8, band_size=4).count()
            assert self._cache_manager_empty(spark)

    def test_uncached_path_matches_cached(self, spark, sf_dir):
        from logstash_spark.datahub.dedup import minhash_lsh_dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = {(r.a, r.b) for r in
             minhash_lsh_dedup(docs, cache_signatures=True).collect()}
        b = {(r.a, r.b) for r in
             minhash_lsh_dedup(docs, cache_signatures=False).collect()}
        assert a == b


class TestBandHashInjectivity:
    """ADVICE r4 (medium): band hash was md5(concat) without a separator,
    so signature tuples (1, 23) and (12, 3) hashed identically -> false
    candidate pairs fed unverified into dedup_groups."""

    def test_ambiguous_signatures_do_not_pair(self, spark):
        from logstash_spark.datahub.dedup import lsh_candidate_pairs

        # two docs whose 4-hash band concatenates identically without a
        # separator: '1|23|4|56' vs '12|3|45|6' (sep-free both '123456')
        sigs = spark.createDataFrame(
            [("a", 1, 23, 4, 56), ("b", 12, 3, 45, 6)],
            "doc_id string, h0 long, h1 long, h2 long, h3 long")
        pairs = lsh_candidate_pairs(sigs, n_hashes=4, band_size=4).collect()
        assert pairs == [], "separator-free band hash collision"

    def test_identical_signatures_still_pair(self, spark):
        from logstash_spark.datahub.dedup import lsh_candidate_pairs

        sigs = spark.createDataFrame(
            [("a", 1, 23, 4, 56), ("b", 1, 23, 4, 56)],
            "doc_id string, h0 long, h1 long, h2 long, h3 long")
        got = {(r.a, r.b) for r in
               lsh_candidate_pairs(sigs, n_hashes=4, band_size=4).collect()}
        assert got == {("a", "b")}

    def test_oracle_mirrors_separator(self):
        """The DuckDB oracle must use the same '|'-separated concat, or
        the gate could green-light the collision."""
        from logstash_spark.datahub.catalog import _minhash_pairs_ctes

        sql = _minhash_pairs_ctes(16, 4)
        assert "CONCAT(h0, '|', h1, '|', h2, '|', h3)" in sql


class TestPipelinesYmlFanIn:
    """ADVICE r4: topo_order marked a listener ready when ANY producer of
    a needed address was placed; with two pipelines fanning into one bus
    address the downstream job could run before the second sender
    registered, silently dropping its rows.  Reference: the pipeline bus
    registers ALL senders before a listener drains
    (logstash-core PipelineBus.java address registration)."""

    YML = """
- pipeline.id: down
  config.string: "input { pipeline { address => \\"fan\\" } } output { null {} }"
- pipeline.id: s1
  config.string: "input { generator { count => 3 } } output { pipeline { send_to => [\\"fan\\"] } }"
- pipeline.id: s2
  config.string: "input { generator { count => 2 } } output { pipeline { send_to => [\\"fan\\"] } }"
"""

    def test_listener_waits_for_all_senders(self):
        from logstash_spark.plans.pipelines_yml import load_pipelines_yml

        order = load_pipelines_yml(self.YML).topo_order()
        assert order.index("down") > order.index("s1")
        assert order.index("down") > order.index("s2")

    def test_fan_in_rows_all_arrive(self, spark):
        from logstash_spark.plans.pipelines_yml import load_pipelines_yml

        out = load_pipelines_yml(self.YML).run(spark)
        assert out["down"].count() == 5


class TestS3StreamingEpochIdempotence:
    """ADVICE r4: streaming s3 appended per micro-batch with no epoch
    guard — a retried foreachBatch epoch wrote duplicate objects.  Now
    each epoch overwrites its own epoch_id=N directory (the
    sinks/exactly_once.py batch_id layout), so a retry is a rewrite."""

    def test_retried_epoch_writes_once(self, spark, tmp_path):
        from logstash_spark.plans.lscl import compile_lscl_job

        cfg = f"""
        input {{ stdin {{}} }}
        output {{ s3 {{ bucket => "{tmp_path}" prefix => "out/"
                        codec => "json_lines" scheme => "file" }} }}
        """
        job = compile_lscl_job(cfg)
        df = spark.range(10).select(
            F.concat(F.lit("m"), F.col("id")).alias("message"))
        node = job.outputs[0]
        # deliver epoch 3, then "retry" it (driver restart mid-commit)
        job._one_output_batch(df, node, epoch_id=3)
        job._one_output_batch(df, node, epoch_id=3)
        out = spark.read.json(str(tmp_path / "out"))
        assert out.count() == 10  # not 20

    def test_distinct_epochs_both_retained(self, spark, tmp_path):
        from logstash_spark.plans.lscl import compile_lscl_job

        cfg = f"""
        input {{ stdin {{}} }}
        output {{ s3 {{ bucket => "{tmp_path}" prefix => "out/"
                        codec => "json_lines" scheme => "file" }} }}
        """
        job = compile_lscl_job(cfg)
        df1 = spark.range(4).select(
            F.concat(F.lit("a"), F.col("id")).alias("message"))
        df2 = spark.range(6).select(
            F.concat(F.lit("b"), F.col("id")).alias("message"))
        node = job.outputs[0]
        job._one_output_batch(df1, node, epoch_id=0)
        job._one_output_batch(df2, node, epoch_id=1)
        assert spark.read.json(str(tmp_path / "out")).count() == 10


class TestMonitoringHTTP:
    """VERDICT r4 missing #1: the reference serves GET /_node/stats over
    HTTP (logstash-core/lib/logstash/webserver.rb, api/modules/
    node_stats.rb) — ops stacks scrape a RUNNING node.  MonitoringServer
    is a stdlib http.server thread over listener.node_stats."""

    @staticmethod
    def _get(port: int, path: str):
        import json as _json
        import urllib.request

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=10) as r:
            return r.status, _json.loads(r.read())

    def test_live_scrape_during_run(self, spark, tmp_path):
        import time as _time

        from logstash_spark.sources.transcripts import generate_transcripts
        from logstash_spark.streaming import jobs as J
        from logstash_spark.streaming.listener import FlowMetricsListener
        from logstash_spark.streaming.webserver import MonitoringServer

        import pyarrow.parquet as pq

        src = tmp_path / "src"
        src.mkdir()
        tbl = generate_transcripts(2000, seed=11)
        n = tbl.num_rows
        step = n // 4
        for i in range(4):
            pq.write_table(
                tbl.slice(i * step, step if i < 3 else n - 3 * step),
                str(src / f"part-{i:02d}.parquet"))

        metrics_path = str(tmp_path / "metrics.jsonl")
        listener = FlowMetricsListener(metrics_path)
        spark.streams.addListener(listener)
        try:
            with MonitoringServer(metrics_path, port=0) as srv:
                q = J.run_north_star(spark, str(src),
                                     str(tmp_path / "out"),
                                     str(tmp_path / "ckpt"),
                                     max_files_per_trigger=1)
                # scrape while the query is live: poll until a batch lands
                live = None
                for _ in range(200):
                    status, body = self._get(srv.port, "/_node/stats")
                    assert status == 200
                    if q.isActive and body["events"]["in"] > 0:
                        live = body
                        break
                    if not q.isActive:
                        break
                    _time.sleep(0.05)
                q.awaitTermination()
                assert live is not None, \
                    "never scraped a live batch (query too fast?)"
                # listener events flush asynchronously: poll until the
                # scraped totals stop moving, then assert the full shape.
                # run_north_star runs TWO queries (turns + sessions) over
                # the same n-row source, so the node-wide sum is 2n.
                prev = -1
                for _ in range(100):
                    status, body = self._get(srv.port, "/_node/stats")
                    if body["events"]["in"] == prev == 2 * n:
                        break
                    prev = body["events"]["in"]
                    _time.sleep(0.1)
                assert status == 200
                assert body["events"]["in"] == 2 * n
                assert body["events"]["in"] == body["events"]["out"]
                pipes = body["pipelines"]
                assert pipes
                for p in pipes.values():
                    assert p["flow"]["input_throughput"]["lifetime"] > 0
                # session-window query carries state rows + watermark
                assert any(p["state"].get("rows_total")
                           and p["watermark"] is not None
                           for p in pipes.values())
                # root + node endpoints
                status, root = self._get(srv.port, "/")
                assert status == 200 and root["status"] in ("green", "yellow")
                status, node = self._get(srv.port, "/_node")
                assert status == 200 and node["pipelines"]
                # per-pipeline path + 404s
                pid = next(iter(pipes))
                status, one = self._get(srv.port,
                                        f"/_node/stats/pipelines/{pid}")
                assert status == 200 and pid in one["pipelines"]
                import urllib.error
                with pytest.raises(urllib.error.HTTPError):
                    self._get(srv.port, "/_node/stats/pipelines/nope")
                with pytest.raises(urllib.error.HTTPError):
                    self._get(srv.port, "/bogus")
        finally:
            spark.streams.removeListener(listener)

    def test_serves_before_any_metrics(self, tmp_path):
        from logstash_spark.streaming.webserver import MonitoringServer

        with MonitoringServer(str(tmp_path / "nope.jsonl"), port=0) as srv:
            status, body = self._get(srv.port, "/_node/stats")
            assert status == 200 and body["pipelines"] == {}
            status, root = self._get(srv.port, "/")
            assert root["status"] == "yellow"


class TestEsSourceBounds:
    """ADVICE r4: the stdlib scroll fallback pulled an entire index into a
    driver-side list (max_docs default None) and silently used hosts[0]
    of a host list."""

    def test_default_max_docs_is_bounded(self):
        import inspect

        from logstash_spark.sources.batch_inputs import (
            ES_FALLBACK_MAX_DOCS, elasticsearch_source)

        sig = inspect.signature(elasticsearch_source)
        assert sig.parameters["max_docs"].default == ES_FALLBACK_MAX_DOCS
        assert ES_FALLBACK_MAX_DOCS is not None

    def test_multi_host_warns(self, spark):
        import warnings

        from logstash_spark.sources.batch_inputs import elasticsearch_source

        # point at a dead port so the fallback fails fast after the warn
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            with pytest.raises(Exception):
                elasticsearch_source(
                    spark, ["http://127.0.0.1:1", "http://127.0.0.1:2"],
                    "idx")
            assert any("ignoring" in str(x.message) for x in w)
