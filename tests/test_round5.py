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
        # session-scoped fixtures may have their own caches; establish a
        # clean baseline so the assertion is about THIS call's residue
        spark.catalog.clearCache()
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
        spark.catalog.clearCache()  # baseline: fixture caches are not ours
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


class TestMinhashHashFamilies:
    """r5: the xxhash64 xor-rotate family is the 100-TB signature path
    (3.6x cheaper than the oracle-reproducible sha256 family on the
    sf0.1 signature stage).  Different hash family => possibly different
    individual signatures, but the candidate-pair SETS must agree on the
    test corpora (both are uniform min-hash families at the same n/r
    banding curve)."""

    @pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
    def test_pair_sets_agree_across_families(self, spark, sf):
        from logstash_spark.datahub.dedup import minhash_lsh_dedup

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        sha = {(r.a, r.b) for r in minhash_lsh_dedup(
            docs, n_hashes=16, band_size=4).collect()}
        xx = {(r.a, r.b) for r in minhash_lsh_dedup(
            docs, n_hashes=16, band_size=4,
            hash_family="xxhash64").collect()}
        # banding recall is probabilistic PER FAMILY: borderline pairs on
        # the s-curve may land on different sides under different hash
        # functions.  Require near-identical candidate sets (the strongly
        # similar pairs must agree), not bit-identical ones.
        union = sha | xx
        assert union, "no candidate pairs at all"
        assert len(sha & xx) / len(union) >= 0.9, (sha - xx, xx - sha)

    def test_fast_family_lifecycle_clean(self, spark, sf_dir):
        from logstash_spark.datahub.dedup import minhash_lsh_dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        spark.catalog.clearCache()
        minhash_lsh_dedup(docs, hash_family="xxhash64").count()
        assert bool(
            spark._jsparkSession.sharedState().cacheManager().isEmpty())

    def test_unknown_family_rejected(self, spark, sf_dir):
        from logstash_spark.datahub.dedup import minhash_signatures, \
            word_shingles

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sh = word_shingles(docs, "text", "doc_id")
        with pytest.raises(ValueError, match="hash_family"):
            minhash_signatures(sh, hash_family="md5")


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

    def test_hot_threads(self, spark, tmp_path):
        """node.rb GET /hot_threads: python threads always, jvm threads
        when a session is attached."""
        from logstash_spark.streaming.webserver import MonitoringServer

        with MonitoringServer(str(tmp_path / "m.jsonl"), port=0,
                              spark=spark) as srv:
            status, body = self._get(srv.port, "/_node/hot_threads")
            assert status == 200
            sides = {t["side"] for t in body["hot_threads"]}
            assert sides == {"python", "jvm"}
            names = {t["name"] for t in body["hot_threads"]}
            assert "monitoring-api" in names  # sees itself
            assert any(t["side"] == "jvm" and t.get("stack")
                       for t in body["hot_threads"])


class TestHttpWebhookInput:
    """VERDICT r4 missing #2 / 'Next round' #5: a native streaming http
    input via Spark 4's Python Data Source API, replacing the tcp-bridge
    recipe.  Reference contract: co/elastic/logstash/api/Input.java:46-62
    (push input: start listener, push events until stop); plugin surface
    rakelib/plugins-metadata.json:310 (logstash-input-http)."""

    @staticmethod
    def _post(port: int, body: str, ctype: str = "text/plain"):
        import urllib.request

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/", data=body.encode(),
            headers={"Content-Type": ctype}, method="POST")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.status == 200

    def test_live_post_checkpoint_resume(self, spark, tmp_path):
        from logstash_spark.sources.http_input import (HttpEventSpool,
                                                       http_webhook_stream)

        spool_dir = str(tmp_path / "spool")
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        with HttpEventSpool(spool_dir) as spool:
            for i in range(3):
                self._post(spool.port, f"ev{i}")
            df = http_webhook_stream(spark, spool_dir)
            assert df.isStreaming
            q = (df.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            assert spark.read.parquet(out).count() == 3
            # events that arrive while the query is down are picked up on
            # resume from the SAME checkpoint, exactly once
            for i in range(3, 5):
                self._post(spool.port, f"ev{i}")
            q = (df.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            got = sorted(r.message
                         for r in spark.read.parquet(out).collect())
            assert got == [f"ev{i}" for i in range(5)]

    def test_ndjson_body_splits_events(self, spark, tmp_path):
        from logstash_spark.sources.http_input import (HttpEventSpool,
                                                       http_webhook_stream)

        spool_dir = str(tmp_path / "spool")
        with HttpEventSpool(spool_dir) as spool:
            self._post(spool.port, '{"a":1}\n{"a":2}\n{"a":3}',
                       ctype="application/x-ndjson")
            df = http_webhook_stream(spark, spool_dir)
            out, ck = str(tmp_path / "o"), str(tmp_path / "c")
            q = (df.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            assert spark.read.parquet(out).count() == 3

    def test_lscl_http_input_compiles_to_real_source(self, spark, tmp_path):
        from logstash_spark.plans.lscl import compile_lscl_job

        spool_dir = str(tmp_path / "spool")
        sink = str(tmp_path / "sink")
        cfg = f"""
        input {{ http {{ spool_dir => "{spool_dir}" }} }}
        filter {{ mutate {{ uppercase => ["message"] }} }}
        output {{ file {{ path => "{sink}" codec => "json_lines" }} }}
        """
        job = compile_lscl_job(cfg)
        # source_stream starts the listener lazily; build the stream first
        q = job.run_stream(spark, checkpoint_dir=str(tmp_path / "ck"),
                           available_now=False,
                           trigger_interval="200 milliseconds")
        try:
            assert job.http_spools, "listener not started"
            port = job.http_spools[0].port
            for i in range(4):
                self._post(port, f"hello{i}")
            import time as _time
            rows = []
            for _ in range(150):
                try:
                    rows = spark.read.json(sink).collect()
                except Exception:  # noqa: BLE001 — sink dir not yet created
                    rows = []
                if len(rows) >= 4:
                    break
                _time.sleep(0.2)
            assert sorted(r.message for r in rows) == \
                ["HELLO0", "HELLO1", "HELLO2", "HELLO3"]
        finally:
            q.stop()
            for s in job.http_spools:
                s.stop()

    def test_prune_committed_bounds_spool(self, spark, tmp_path):
        """r5 retention: with prune_committed the consumed prefix is
        reclaimed on Spark's commit() callback (the reference PQ reclaims
        acked pages), and resume from the checkpoint stays exact."""
        import os

        from logstash_spark.sources.http_input import (HttpEventSpool,
                                                       _read_base,
                                                       http_webhook_stream)

        spool_dir = str(tmp_path / "spool")
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        with HttpEventSpool(spool_dir) as spool:
            # one ndjson POST carrying 1500 events (> PRUNE_MIN_LINES)
            body = "\n".join(f'{{"i":{i}}}' for i in range(1500))
            self._post(spool.port, body, ctype="application/x-ndjson")
            df = http_webhook_stream(spark, spool_dir,
                                     prune_committed=True)
            q = (df.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            assert spark.read.parquet(out).count() == 1500
            # new events after the first drain still flow, exactly once;
            # the engine calls commit() for batch 0 during this second
            # cycle, which is when the prune lands
            self._post(spool.port, "tail-1")
            self._post(spool.port, "tail-2")
            q = (df.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            assert spark.read.parquet(out).count() == 1502
            # commit() fired at least once by now: base advanced past the
            # first batch, file holds only the un-pruned tail
            base = _read_base(spool_dir)
            assert base >= 1500
            n_left = sum(1 for _ in open(f"{spool_dir}/events.jsonl"))
            assert n_left <= 3  # header + the un-pruned tail
            # third cycle proves reads stay exact above the pruned base
            self._post(spool.port, "tail-3")
            q = (df.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            got = sorted(r.message for r in
                         spark.read.parquet(out).collect()
                         if r.message.startswith("tail"))
            assert got == ["tail-1", "tail-2", "tail-3"]

    def test_udp_input_native(self, spark, tmp_path):
        """logstash-input-udp (meta:404) rides the same spool datasource:
        datagrams become replayable streaming rows."""
        import socket

        from logstash_spark.plans.lscl import compile_lscl_job

        spool_dir = str(tmp_path / "spool")
        sink = str(tmp_path / "sink")
        cfg = f"""
        input {{ udp {{ spool_dir => "{spool_dir}" }} }}
        output {{ file {{ path => "{sink}" codec => "json_lines" }} }}
        """
        job = compile_lscl_job(cfg)
        q = job.run_stream(spark, checkpoint_dir=str(tmp_path / "ck"),
                           available_now=False,
                           trigger_interval="200 milliseconds")
        try:
            port = job.http_spools[0].port
            cli = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            import time as _time
            rows = []
            deadline = _time.time() + 30
            sent = 0
            while _time.time() < deadline and len(rows) < 3:
                # UDP is lossy even on loopback under load — retry sends
                # until the spool has them (delivery-once is downstream
                # of the spool, not of the wire)
                for i in range(3):
                    cli.sendto(f"dgram{i}".encode(), ("127.0.0.1", port))
                sent += 3
                _time.sleep(0.5)
                try:
                    rows = {r.message
                            for r in spark.read.json(sink).collect()}
                except Exception:  # noqa: BLE001
                    rows = []
            assert {"dgram0", "dgram1", "dgram2"} <= set(rows)
        finally:
            q.stop()
            for s in job.http_spools:
                s.stop()

    def test_http_poller_native(self, spark, tmp_path):
        """logstash-input-http_poller (meta:314): scheduled GETs -> spool
        -> streaming rows; poll failures surface as tagged events."""
        import json as _json
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from logstash_spark.plans.lscl import compile_lscl_job

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                body = _json.dumps({"status": "up"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}/health"
        dead = "http://127.0.0.1:1/nope"
        spool_dir = str(tmp_path / "spool")
        sink = str(tmp_path / "sink")
        cfg = f"""
        input {{ http_poller {{
            urls => {{ "up" => "{url}" "down" => "{dead}" }}
            schedule => {{ "every" => "1s" }}
            spool_dir => "{spool_dir}" }} }}
        output {{ file {{ path => "{sink}" codec => "json_lines" }} }}
        """
        job = compile_lscl_job(cfg)
        q = job.run_stream(spark, checkpoint_dir=str(tmp_path / "ck"),
                           available_now=False,
                           trigger_interval="200 milliseconds")
        try:
            import time as _time
            rows = []
            for _ in range(150):
                try:
                    rows = spark.read.json(sink).collect()
                except Exception:  # noqa: BLE001
                    rows = []
                if len({(r.remote_addr, r.content_type) for r in rows}) >= 2:
                    break
                _time.sleep(0.2)
            by_url = {r.remote_addr: r for r in rows}
            assert url in by_url and dead in by_url
            assert _json.loads(by_url[url].message) == {"status": "up"}
            assert by_url[dead].content_type == "http_poller/error"
        finally:
            q.stop()
            for s in job.http_spools:
                s.stop()
            srv.shutdown()

    def test_ordered_delivery_preserves_arrival_order(self, spark,
                                                      tmp_path):
        """pipeline.ordered analog: with ordered=True each micro-batch is
        delivered as ONE partition sorted by the spool arrival sequence,
        so the sink observes strict input order (the reference's
        pipeline.ordered=true single-worker contract)."""
        import glob
        import json as _json

        from logstash_spark.plans.lscl import compile_lscl_job

        spool_dir = str(tmp_path / "spool")
        sink = str(tmp_path / "sink")
        cfg = f"""
        input {{ http {{ spool_dir => "{spool_dir}" }} }}
        output {{ file {{ path => "{sink}" codec => "json_lines" }} }}
        """
        job = compile_lscl_job(cfg)
        # arrival order = ndjson line order within one POST
        from logstash_spark.sources.http_input import HttpEventSpool

        spool = job_spool = None
        # start the stream ordered; the listener is created inside
        q = job.run_stream(spark, checkpoint_dir=str(tmp_path / "ck"),
                           available_now=False,
                           trigger_interval="5 seconds", ordered=True)
        try:
            port = job.http_spools[0].port
            body = "\n".join(_json.dumps({"n": i}) for i in range(200))
            self._post(port, body, ctype="application/x-ndjson")
            import time as _time
            for _ in range(150):
                files = [f for f in glob.glob(f"{sink}/part-*")
                         if not f.endswith(".crc")]
                total = 0
                for f in files:
                    total += sum(1 for _ in open(f))
                if total >= 200:
                    break
                _time.sleep(0.2)
            assert total == 200
            # strict arrival order across the batch's single part file(s),
            # files ordered by name (one per delivering micro-batch)
            seq = []
            for f in sorted(files):
                for line in open(f):
                    seq.append(_json.loads(
                        _json.loads(line)["message"])["n"])
            assert seq == list(range(200))
        finally:
            q.stop()
            for s in job.http_spools:
                s.stop()

    def test_ordered_rejects_unordered_inputs(self, spark, tmp_path):
        from logstash_spark.plans.lscl import compile_lscl_job

        src = tmp_path / "src"
        src.mkdir()
        (src / "a.txt").write_text("x\n")
        cfg = f"""
        input {{ file {{ path => "{src}" codec => "line" }} }}
        output {{ null {{}} }}
        """
        with pytest.raises(SyntaxError, match="arrival order"):
            compile_lscl_job(cfg).run_stream(
                spark, checkpoint_dir=str(tmp_path / "ck"), ordered=True)

    def test_batch_run_rejects_http_input(self, spark, tmp_path):
        from logstash_spark.plans.lscl import compile_lscl_job

        cfg = f"""
        input {{ http {{ spool_dir => "{tmp_path}" }} }}
        output {{ null {{}} }}
        """
        with pytest.raises(SyntaxError, match="stream"):
            compile_lscl_job(cfg).run(spark)


class TestKeystore:
    """VERDICT r4 missing #3: read the reference's secret-store format
    (org/logstash/secret/store/backend/JavaKeyStore.java — PKCS12 + PBE
    entries under urn:logstash:secret:v1:<key>, default password appended
    obfuscated to the file) into the ${VAR} expansion snapshot."""

    def test_roundtrip_default_pass(self, spark, tmp_path):
        from logstash_spark.plans.keystore import (create_keystore,
                                                   load_keystore)

        p = str(tmp_path / "logstash.keystore")
        create_keystore(p, {"es_pwd": "s3cr3t", "api_key": "ab c/+=!"},
                        spark=spark)
        got = load_keystore(p, spark=spark)
        assert got == {"es_pwd": "s3cr3t", "api_key": "ab c/+=!"}

    def test_roundtrip_explicit_pass(self, spark, tmp_path, monkeypatch):
        from logstash_spark.plans.keystore import (ENV_PASS_KEY,
                                                   create_keystore,
                                                   load_keystore)

        p = str(tmp_path / "ks2")
        create_keystore(p, {"token": "tok123"}, password="hunter2",
                        spark=spark)
        # no trailer on an explicit-pass keystore: env var carries the pass
        monkeypatch.setenv(ENV_PASS_KEY, "hunter2")
        assert load_keystore(p, spark=spark) == {"token": "tok123"}
        # wrong password must fail, not return garbage
        monkeypatch.setenv(ENV_PASS_KEY, "wrong")
        with pytest.raises(Exception):
            load_keystore(p, spark=spark)

    def test_lscl_expands_from_keystore(self, spark, tmp_path, monkeypatch):
        from logstash_spark.plans.keystore import create_keystore
        from logstash_spark.plans.lscl import compile_lscl_job

        p = str(tmp_path / "ks3")
        create_keystore(p, {"out_tag": "from_keystore"}, spark=spark)
        # precedence: keystore beats an identically-named env var
        monkeypatch.setenv("out_tag", "from_env")
        cfg = """
        input { stdin {} }
        filter { mutate { add_field => { "tag" => "${out_tag}" } } }
        output { null {} }
        """
        job = compile_lscl_job(cfg, context={"keystore": p})
        df = spark.range(1).selectExpr("'x' AS message")
        out = job.run(spark, stdin_df=df)
        assert out.select("tag").first().tag == "from_keystore"

    def test_unset_secret_still_errors(self, spark, tmp_path):
        from logstash_spark.plans.keystore import create_keystore
        from logstash_spark.plans.lscl import compile_lscl_job

        p = str(tmp_path / "ks4")
        create_keystore(p, {"other": "x"}, spark=spark)
        cfg = """
        input { stdin {} }
        filter { mutate { add_field => { "t" => "${NOPE_NOT_SET}" } } }
        output { null {} }
        """
        with pytest.raises(SyntaxError, match="NOPE_NOT_SET"):
            compile_lscl_job(cfg, context={"keystore": p})


class TestBinaryEncodeCodecs:
    """VERDICT r4 'Next round' #8: the codec contract is bidirectional
    (logstash-core/lib/logstash/codecs/base.rb:38-86) — encode paths for
    msgpack and fluent, round-tripping through the existing decoders."""

    def test_mp_value_roundtrip(self):
        from logstash_spark.operators.codecs_binary import (_mp_decode,
                                                            _mp_encode)

        cases = [
            None, True, False, 0, 1, 127, 128, 255, 256, 65535, 65536,
            2**32, 2**63 - 1, -1, -32, -33, -128, -129, -32768, -32769,
            -2**31, -2**63, 1.5, -0.25, "", "x", "a" * 31, "a" * 32,
            "a" * 300, "a" * 70000, b"", b"\x00\xff", b"b" * 300,
            [], [1, "two", None], list(range(20)),
            {}, {"k": "v"}, {"n": {"deep": [1, {"x": True}]}},
            {f"k{i}": i for i in range(20)},
        ]
        for v in cases:
            got, end = _mp_decode(_mp_encode(v))
            enc = _mp_encode(v)
            assert end == len(enc), v
            if isinstance(v, list):
                assert got == v or list(got) == v
            else:
                assert got == v, v

    def test_mp_canonical_bytes_stable(self):
        """encode(decode(b)) == b for canonical smallest-width buffers."""
        from logstash_spark.operators.codecs_binary import (_mp_decode,
                                                            _mp_encode)

        bufs = [
            b"\xc0", b"\xc3", b"\x7f", b"\xe0",            # nil/true/fix
            b"\xcc\x80", b"\xcd\x01\x00",                   # uint8/16
            b"\xa3abc", b"\x92\x01\x02", b"\x81\xa1k\xa1v",  # str/arr/map
        ]
        for b in bufs:
            v, _ = _mp_decode(b)
            assert _mp_encode(v) == b, b

    def test_msgpack_df_roundtrip(self, spark):
        from logstash_spark.operators.codecs_binary import (msgpack_decode,
                                                            msgpack_encode)

        df = spark.createDataFrame(
            [(1, "alpha", 3.5), (2, "beta", -0.5), (3, None, 0.0)],
            "id int, name string, score double")
        enc = msgpack_encode(df, columns=["id", "name", "score"],
                             target="pkt")
        dec = msgpack_decode(enc.select("pkt"), "pkt",
                             "id int, name string, score double")
        got = sorted(((r.id, r.name, r.score)
                      for r in dec.select("id", "name", "score").collect()))
        assert got == [(1, "alpha", 3.5), (2, "beta", -0.5), (3, None, 0.0)]
        assert dec.filter(
            F.array_contains("tags", "_msgpackparsefailure")).count() == 0

    def test_fluent_df_roundtrip(self, spark):
        from logstash_spark.operators.codecs_binary import (fluent_decode,
                                                            fluent_encode)

        df = spark.createDataFrame(
            [(1700000000, "a", 1), (1700000060, "b", 2)],
            "ts long, msg string, n int")
        enc = fluent_encode(df, tag="app.log", time_col="ts",
                            record_cols=["msg", "n"], target="pkt")
        dec = fluent_decode(enc.select("pkt"), "pkt")
        rows = sorted(((r.fluent_tag, r.fluent_time, r.record)
                       for r in dec.collect()))
        assert [r[0] for r in rows] == ["app.log", "app.log"]
        assert [r[1] for r in rows] == [1700000000, 1700000060]
        import json as _json
        assert _json.loads(rows[0][2]) == {"msg": "a", "n": 1}

    def test_fluent_eventtime_ext_roundtrip(self, spark):
        from logstash_spark.operators.codecs_binary import (fluent_decode,
                                                            fluent_encode)

        df = spark.createDataFrame([(1700000123, "x")], "ts long, msg string")
        enc = fluent_encode(df, tag="t", time_col="ts",
                            record_cols=["msg"], target="pkt",
                            time_as_integer=False)
        r = fluent_decode(enc.select("pkt"), "pkt").first()
        assert (r.fluent_time, r.fluent_failed) == (1700000123, False)

    def test_fluent_tag_from_column(self, spark):
        from logstash_spark.operators.codecs_binary import (fluent_decode,
                                                            fluent_encode)

        df = spark.createDataFrame(
            [(10, "svc.a", "m1"), (20, "svc.b", "m2")],
            "ts long, source string, msg string")
        enc = fluent_encode(df, tag="@source", time_col="ts",
                            record_cols=["msg"], target="pkt")
        got = {r.fluent_tag for r in
               fluent_decode(enc.select("pkt"), "pkt").collect()}
        assert got == {"svc.a", "svc.b"}


class TestBeatsInput:
    """r5: native lumberjack v2 listener (logstash-input-beats,
    meta:248), replacing the filebeat-ndjson bridging recipe.  Frames per
    the public protocol (elastic/go-lumber PROTOCOL.md): 2W window, 2C
    zlib batch, 2J json event, 2A ack."""

    def test_compressed_batch_spools_and_acks(self, tmp_path):
        from logstash_spark.sources.beats_input import (BeatsSpool,
                                                        lumberjack_send)
        import json as _json

        spool_dir = str(tmp_path / "spool")
        with BeatsSpool(spool_dir) as spool:
            events = [{"message": f"line{i}", "host": "fb01"}
                      for i in range(5)]
            acked = lumberjack_send("127.0.0.1", spool.port, events)
            assert acked == 5
            lines = open(f"{spool_dir}/events.jsonl").read().splitlines()
            assert _json.loads(lines[0]) == {"__base__": 0}  # spool header
            lines = lines[1:]
            assert len(lines) == 5
            first = _json.loads(lines[0])
            assert _json.loads(first["message"]) == events[0]
            assert first["content_type"] == "application/x-lumberjack"

    def test_uncompressed_and_multiple_batches(self, tmp_path):
        from logstash_spark.sources.beats_input import (BeatsSpool,
                                                        lumberjack_send)

        spool_dir = str(tmp_path / "spool")
        with BeatsSpool(spool_dir) as spool:
            assert lumberjack_send("127.0.0.1", spool.port,
                                   [{"a": 1}], compress=False) == 1
            assert lumberjack_send("127.0.0.1", spool.port,
                                   [{"b": i} for i in range(3)]) == 3
            lines = open(f"{spool_dir}/events.jsonl").read().splitlines()
            assert len(lines) == 5  # header + 4 events

    def test_lscl_beats_to_pipeline(self, spark, tmp_path):
        """Full path: filebeat-shaped client -> lumberjack server ->
        spool datasource -> json filter -> sink."""
        from logstash_spark.plans.lscl import compile_lscl_job
        from logstash_spark.sources.beats_input import lumberjack_send

        spool_dir = str(tmp_path / "spool")
        sink = str(tmp_path / "sink")
        cfg = f"""
        input {{ beats {{ spool_dir => "{spool_dir}" }} }}
        output {{ file {{ path => "{sink}" codec => "json_lines" }} }}
        """
        job = compile_lscl_job(cfg)
        q = job.run_stream(spark, checkpoint_dir=str(tmp_path / "ck"),
                           available_now=False,
                           trigger_interval="200 milliseconds")
        try:
            port = job.http_spools[0].port
            lumberjack_send("127.0.0.1", port,
                            [{"message": f"beat{i}"} for i in range(4)])
            import time as _time
            rows = []
            for _ in range(150):
                try:
                    rows = spark.read.json(sink).collect()
                except Exception:  # noqa: BLE001
                    rows = []
                if len(rows) >= 4:
                    break
                _time.sleep(0.2)
            import json as _json
            msgs = sorted(_json.loads(r.message)["message"] for r in rows)
            assert msgs == ["beat0", "beat1", "beat2", "beat3"]
        finally:
            q.stop()
            for s in job.http_spools:
                s.stop()

    def test_bad_peer_does_not_kill_listener(self, tmp_path):
        import socket

        from logstash_spark.sources.beats_input import (BeatsSpool,
                                                        lumberjack_send)

        spool_dir = str(tmp_path / "spool")
        with BeatsSpool(spool_dir) as spool:
            with socket.create_connection(("127.0.0.1", spool.port),
                                          timeout=5) as s:
                s.sendall(b"GET / HTTP/1.1\r\n\r\n")  # not lumberjack
            # listener must still serve a real client afterwards
            assert lumberjack_send("127.0.0.1", spool.port,
                                   [{"ok": True}]) == 1


class TestReviewFindings:
    """Regression pins for the round-5 self-review findings."""

    def test_stream_inputs_fall_through_to_one_source(self, spark):
        """Finding 1 (critical): the spool-input elif chain had dropped
        the else that routes tcp/syslog/kafka/stdin/pipeline through
        _one_source — those inputs silently vanished in streaming mode."""
        import socket
        import threading

        from logstash_spark.plans.lscl import compile_lscl_job

        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]

        def accept_one():
            try:
                c, _ = srv.accept()
                c.close()
            except OSError:
                pass

        t = threading.Thread(target=accept_one, daemon=True)
        t.start()
        cfg = f"""
        input {{ tcp {{ host => "127.0.0.1" port => {port} }} }}
        output {{ null {{}} }}
        """
        try:
            df = compile_lscl_job(cfg).source_stream(spark)
            assert df.isStreaming
        finally:
            srv.close()

    def test_xxhash_family_hashes_are_distinct(self, spark):
        """Finding 2 (critical): rotation step 7 shares gcd 7 with 63 →
        period 9 → h10..h15 duplicated h1..h6, collapsing the banding
        curve.  All 16 hash functions must be pairwise distinct."""
        from logstash_spark.datahub.dedup import (minhash_signatures,
                                                  word_shingles)

        docs = spark.createDataFrame(
            [("d1", "the quick brown fox jumps over the lazy dog again "
                    "and again with many more words to shingle")],
            "doc_id string, text string")
        sh = word_shingles(docs, "text", "doc_id", distinct=False)
        row = minhash_signatures(sh, n_hashes=16,
                                 hash_family="xxhash64").first()
        vals = [row[f"h{i}"] for i in range(16)]
        assert len(set(vals)) == 16, vals

    def test_bus_recompile_replaces_not_unions(self, spark):
        """Finding 3: sender keyed by id(self) meant re-compiling the
        same config unioned a stale registration; the deterministic
        config digest replaces it."""
        from logstash_spark.plans.lscl import PipelineBus, compile_lscl_job

        bus = PipelineBus()
        ctx = {"bus": bus}
        cfg = """
        input { stdin {} }
        output { pipeline { send_to => ["rr_addr"] } }
        """
        df1 = spark.range(3).selectExpr("'a' AS message")
        compile_lscl_job(cfg, context=ctx).run(spark, stdin_df=df1)
        # re-compile the SAME config (new object) and re-run
        df2 = spark.range(5).selectExpr("'b' AS message")
        compile_lscl_job(cfg, context=ctx).run(spark, stdin_df=df2)
        assert bus.listen("rr_addr").count() == 5  # not 8

    def test_msgpack_encode_default_target_overwrites_message(self, spark):
        """Finding 4: target='message' on a df that already has message
        declared the column twice and failed at execution."""
        from logstash_spark.operators.codecs_binary import (_mp_decode,
                                                            msgpack_encode)

        df = spark.createDataFrame([("hello", 1)], "message string, n int")
        out = msgpack_encode(df, columns=["message", "n"]).collect()
        assert len(out) == 1
        v, _ = _mp_decode(bytes(out[0].message))
        assert v == {"message": "hello", "n": 1}

    def test_fluent_encode_default_target_overwrites_message(self, spark):
        from logstash_spark.operators.codecs_binary import (fluent_decode,
                                                            fluent_encode)

        df = spark.createDataFrame([(1700000000, "x")],
                                   "ts long, message string")
        enc = fluent_encode(df, tag="t", time_col="ts",
                            record_cols=["message"])
        r = fluent_decode(enc.select("message"), "message").first()
        assert r.fluent_failed is False

    def test_spool_header_prune_is_atomic_format(self, tmp_path):
        """Finding 5: base+content now share one file (header line), so
        the prune is a single atomic os.replace."""
        import json as _json

        from logstash_spark.sources.http_input import (_read_base,
                                                       _read_lines,
                                                       append_spool_lines)

        d = str(tmp_path / "spool")
        append_spool_lines(d, [{"message": f"m{i}"} for i in range(3)])
        first = open(f"{d}/events.jsonl").readline()
        assert _json.loads(first) == {"__base__": 0}
        assert _read_base(d) == 0
        recs = _read_lines(f"{d}/events.jsonl", 0)
        assert [r["message"] for r in recs] == ["m0", "m1", "m2"]
        # legacy header-less file still reads (base 0, all lines data)
        legacy = tmp_path / "legacy"
        legacy.mkdir()
        (legacy / "events.jsonl").write_text('{"message":"old"}\n')
        assert _read_base(str(legacy)) == 0
        assert _read_lines(str(legacy / "events.jsonl"), 0)[0]["message"] \
            == "old"

    def test_s3_epochs_scoped_per_checkpoint(self, spark, tmp_path):
        """Finding 6: a fresh checkpoint restarting at epoch 0 must not
        overwrite a previous run's epoch_id=0 objects."""
        from logstash_spark.plans.lscl import compile_lscl_job

        src = tmp_path / "src"
        src.mkdir()
        (src / "a.txt").write_text("one\n")
        cfg = f"""
        input {{ file {{ path => "{src}" codec => "line" }} }}
        output {{ s3 {{ bucket => "{tmp_path}" prefix => "s3out/"
                        codec => "json_lines" scheme => "file" }} }}
        """
        compile_lscl_job(cfg).run_stream(
            spark, checkpoint_dir=str(tmp_path / "ck1")).awaitTermination(120)
        (src / "b.txt").write_text("two\n")
        # NEW checkpoint: its epoch 0 must not clobber run 1's epoch 0
        compile_lscl_job(cfg).run_stream(
            spark, checkpoint_dir=str(tmp_path / "ck2")).awaitTermination(120)
        msgs = sorted(r.message for r in
                      spark.read.json(str(tmp_path / "s3out")).collect())
        assert msgs == ["one", "one", "two"]  # run2 re-reads both files

    def test_es_input_missing_hosts_is_config_error(self, spark):
        from logstash_spark.plans.lscl import compile_lscl_job

        cfg = 'input { elasticsearch { index => "x" } } output { null {} }'
        with pytest.raises(SyntaxError, match="hosts"):
            compile_lscl_job(cfg).run(spark)

    def test_ordered_rejects_stdin_and_multi_spool(self, spark, tmp_path):
        from logstash_spark.plans.lscl import compile_lscl_job

        with pytest.raises(SyntaxError, match="arrival order"):
            compile_lscl_job(
                "input { stdin {} } output { null {} }").run_stream(
                spark, checkpoint_dir=str(tmp_path / "c1"), ordered=True)
        cfg = f"""
        input {{ http {{ spool_dir => "{tmp_path}/s1" }}
                 http {{ spool_dir => "{tmp_path}/s2" }} }}
        output {{ null {{}} }}
        """
        with pytest.raises(SyntaxError, match="spool_dirs"):
            compile_lscl_job(cfg).run_stream(
                spark, checkpoint_dir=str(tmp_path / "c2"), ordered=True)

    def test_shared_spool_dir_single_reader(self, spark, tmp_path):
        """Two input nodes on ONE spool_dir must not double-deliver."""
        from logstash_spark.plans.lscl import compile_lscl_job

        spool = str(tmp_path / "spool")
        sink = str(tmp_path / "sink")
        cfg = f"""
        input {{ http {{ spool_dir => "{spool}" }}
                 udp  {{ spool_dir => "{spool}" }} }}
        output {{ file {{ path => "{sink}" codec => "json_lines" }} }}
        """
        job = compile_lscl_job(cfg)
        q = job.run_stream(spark, checkpoint_dir=str(tmp_path / "ck"),
                           available_now=False,
                           trigger_interval="200 milliseconds")
        try:
            assert len(job.http_spools) == 2  # both listeners run
            import urllib.request
            port = job.http_spools[0].port
            urllib.request.urlopen(f"http://127.0.0.1:{port}/",
                                   data=b"once", timeout=5)
            import time as _time
            rows = []
            for _ in range(100):
                try:
                    rows = spark.read.json(sink).collect()
                except Exception:  # noqa: BLE001
                    rows = []
                if rows:
                    _time.sleep(1.0)  # allow any duplicate to surface
                    rows = spark.read.json(sink).collect()
                    break
                _time.sleep(0.2)
            assert [r.message for r in rows] == ["once"]
        finally:
            q.stop()
            for s in job.http_spools:
                s.stop()


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
