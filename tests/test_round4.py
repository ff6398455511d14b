"""Round-4 regression tests for the r3 ADVICE findings plus the new
round-4 surfaces (LSCL ${VAR} expansion, pipelines.yml, multimodal decode,
node-stats view, DLQ retention get their own sections as they land)."""

import struct

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r3: codec robustness
# ---------------------------------------------------------------------------

class TestCodecRobustness:
    def test_msgpack_depth_bomb_tags_not_crashes(self, spark):
        """~600 nested fixarray(1) bytes must yield _msgpackparsefailure,
        not a RecursionError-killed task (ADVICE r3 #1)."""
        from logstash_spark.operators.codecs_binary import msgpack_decode

        bomb = bytes([0x91]) * 600 + b"\xc0"   # [[[...nil...]]] depth 600
        df = spark.createDataFrame([(bytearray(bomb),)], "raw binary")
        out = msgpack_decode(df, "raw", "i long").collect()[0]
        assert "_msgpackparsefailure" in out.tags

    def test_msgpack_decode_fn_raises_bounded(self):
        from logstash_spark.operators.codecs_binary import (MsgpackError,
                                                            _mp_decode)

        with pytest.raises(MsgpackError):
            _mp_decode(bytes([0x91]) * 600 + b"\xc0")
        # at a sane depth the same shape still decodes
        v, end = _mp_decode(bytes([0x91]) * 100 + b"\xc0")
        assert end == 101

    def test_msgpack_scalar_top_level_tags(self, spark):
        """A packet decoding to a bare int is not an event — it must carry
        the failure tag, not null-fill silently (ADVICE r3 #4)."""
        from logstash_spark.operators.codecs_binary import msgpack_decode

        df = spark.createDataFrame([(bytearray(b"\x2a"),)], "raw binary")
        out = msgpack_decode(df, "raw", "i long").collect()[0]
        assert "_msgpackparsefailure" in out.tags

    def test_edn_depth_bomb_tags_not_crashes(self, spark):
        from logstash_spark.operators.codecs_binary import edn_decode

        bomb = "[" * 600 + "]" * 600
        df = spark.createDataFrame([(bomb,), ('{:i 7}',)], "raw string")
        rows = {r.raw[:1]: r for r in
                edn_decode(df, "raw", "i long").collect()}
        assert "_ednparsefailure" in rows["["].tags
        assert rows["{"].i == 7
        assert "_ednparsefailure" not in (rows["{"].tags or [])

    def test_netflow_zero_count_packet_marked(self, spark):
        """count=0 v5 packet: one netflow_failed row, never zero rows
        (ADVICE r3 #4 — silent packet loss)."""
        from logstash_spark.operators.codecs_binary import netflow5_decode

        hdr = struct.pack(">HHIIIIBBH", 5, 0, 123, 1700000000, 0, 9, 0, 0, 0)
        df = spark.createDataFrame([(bytearray(hdr),)], "raw binary")
        rows = netflow5_decode(df, "raw").collect()
        assert len(rows) == 1 and rows[0].netflow_failed

    def test_collectd_state_only_packet_marked(self, spark):
        """A packet with host/plugin parts but no VALUES part emits a
        collectd_failed row instead of vanishing."""
        from logstash_spark.operators.codecs_binary import collectd_decode

        payload = b"myhost\x00"
        pkt = struct.pack(">HH", 0x0000, 4 + len(payload)) + payload
        df = spark.createDataFrame([(bytearray(pkt),)], "raw binary")
        rows = collectd_decode(df, "raw").collect()
        assert len(rows) == 1 and rows[0].collectd_failed


# ---------------------------------------------------------------------------
# ADVICE r3: date zone-token misclassification
# ---------------------------------------------------------------------------

class TestDateZoneTokens:
    def test_joda_weekyear_x_is_not_a_zone(self):
        from logstash_spark.operators.date import _has_zone

        assert not _has_zone("xxxx-'W'ww-e")      # Joda weekyear pattern
        assert _has_zone("dd/MMM/yyyy:HH:mm:ss Z")
        assert _has_zone("yyyy-MM-dd HH:mm:ss z")
        assert not _has_zone("yyyy-MM-dd'Z'")     # quoted literal Z
        assert _has_zone("UNIX")

    def test_timezone_applied_to_zoneless_pattern(self, spark):
        from logstash_spark.operators.date import date

        df = spark.createDataFrame([("2024-06-01 12:00:00",)], "t string")
        out = date(df, "t", ["yyyy-MM-dd HH:mm:ss"],
                   timezone="America/New_York").collect()[0]
        # noon EDT == 16:00 UTC
        assert out["@timestamp"].hour == 16


# ---------------------------------------------------------------------------
# ADVICE r3: LSCL elapsed on frames without turn_idx
# ---------------------------------------------------------------------------

def test_lscl_elapsed_without_turn_idx(spark):
    from logstash_spark.plans.lscl import compile_lscl

    df = spark.createDataFrame(
        [("r1", ["start"], "2024-01-01 00:00:00"),
         ("r1", ["end"], "2024-01-01 00:00:30"),
         ("r2", ["start"], "2024-01-01 00:01:00")],
        "req_id string, tags array<string>, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cfg = """
    filter {
      elapsed {
        unique_id_field => "req_id"
        start_tag => "start"
        end_tag => "end"
        timeout => 60
      }
    }
    """
    rows = compile_lscl(cfg)(df).collect()
    assert len(rows) == 1 and rows[0].elapsed_sec == 30


def test_lscl_elapsed_id_fields_attr(spark):
    from logstash_spark.plans.lscl import compile_lscl

    df = spark.createDataFrame(
        [("r1", 7, ["start"], "2024-01-01 00:00:00"),
         ("r1", 8, ["end"], "2024-01-01 00:00:30")],
        "req_id string, seq int, tags array<string>, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cfg = """
    filter {
      elapsed {
        unique_id_field => "req_id"
        start_tag => "start"
        end_tag => "end"
        timeout => 60
        id_fields => ["seq"]
      }
    }
    """
    rows = compile_lscl(cfg)(df).collect()
    assert len(rows) == 1 and rows[0].start_seq == 7


# ---------------------------------------------------------------------------
# round 4: real multimodal decode (pure-stdlib PNG/PPM, VERDICT r3 #4)
# ---------------------------------------------------------------------------

def _encode_png(px, color_type, filters=None, palette=None):
    """Minimal PNG ENCODER (test fixture only): writes IHDR/PLTE/IDAT/IEND
    with a caller-chosen filter type per row, so every unfilter path in the
    decoder gets exercised against ground-truth pixels."""
    import struct
    import zlib

    import numpy as np

    h, w = px.shape[:2]
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    flat = px.reshape(h, w * bpp).astype(np.int32)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        ft = filters[y]
        row = flat[y]
        if ft == 0:
            enc = row
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            enc = (row - left) % 256
        elif ft == 2:
            enc = (row - prev) % 256
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            enc = (row - (left + prev) // 2) % 256
        elif ft == 4:
            enc = np.zeros_like(row)
            prev_row = prev
            for x in range(w * bpp):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev_row[x])
                c = int(flat[y - 1][x - bpp]) if (x >= bpp and y > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (int(row[x]) - pred) % 256
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype, data):
        c = struct.pack(">I", len(data)) + ctype + data
        return c + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")


class TestRealImageDecode:
    def _rng_px(self, h, w, c, seed=7):
        import numpy as np

        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, (h, w, c), dtype=np.uint8)

    def test_png_roundtrip_all_filters(self):
        """RGB image encoded with filter types 0..4 across rows must decode
        back to the exact source pixels."""
        import numpy as np

        from logstash_spark.datahub.multimodal import decode_png

        px = self._rng_px(5, 4, 3)
        payload = _encode_png(px, color_type=2, filters=[0, 1, 2, 3, 4])
        got = decode_png(payload)
        assert np.array_equal(got, px)

    def test_png_color_types(self):
        import numpy as np

        from logstash_spark.datahub.multimodal import decode_png

        for ct, c in [(0, 1), (4, 2), (6, 4)]:
            px = self._rng_px(3, 3, c, seed=ct)
            got = decode_png(_encode_png(px, ct, filters=[2, 1, 4]))
            assert np.array_equal(got, px), f"color type {ct}"
        # palette: indices -> PLTE rows
        idx = np.array([[[0], [1]], [[2], [0]]], dtype=np.uint8)
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]])
        got = decode_png(_encode_png(idx, 3, palette=pal))
        assert got.shape == (2, 2, 3) and list(got[0, 1]) == [0, 255, 0]

    def test_ppm_roundtrip(self):
        import numpy as np

        from logstash_spark.datahub.multimodal import decode_ppm

        px = self._rng_px(2, 3, 3)
        payload = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
        assert np.array_equal(decode_ppm(payload), px)

    def test_malformed_yields_null_not_crash(self):
        from logstash_spark.datahub.multimodal import decode_image

        assert decode_image(None) is None
        assert decode_image(b"\x89PNG\r\n\x1a\x0agarbage") is None
        assert decode_image(b"P6 broken") is None
        assert decode_image(b"\xff\xd8\xff\xe0 jpeg-ish") is None  # no codec

    def test_extract_features_real_path_end_to_end(self, spark):
        """fake=False over a media frame: PNG rows get pixel-stat features,
        undecodable rows get null feat — through the real mapInPandas."""
        import numpy as np

        from logstash_spark.datahub.multimodal import (MEDIA_SCHEMA,
                                                       extract_features)

        solid = np.full((4, 6, 3), 128, dtype=np.uint8)     # flat gray
        png = _encode_png(solid, 2, filters=[0, 1, 2, 3])
        rows = [
            (1, "image/png", (6, 4, 1), bytearray(png)),
            (2, "image/jpeg", (1, 1, 1), bytearray(b"\xff\xd8\xffnope")),
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = {r.media_id: r for r in
               extract_features(media, fake=False).collect()}
        f = out[1].feat
        assert f[0] == 6.0 and f[1] == 4.0 and f[2] == 3.0
        assert abs(f[3] - 128 / 255) < 1e-9 and f[4] == 0.0   # mean, std
        assert f[5] == 0.0 and f[6] == 0.0 and f[7] == 0.0    # dark/bright/grad
        assert out[2].feat is None

    def test_fake_path_unchanged_for_oracle(self):
        import hashlib

        from logstash_spark.datahub.multimodal import decode_stub

        h = hashlib.sha256(b"abc").digest()
        assert decode_stub(b"abc", fake=True) == [b / 255.0 for b in h[:8]]


# ---------------------------------------------------------------------------
# round 4: projection-aware grok (VERDICT r3 "What's wrong" #3 / next #6)
# ---------------------------------------------------------------------------

class TestProjectionAwareGrok:
    TPL = "status=%{INT:status:int} bytes=%{INT:bytes:int} tool=%{WORD:tool_name}"

    def test_match_only_has_no_generate(self, spark, transcripts):
        from logstash_spark.operators.grok import grok

        out = grok(transcripts, "text", self.TPL, project=[])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan
        assert "status" not in out.columns
        # match/tag semantics identical to the full path
        full = grok(transcripts, "text", self.TPL)
        a = out.select("conv_id", "turn_idx",
                       F.array_contains("tags", "_grokparsefailure").alias("f"))
        b = full.select("conv_id", "turn_idx",
                        F.array_contains("tags", "_grokparsefailure").alias("f"))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_subset_projection_values_match_full(self, spark, transcripts):
        from logstash_spark.operators.grok import grok

        sub = grok(transcripts, "text", self.TPL, project=["status"])
        full = grok(transcripts, "text", self.TPL)
        assert "bytes" not in sub.columns and "status" in sub.columns
        a = sub.select("conv_id", "turn_idx", "status")
        b = full.select("conv_id", "turn_idx", "status")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_multi_template_match_only(self, spark):
        from logstash_spark.operators.grok import grok

        df = spark.createDataFrame(
            [("num=5",), ("word=hi",), ("garbage",)], "text string")
        out = grok(df, "text", ["num=%{INT:n:int}", "word=%{WORD:w}"],
                   project=[])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan
        rows = {r.text: "_grokparsefailure" in (r.tags or [])
                for r in out.collect()}
        assert rows == {"num=5": False, "word=hi": False, "garbage": True}

    def test_unknown_projection_name_raises(self, spark, transcripts):
        from logstash_spark.operators.grok import grok

        with pytest.raises(ValueError, match="nope"):
            grok(transcripts, "text", self.TPL, project=["nope"])


# ---------------------------------------------------------------------------
# ADVICE r3: chunking whitespace normalization
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# round 4: ${VAR} / ${VAR:default} expansion (ConfigVariableExpander.java;
# docs/reference/environment-variables.md)
# ---------------------------------------------------------------------------

class TestEnvVarExpansion:
    def test_expand_str_semantics(self):
        from logstash_spark.plans.lscl import expand_env_str

        env = {"HOST": "db1", "PORT": "5432"}
        assert expand_env_str("${HOST}:${PORT}", env) == "db1:5432"
        assert expand_env_str("${MISSING:fallback}", env) == "fallback"
        assert expand_env_str("${MISSING:}", env) == ""
        assert expand_env_str("$${HOST}", env) == "${HOST}"   # escape
        assert expand_env_str("no vars", env) == "no vars"
        with pytest.raises(SyntaxError, match="MISSING"):
            expand_env_str("${MISSING}", env)

    def test_filter_config_with_env_vars(self, spark):
        from logstash_spark.plans.lscl import compile_lscl

        df = spark.createDataFrame([("a",), ("b",)], "text string")
        cfg = """
        filter {
          mutate { add_field => { "env_name" => "${DEPLOY_ENV:staging}" }
                   add_tag => ["${EXTRA_TAG}"] }
        }
        """
        out = compile_lscl(cfg, context={"env": {"EXTRA_TAG": "from-env"}})(df)
        r = out.collect()[0]
        assert r.env_name == "staging" and "from-env" in r.tags

    def test_context_env_overrides_osenviron(self, spark, monkeypatch):
        from logstash_spark.plans.lscl import compile_lscl

        monkeypatch.setenv("LS_TEST_VAR", "from-os")
        df = spark.createDataFrame([("a",)], "text string")
        cfg = 'filter { mutate { add_field => { "v" => "${LS_TEST_VAR}" } } }'
        assert compile_lscl(cfg)(df).collect()[0].v == "from-os"
        out = compile_lscl(cfg, context={"env": {"LS_TEST_VAR": "secret"}})(df)
        assert out.collect()[0].v == "secret"   # secret store wins

    def test_nested_hash_and_conditionals_untouched(self, spark):
        from logstash_spark.plans.lscl import compile_lscl

        df = spark.createDataFrame([("x",)], "text string")
        # ${...} expands inside hash values under an if; the conditional
        # EXPRESSION itself is not an expansion site (reference behavior)
        cfg = """
        filter {
          if [text] == "x" {
            mutate { add_field => { "k" => "${A:1}-${B:2}" } }
          }
        }
        """
        assert compile_lscl(cfg)(df).collect()[0].k == "1-2"

    def test_unset_var_fails_at_compile(self):
        from logstash_spark.plans.lscl import compile_lscl

        with pytest.raises(SyntaxError, match="NOT_A_REAL_VAR"):
            compile_lscl(
                'filter { mutate { add_field => '
                '{ "k" => "${NOT_A_REAL_VAR_XYZ_123}" } } }')


# ---------------------------------------------------------------------------
# round 4: pipelines.yml loader + reload identity (agent.rb,
# state_resolver.rb, PipelineIR.uniqueHash)
# ---------------------------------------------------------------------------

class TestPipelinesYml:
    def test_composed_equals_fused(self, spark, transcripts):
        """The two-pipeline yml output must equal the fused single config
        (the pipeline_p2p oracle shape, VERDICT r3 'Next round' #3)."""
        from logstash_spark.catalog import (P2P_PIPELINES_YML)
        from logstash_spark.plans.lscl import compile_lscl
        from logstash_spark.plans.pipelines_yml import load_pipelines_yml

        pset = load_pipelines_yml(P2P_PIPELINES_YML)
        assert pset.topo_order() == ["upstream", "downstream"]
        got = pset.run(spark, stdin_dfs={"upstream": transcripts})["downstream"]

        fused_cfg = """
        filter {
          grok { match => { "text" => "status=%{INT:status:int} bytes=%{INT:bytes:int} tool=%{WORD:tool_name} msg=%{WORD:msg}" } }
          if "_grokparsefailure" in [tags] { drop {} }
          mutate { uppercase => ["tool_name"] }
          if [status] >= 400 { mutate { add_tag => ["error"] } }
        }
        """
        want = compile_lscl(fused_cfg)(transcripts)
        cols = ["conv_id", "turn_idx", "status", "tool_name"]
        assert got.select(cols).exceptAll(want.select(cols)).count() == 0
        assert want.select(cols).exceptAll(got.select(cols)).count() == 0

    def test_topo_order_respects_bus(self):
        from logstash_spark.plans.pipelines_yml import load_pipelines_yml

        yml = """
- pipeline.id: c
  config.string: "input { pipeline { address => \\"mid\\" } } output { null {} }"
- pipeline.id: a
  config.string: "input { generator { count => 1 } } output { pipeline { send_to => [\\"top\\"] } }"
- pipeline.id: b
  config.string: "input { pipeline { address => \\"top\\" } } output { pipeline { send_to => [\\"mid\\"] } }"
"""
        order = load_pipelines_yml(yml).topo_order()
        assert order.index("a") < order.index("b") < order.index("c")

    def test_cycle_rejected(self):
        from logstash_spark.plans.pipelines_yml import load_pipelines_yml

        yml = """
- pipeline.id: p1
  config.string: "input { pipeline { address => \\"x\\" } } output { pipeline { send_to => [\\"y\\"] } }"
- pipeline.id: p2
  config.string: "input { pipeline { address => \\"y\\" } } output { pipeline { send_to => [\\"x\\"] } }"
"""
        with pytest.raises(SyntaxError, match="cycle"):
            load_pipelines_yml(yml).topo_order()

    def test_spec_hash_reload_actions(self):
        from logstash_spark.plans.pipelines_yml import (load_pipelines_yml,
                                                        resolve_actions)

        v1 = """
- pipeline.id: keep
  config.string: "input { generator { count => 1 } } output { null {} }"
- pipeline.id: gone
  config.string: "input { generator { count => 2 } } output { null {} }"
- pipeline.id: changed
  config.string: "input { generator { count => 3 } } output { null {} }"
"""
        v2 = """
- pipeline.id: keep
  config.string: "input { generator { count => 1 } } output { null {} }"
- pipeline.id: changed
  config.string: "input { generator { count => 30 } } output { null {} }"
- pipeline.id: fresh
  config.string: "input { generator { count => 4 } } output { null {} }"
"""
        acts = resolve_actions(load_pipelines_yml(v1), load_pipelines_yml(v2))
        assert acts == {"keep": "unchanged", "gone": "stop",
                        "changed": "reload", "fresh": "start"}

    def test_env_change_is_a_reload(self):
        """${VAR} resolution participates in the spec hash: a changed
        secret/env value must trigger reload on converge."""
        from logstash_spark.plans.pipelines_yml import load_pipelines_yml

        yml = """
- pipeline.id: p
  config.string: "input { generator { message => \\"${GREETING:hi}\\" } } output { null {} }"
"""
        h1 = load_pipelines_yml(yml).hashes()["p"]
        h2 = load_pipelines_yml(
            yml, context={"env": {"GREETING": "yo"}}).hashes()["p"]
        assert h1 != h2

    def test_duplicate_id_rejected(self):
        from logstash_spark.plans.pipelines_yml import load_pipelines_yml

        yml = """
- pipeline.id: p
  config.string: "output { null {} }"
- pipeline.id: p
  config.string: "output { null {} }"
"""
        with pytest.raises(SyntaxError, match="duplicate"):
            load_pipelines_yml(yml)

    def test_path_config_glob(self, spark, tmp_path):
        from logstash_spark.plans.pipelines_yml import load_pipelines_yml

        (tmp_path / "01-in.conf").write_text(
            'input { generator { count => 3 } }')
        (tmp_path / "02-out.conf").write_text('output { null {} }')
        yml = f"""
- pipeline.id: globbed
  path.config: "{tmp_path}/*.conf"
  pipeline.workers: 2
"""
        pset = load_pipelines_yml(yml)
        assert pset.specs["globbed"].settings["pipeline.workers"] == 2
        out = pset.run(spark)["globbed"]
        assert out.count() == 3


# ---------------------------------------------------------------------------
# round 4: DLQ retention (environment.rb:103-108, VERDICT r3 "Next round" #8)
# ---------------------------------------------------------------------------

class TestDlqRetention:
    def _write_segments(self, spark, path, ages_hours):
        """One parquet segment per age bucket, dlq_ts back-dated."""
        import datetime as dt

        now = dt.datetime(2026, 8, 18, 12, 0, 0, tzinfo=dt.timezone.utc)
        for i, h in enumerate(ages_hours):
            ts = now - dt.timedelta(hours=h)
            df = spark.createDataFrame(
                [(f"evt{i}-{j}", "bad_json", ts.replace(tzinfo=None))
                 for j in range(50)],
                "text string, dlq_reason string, dlq_ts timestamp")
            df.coalesce(1).write.mode("append").parquet(path)
        return now

    def test_age_expiry(self, spark, tmp_path):
        from logstash_spark.operators.dlq import dlq_expire, dlq_replay

        path = str(tmp_path / "dlq")
        now = self._write_segments(spark, path, ages_hours=[100, 30, 1])
        res = dlq_expire(path, max_age_seconds=48 * 3600, now=now)
        assert len(res["removed"]) == 1 and res["kept_files"] == 2
        left = dlq_replay(spark, path)
        assert left.count() == 100                     # 2 segments survive
        # replay honors the commit offset over the survivors
        import datetime as dt
        cut = (now - dt.timedelta(hours=2)).replace(tzinfo=None)
        assert left.filter(F.col("dlq_ts") > F.lit(cut)).count() == 50

    def test_size_expiry_drops_oldest_first(self, spark, tmp_path):
        from logstash_spark.operators.dlq import dlq_expire, dlq_replay

        path = str(tmp_path / "dlq")
        now = self._write_segments(spark, path, ages_hours=[30, 20, 10])
        import glob
        import os

        seg_bytes = max(os.path.getsize(f) for f in
                        glob.glob(f"{path}/*.parquet"))
        res = dlq_expire(path, max_bytes=2 * seg_bytes + 10, now=now)
        assert len(res["removed"]) == 1
        assert res["kept_bytes"] <= 2 * seg_bytes + 10
        left = dlq_replay(spark, path).agg(F.min("dlq_ts")).collect()[0][0]
        # the OLDEST segment (30h) went; 20h newest-min remains
        assert left.hour == (now.hour - 20) % 24

    def test_noop_when_within_budget(self, spark, tmp_path):
        from logstash_spark.operators.dlq import dlq_expire

        path = str(tmp_path / "dlq")
        now = self._write_segments(spark, path, ages_hours=[1])
        res = dlq_expire(path, max_age_seconds=7 * 24 * 3600,
                         max_bytes=10 ** 9, now=now)
        assert res["removed"] == [] and res["kept_files"] == 1


# ---------------------------------------------------------------------------
# round 4: batch inputs — s3 / elasticsearch / redis (VERDICT r3 missing #4)
# ---------------------------------------------------------------------------

class TestBatchInputs:
    def test_s3_plumbing_over_file_scheme(self, spark, tmp_path):
        """Everything but the s3a jar: prefix listing, line + json_lines +
        gzip codecs through the identical code path."""
        import gzip

        from logstash_spark.sources.batch_inputs import s3_source

        d = tmp_path / "bucket" / "logs"
        d.mkdir(parents=True)
        (d / "a.log").write_text("one\ntwo\n")
        with gzip.open(d / "b.log.gz", "wt") as f:
            f.write("three\n")                     # reference handles gzip
        out = s3_source(spark, str(tmp_path / "bucket"), "logs/",
                        codec="line", scheme="file")
        assert {r.message for r in out.collect()} == {"one", "two", "three"}

        (d / "c.jsonl").write_text('{"k": 1}\n{"k": 2}\n')
        js = s3_source(spark, str(tmp_path / "bucket"), "logs/*.jsonl",
                       codec="json_lines", scheme="file")
        assert sorted(r.k for r in js.collect()) == [1, 2]

    def test_s3a_jar_gate_hint(self, spark):
        from logstash_spark.sources.batch_inputs import s3_source

        with pytest.raises(NotImplementedError, match="hadoop-aws"):
            s3_source(spark, "some-bucket", "p/")

    def test_elasticsearch_scroll_pager(self, spark):
        """Live fake ES: _search?scroll then /_search/scroll pages, empty
        page terminates, scroll cleaned up."""
        import http.server
        import threading

        calls = []

        class FakeES(http.server.BaseHTTPRequestHandler):
            def _respond(self, obj):
                body = __import__("json").dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                self.rfile.read(int(self.headers.get("Content-Length", 0)))
                calls.append(self.path)
                if self.path.startswith("/idx/_search"):
                    self._respond({"_scroll_id": "s1", "hits": {"hits": [
                        {"_id": "1", "_index": "idx", "_source": {"v": 10}},
                        {"_id": "2", "_index": "idx", "_source": {"v": 20}},
                    ]}})
                elif len([c for c in calls if c == "/_search/scroll"]) == 1:
                    self._respond({"_scroll_id": "s1", "hits": {"hits": [
                        {"_id": "3", "_index": "idx", "_source": {"v": 30}},
                    ]}})
                else:
                    self._respond({"_scroll_id": "s1", "hits": {"hits": []}})

            def do_DELETE(self):
                if self.headers.get("Content-Length"):
                    self.rfile.read(int(self.headers["Content-Length"]))
                calls.append("DELETE")
                self._respond({"succeeded": True})

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), FakeES)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            from logstash_spark.sources.batch_inputs import \
                elasticsearch_source

            out = elasticsearch_source(
                spark, f"127.0.0.1:{srv.server_address[1]}", "idx",
                query={"match_all": {}}, size=2,
                schema="v int")
            rows = sorted(out.collect(), key=lambda r: r._id)
            assert [r._id for r in rows] == ["1", "2", "3"]
            assert [r.doc.v for r in rows] == [10, 20, 30]
            assert "DELETE" in calls                 # scroll cleanup
        finally:
            srv.shutdown()

    def test_redis_list_drain(self, spark):
        """Live fake RESP2 server: LPOP with count drains in batches."""
        import socket
        import threading

        items = [f'{{"n": {i}}}' for i in range(7)]

        def serve(srv):
            conn, _ = srv.accept()
            f = conn.makefile("rb")
            while True:
                line = f.readline()
                if not line:
                    return
                nargs = int(line[1:-2])
                args = []
                for _ in range(nargs):
                    ln = int(f.readline()[1:-2])
                    args.append(f.read(ln + 2)[:-2].decode())
                assert args[0] == "LPOP" and args[1] == "q"
                n = int(args[2])
                # emulate LPOP <key> <count> semantics
                out = []
                while items and len(out) < n:
                    out.append(items.pop(0))
                if not out:
                    conn.sendall(b"*-1\r\n")
                else:
                    resp = [f"*{len(out)}\r\n".encode()]
                    for it in out:
                        b = it.encode()
                        resp.append(b"$%d\r\n%s\r\n" % (len(b), b))
                    conn.sendall(b"".join(resp))

        srv = socket.create_server(("127.0.0.1", 0))
        threading.Thread(target=serve, args=(srv,), daemon=True).start()
        from logstash_spark.sources.batch_inputs import redis_source_batch

        out = redis_source_batch(
            spark, "127.0.0.1", srv.getsockname()[1], "q",
            batch_size=3, codec="json_lines", schema="n int")
        assert sorted(r.doc.n for r in out.collect()) == list(range(7))

    def test_lscl_s3_and_redis_inputs(self, spark, tmp_path):
        from logstash_spark.plans.lscl import compile_lscl_job

        d = tmp_path / "b" / "pfx"
        d.mkdir(parents=True)
        (d / "x.log").write_text("num=1\nnum=2\n")
        cfg = f"""
        input {{ s3 {{ bucket => "{tmp_path}/b" prefix => "pfx/"
                       codec => "line" scheme => "file" }} }}
        filter {{ grok {{ match => {{ "message" => "num=%{{INT:num:int}}" }} }} }}
        output {{ null {{}} }}
        """
        out = compile_lscl_job(cfg).run(spark)
        assert sorted(r.num for r in out.collect()) == [1, 2]


def test_chunking_strips_all_whitespace_kinds(spark):
    from logstash_spark.datahub.chunking import chunk_documents

    df = spark.createDataFrame(
        [(1, "\n\thello world foo\t\n"), (2, "  plain  "), (3, "\t\n ")],
        "doc_id int, text string")
    rows = {r.doc_id: r for r in
            chunk_documents(df, "text", max_tokens=512).collect()}
    assert rows[1].n_chunk_tokens == 3
    assert rows[1].chunk_text == "hello world foo"
    assert rows[2].n_chunk_tokens == 1
    assert 3 not in rows                       # all-whitespace doc -> 0 chunks


# ---------------------------------------------------------------------------
# round 4: s3 / http outputs (symmetric with the batch inputs)
# ---------------------------------------------------------------------------

class TestOutputSinks:
    def test_s3_sink_roundtrip_file_scheme(self, spark, tmp_path):
        """json_lines + gzip-line writes over file://, read back by
        s3_source through the identical plumbing."""
        from logstash_spark.sources.batch_inputs import s3_source
        from logstash_spark.sources.connectors import s3_sink

        df = spark.createDataFrame(
            [("a", 1), ("b", 2)], "message string, n int")
        s3_sink(df, str(tmp_path), "out_json/", codec="json_lines",
                scheme="file")
        back = s3_source(spark, str(tmp_path), "out_json/*.json",
                         codec="json_lines", scheme="file")
        assert sorted((r.message, r.n) for r in back.collect()) == \
            [("a", 1), ("b", 2)]

        s3_sink(df, str(tmp_path), "out_gz/", codec="line", scheme="file",
                compression="gzip")
        import glob
        import gzip

        files = glob.glob(str(tmp_path / "out_gz" / "*.txt.gz"))
        assert files, "expected gzip parts"
        lines = []
        for fn in files:
            with gzip.open(fn, "rt") as f:
                lines += f.read().splitlines()
        assert sorted(lines) == ["a", "b"]

    def test_s3_sink_jar_gate_hint(self, spark):
        from logstash_spark.sources.connectors import s3_sink

        df = spark.createDataFrame([("x",)], "message string")
        with pytest.raises(NotImplementedError, match="hadoop-aws"):
            s3_sink(df, "bucket", "p/")

    @staticmethod
    def _http_receiver(fail_first: int = 0):
        """Live HTTP server capturing POST bodies; optionally 503s the
        first `fail_first` requests (retry path)."""
        import http.server
        import threading

        state = {"bodies": [], "fails": fail_first}

        class Recv(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(
                    int(self.headers.get("Content-Length", 0)))
                if state["fails"] > 0:
                    state["fails"] -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
                state["bodies"].append(body.decode())
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), Recv)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, state

    def test_http_sink_json_batch_and_retry(self, spark):
        import json

        from logstash_spark.sources.connectors import http_sink

        srv, state = self._http_receiver(fail_first=1)
        try:
            df = spark.createDataFrame(
                [(i, f"m{i}") for i in range(7)],
                "n int, message string").coalesce(1)
            sent = http_sink(
                df, f"http://127.0.0.1:{srv.server_address[1]}/ingest",
                format="json_batch", batch_size=3)
            assert sent == 7
            # 503 on the first request was retried: all 7 events arrive
            events = [e for b in state["bodies"] for e in json.loads(b)]
            assert sorted(e["n"] for e in events) == list(range(7))
            assert max(len(json.loads(b)) for b in state["bodies"]) <= 3
        finally:
            srv.shutdown()

    def test_http_sink_ndjson(self, spark):
        import json

        from logstash_spark.sources.connectors import http_sink

        srv, state = self._http_receiver()
        try:
            df = spark.createDataFrame([(1,), (2,)], "n int").coalesce(1)
            sent = http_sink(
                df, f"http://127.0.0.1:{srv.server_address[1]}/",
                format="ndjson", batch_size=10)
            assert sent == 2
            lines = [json.loads(ln) for b in state["bodies"]
                     for ln in b.splitlines()]
            assert sorted(e["n"] for e in lines) == [1, 2]
        finally:
            srv.shutdown()

    def test_lscl_s3_and_http_outputs(self, spark, tmp_path):
        import json

        from logstash_spark.plans.lscl import compile_lscl_job

        srv, state = self._http_receiver()
        try:
            cfg = f"""
            input {{ generator {{ count => 3 message => "hi" }} }}
            output {{
              s3 {{ bucket => "{tmp_path}" prefix => "lscl_out/"
                    codec => "json_lines" scheme => "file" }}
              http {{ url => "http://127.0.0.1:{srv.server_address[1]}/x"
                      format => "json_batch" }}
            }}
            """
            compile_lscl_job(cfg).run(spark)
            back = spark.read.json(str(tmp_path / "lscl_out"))
            assert back.count() == 3
            events = [e for b in state["bodies"] for e in json.loads(b)]
            assert len(events) == 3 and all(
                e["message"] == "hi" for e in events)
        finally:
            srv.shutdown()


def test_run_stream_s3_appends_across_micro_batches(spark, tmp_path):
    """Streaming s3 output must APPEND per micro-batch (the batch path's
    overwrite would keep only the newest batch).  Two drains against the
    same checkpoint = two separate micro-batches hitting the sink."""
    from logstash_spark.plans.lscl import compile_lscl_job

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("alpha\n")
    cfg = f"""
    input {{ file {{ path => "{src}" codec => "line" }} }}
    output {{ s3 {{ bucket => "{tmp_path}" prefix => "s3out/"
                    codec => "json_lines" scheme => "file" }} }}
    """
    ck = str(tmp_path / "ck")
    compile_lscl_job(cfg).run_stream(spark, checkpoint_dir=ck) \
        .awaitTermination(120)
    (src / "b.txt").write_text("beta\ngamma\n")      # arrives later
    compile_lscl_job(cfg).run_stream(spark, checkpoint_dir=ck) \
        .awaitTermination(120)
    out = spark.read.json(str(tmp_path / "s3out"))
    assert sorted(r.message for r in out.collect()) == \
        ["alpha", "beta", "gamma"]
