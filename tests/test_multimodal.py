import pytest


def test_decode_and_features(spark):
    from deepex_spark.operators.multimodal import decode_media, media_features, synth_media

    media = synth_media(spark, n=12)
    dec = decode_media(media).collect()
    assert len(dec) == 12
    for r in dec:
        assert r["decoded"]["width"] == r["meta"]["width"]
        assert r["decoded"]["n_bytes"] > 0
    feats = media_features(media).collect()
    for r in feats:
        assert len(r["embedding"]) == 64
    # determinism across partitionings
    f1 = {r["media_id"]: r["embedding"] for r in media_features(media.coalesce(1)).collect()}
    f8 = {r["media_id"]: r["embedding"] for r in media_features(media.repartition(8)).collect()}
    assert f1 == f8


def test_frame_sampling(spark):
    from deepex_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, n=12)
    frames = sample_frames(media, every=2).collect()
    assert frames  # only video rows contribute
    vids = {r["media_id"] for r in frames}
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert all(kinds[m] == "video" for m in vids)
    # every=2 sampling: frame indices are 0,2,4,...
    assert all(r["frame_idx"] % 2 == 0 for r in frames)


def test_decode_stub_raises_on_real_media(spark):
    from deepex_spark.operators.multimodal import _decode_payload

    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n\x1a\n....")


def test_wav_decode_is_real():
    """Audio is no longer a stub: a genuine RIFF/WAVE file round-trips
    through the stdlib ``wave`` codec at the decode boundary — verified
    against an independent wave.open of the same bytes."""
    import io
    import wave as _wave

    from deepex_spark.operators.multimodal import _decode_payload, make_wav_payload

    payload = make_wav_payload(n_samples=100, sample_rate=16000, channels=2, seed=7)
    # independent parse of the same bytes
    with _wave.open(io.BytesIO(payload), "rb") as w:
        assert (w.getframerate(), w.getnchannels(), w.getnframes()) == (16000, 2, 100)
        pcm = w.readframes(100)

    d = _decode_payload(payload)
    assert d["kind"] == "A"
    assert d["width"] == 16000 and d["height"] == 2 and d["n_frames"] == 100
    assert d["body"] == pcm and d["n_bytes"] == 100 * 2 * 2  # frames*ch*2B


def test_wav_media_through_spark_plumbing(spark):
    """Real-WAV rows flow through the same Arrow decode/featurize stages
    as the synthetic container rows."""
    from deepex_spark.operators.multimodal import (
        decode_media,
        media_features,
        synth_wav_media,
    )

    media = synth_wav_media(spark, n=6)
    dec = {r["media_id"]: r["decoded"] for r in decode_media(media).collect()}
    assert len(dec) == 6
    for i, d in dec.items():
        rate, channels = 8000 * (1 + i % 3), 1 + i % 2
        n_samples = 64 + (i % 5) * 32
        assert (d["width"], d["height"], d["n_frames"]) == (rate, channels, n_samples)
        assert d["n_bytes"] == n_samples * channels * 2

    feats = media_features(media).collect()
    assert len(feats) == 6
    for r in feats:
        v = r["embedding"]
        assert len(v) == 64
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5  # unit norm


def test_streaming_available_now(spark, tmp_path):
    import time

    from deepex_spark.sources.pages import PAGES_SCHEMA, synth_page_rows
    from deepex_spark.streaming.ingest import read_page_stream

    src = tmp_path / "in"
    out = tmp_path / "out"
    chk = tmp_path / "chk"
    spark.createDataFrame(synth_page_rows(20, seed=3), PAGES_SCHEMA).write.parquet(str(src))

    stream = read_page_stream(spark, str(src))
    assert stream.isStreaming
    q = (
        stream.selectExpr("url", "length(text) AS n")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out))
    assert got.count() == 20
    # restart with no new files: exactly-once — no duplicate rows
    q2 = (
        read_page_stream(spark, str(src))
        .selectExpr("url", "length(text) AS n")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == 20


def test_windowed_event_counts_batch_semantics(spark):
    # the windowed agg is testable on a batch frame (same expression)
    import datetime as dt

    from deepex_spark.streaming.ingest import windowed_event_counts

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(base + dt.timedelta(minutes=i), "click") for i in range(25)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    # watermark is a no-op in batch; windows still computed
    out = {(r["window_start"].minute, r["n"]) for r in windowed_event_counts(df).collect()}
    assert (0, 10) in out and (10, 10) in out and (20, 5) in out


def test_stream_extract_foreachbatch(spark, tmp_path):
    """stream_extract: full batch pipeline per micro-batch via foreachBatch
    with Trigger.AvailableNow; output parquet holds ranked triples."""
    from deepex_spark.config import DeepExConfig
    from deepex_spark.sources.pages import PAGES_SCHEMA, synth_page_rows
    from deepex_spark.streaming.ingest import read_page_stream, stream_extract

    src = tmp_path / "pages_in"
    out = tmp_path / "triples_out"
    chk = tmp_path / "chk2"
    spark.createDataFrame(synth_page_rows(6, seed=17), PAGES_SCHEMA).write.parquet(str(src))

    cfg = DeepExConfig.task(dist_const=2)
    q = stream_extract(read_page_stream(spark, str(src)), cfg, str(out), str(chk))
    q.awaitTermination(180)
    got = spark.read.parquet(str(out))
    assert got.count() > 0
    assert {"docid", "subj", "rel", "obj", "rank", "batch_id"} <= set(got.columns)
    # batch output matches the batch pipeline on the same input (modulo
    # batch_id): stream == batch, one code path
    from deepex_spark.pipeline import extract_triples

    batch = extract_triples(spark.read.parquet(str(src)), cfg)
    assert batch.count() == got.count()


def _raw_png_chunk(typ: bytes, data: bytes) -> bytes:
    """Hand-rolled chunk framing (length + type + data + crc32), kept
    independent of the production _png_chunk encoder on purpose."""
    import struct
    import zlib

    return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", zlib.crc32(typ + data))


class TestPngCodec:
    def test_roundtrip_all_filters_and_color_types(self):
        """Encoder cycles filter types 0..4 per row; the decoder must
        unfilter back to the exact formula raster for every color type."""
        from deepex_spark.operators.multimodal import (
            _decode_png,
            _png_pixels,
            make_png_payload,
        )

        for ctype, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
            w, h = 7, 6  # h >= 5 -> every filter type appears
            d = _decode_png(make_png_payload(w, h, seed=ctype + 3, color_type=ctype))
            assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
            assert d["n_bytes"] == w * h * ch
            assert d["body"] == _png_pixels(w, h, ch, ctype + 3)

    def test_hand_built_png_decodes(self):
        """A PNG assembled by hand (1x2 grayscale, Up filter on row 2) —
        not via make_png_payload — pins the decoder against the spec, not
        against our own encoder."""
        import struct
        import zlib

        from deepex_spark.operators.multimodal import PNG_MAGIC, _decode_payload

        ihdr = struct.pack(">IIBBBBB", 1, 2, 8, 0, 0, 0, 0)
        # row 1: filter 0, pixel 0x40; row 2: filter 2 (Up), delta 0x05
        scan = bytes([0, 0x40, 2, 0x05])
        png = (
            PNG_MAGIC
            + _raw_png_chunk(b"IHDR", ihdr)
            + _raw_png_chunk(b"IDAT", zlib.compress(scan))
            + _raw_png_chunk(b"IEND", b"")
        )
        d = _decode_payload(png)
        assert d["body"] == bytes([0x40, 0x45])
        assert (d["width"], d["height"], d["n_frames"]) == (1, 2, 1)

    def test_unsupported_pngs_fail_loudly(self):
        import struct
        import zlib

        from deepex_spark.operators.multimodal import PNG_MAGIC, _decode_png

        for depth, ctype, inter in [(16, 0, 0), (8, 3, 0), (8, 0, 1)]:
            ihdr = struct.pack(">IIBBBBB", 1, 1, depth, ctype, 0, 0, inter)
            png = (
                PNG_MAGIC
                + _raw_png_chunk(b"IHDR", ihdr)
                + _raw_png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
                + _raw_png_chunk(b"IEND", b"")
            )
            with pytest.raises(NotImplementedError):
                _decode_png(png)

    def test_png_through_spark_plumbing(self, spark):
        from deepex_spark.operators.multimodal import decode_media, synth_png_media

        rows = decode_media(synth_png_media(spark, n=6)).select(
            "media_id", "decoded.width", "decoded.height", "decoded.n_bytes"
        ).collect()
        assert len(rows) == 6
        chans = {0: 1, 1: 3, 2: 4}
        for r in rows:
            assert r["n_bytes"] == r["width"] * r["height"] * chans[r["media_id"] % 3]


def test_bmp_decode_is_real():
    """Image decode is a real BMP parser: a hand-crafted 1x1 24-bpp BMP
    (bytes assembled independently in this test, not by the module's
    writer) decodes to its known pixel bytes; compressed BMP fails
    loudly."""
    import struct

    from deepex_spark.operators.multimodal import _decode_payload, make_bmp_payload

    body = b"\x10\x20\x30\x00"  # one BGR pixel + row pad
    hand = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, len(body), 0, 0, 0, 0)
        + body
    )
    d = _decode_payload(hand)
    assert (d["kind"], d["width"], d["height"], d["n_frames"]) == ("I", 1, 1, 1)
    assert d["body"] == body and d["bpp"] == 24

    # top-down variant (negative height)
    neg = bytearray(hand)
    neg[22:26] = struct.pack("<i", -1)
    assert _decode_payload(bytes(neg))["height"] == 1

    # compression method != BI_RGB must not silently mis-decode
    comp = bytearray(hand)
    comp[30] = 1  # BI_RLE8
    with pytest.raises(NotImplementedError):
        _decode_payload(bytes(comp))

    # writer output round-trips with padded-row accounting
    p = make_bmp_payload(5, 3, seed=9)
    d = _decode_payload(p)
    assert (d["width"], d["height"]) == (5, 3)
    assert d["n_bytes"] == (5 * 3 + ((-5 * 3) % 4)) * 3


def test_avi_decode_exact_frames():
    """Video decode is a real RIFF walk: frame chunks come back as EXACT
    bytes (including through odd-size chunk padding), matching an
    independent regeneration from the same seed."""
    import numpy as np

    from deepex_spark.operators.multimodal import _decode_payload, make_avi_payload

    p = make_avi_payload(3, 3, 4, seed=5)  # 27-byte frames -> odd chunks
    d = _decode_payload(p)
    rng = np.random.default_rng(5)
    exp = [rng.integers(0, 256, size=27, dtype=np.uint8).tobytes() for _ in range(4)]
    assert (d["kind"], d["width"], d["height"], d["n_frames"]) == ("V", 3, 3, 4)
    assert d["frames"] == exp and d["body"] == b"".join(exp)

    with pytest.raises(NotImplementedError):
        _decode_payload(b"RIFF\x04\x00\x00\x00XXXX")  # unknown RIFF form


def test_bmp_avi_through_spark_plumbing(spark):
    """Real-BMP and real-AVI rows flow through the same Arrow
    decode/frame-sample stages; AVI frame sampling returns exact chunk
    bytes, verified against an independent regeneration."""
    import zlib

    import numpy as np

    from deepex_spark.operators.multimodal import (
        decode_media,
        sample_frames,
        synth_avi_media,
        synth_bmp_media,
    )

    bmp = synth_bmp_media(spark, n=5)
    dec = {r["media_id"]: r["decoded"] for r in decode_media(bmp).collect()}
    assert len(dec) == 5
    for i, d in dec.items():
        w, h = 4 + (i % 5) * 3, 3 + (i % 4) * 2
        assert (d["width"], d["height"], d["n_frames"]) == (w, h, 1)

    avi = synth_avi_media(spark, n=4, seed=20)
    frames = sample_frames(avi, every=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {0, 1, 2, 3}
    for i, rows in by_media.items():
        w, h = 4 + (i % 4) * 2, 3 + (i % 3) * 2
        n_frames = 3 + i % 6
        rng = np.random.default_rng(20 + i)
        exp = [
            rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
            for _ in range(n_frames)
        ]
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(
            range(0, n_frames, 2)
        )
        for r in rows:
            assert bytes(r["frame_bytes"]) == exp[r["frame_idx"]]
            assert r["frame_checksum"] == zlib.crc32(exp[r["frame_idx"]])


def test_stream_extract_derive_text(spark, tmp_path):
    """derive_text=True in the streaming ingest renders text from raw
    html per micro-batch — output equals the batch pipeline run over
    the same pages with the same derivation (stream == batch, one code
    path, including the ingest derivation)."""
    from pyspark.sql import functions as F

    from deepex_spark.config import DeepExConfig
    from deepex_spark.operators.urls import html_to_text
    from deepex_spark.pipeline import extract_triples
    from deepex_spark.queries import _html_fixture_path
    from deepex_spark.streaming.ingest import read_page_stream, stream_extract

    src = tmp_path / "pages_in"
    out = tmp_path / "triples_out"
    chk = tmp_path / "chk3"
    # blank the stored text so only the derivation can produce any
    spark.read.parquet(_html_fixture_path()).limit(6).withColumn(
        "text", F.lit("")
    ).write.parquet(str(src))

    cfg = DeepExConfig.task(dist_const=2, beam_size=2)
    q = stream_extract(
        read_page_stream(spark, str(src)), cfg, str(out), str(chk),
        derive_text=True,
    )
    q.awaitTermination(180)
    got = spark.read.parquet(str(out))
    assert got.count() > 0
    batch = extract_triples(
        spark.read.parquet(str(src)).withColumn(
            "text", html_to_text(F.col("html"))
        ),
        cfg,
    )
    assert batch.count() == got.count()
