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
