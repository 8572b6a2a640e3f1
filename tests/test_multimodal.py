"""Multimodal operator tests: real Spark plumbing, deterministic fake
decode, explicit NotImplementedError on the real-codec path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.synthesize_media(
        spark, load_table(spark, sf_dir, "documents")
    ).persist()


def test_media_ids_content_addressed(media):
    # identical payloads -> identical media_id
    n_ids = media.select("media_id").distinct().count()
    n_payloads = media.select("payload").distinct().count()
    assert n_ids == n_payloads


def test_image_features_deterministic_and_shaped(spark, media):
    imgs = media.where(media.kind == "image")
    f1 = {r.media_id: r.feature for r in mm.extract_image_features(imgs).collect()}
    f2 = {r.media_id: r.feature for r in mm.extract_image_features(imgs).collect()}
    assert f1 == f2
    assert all(len(v) == mm.FEATURE_DIM for v in f1.values())
    # width/height carried in the last live dims
    assert any(v[-2] > 0 for v in f1.values())


def test_resize_exact_byte_shape(media):
    out = mm.resize_images(media.where(media.kind == "image"), 16, 16).collect()
    assert out
    assert all(len(r.resized) == 16 * 16 * 3 for r in out)


def test_video_frame_fanout(media):
    vids = media.where(media.kind == "video")
    n = vids.count()
    frames = mm.sample_video_frames(vids, n_frames=4)
    assert frames.count() == 4 * n
    idx = frames.groupBy("media_id").agg(
        F.collect_set("frame_idx").alias("s")
    ).collect()
    assert all(sorted(r.s) == [0, 1, 2, 3] for r in idx)


def test_real_backend_raises(media):
    imgs = media.where(media.kind == "image").limit(1)
    with pytest.raises(Exception) as ei:
        mm.extract_image_features(imgs, decode_backend="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_media_stats_prunes_payload(media):
    plan = mm.media_stats(media)._jdf.queryExecution().executedPlan().toString()
    # metadata analytics must not read the payload... except for total_bytes
    # which uses length() — acceptable; the check here is that the plan is
    # a pure column-pruned aggregate with no Python stage
    assert "mapInPandas" not in plan and "PythonUDF" not in plan.lower()


def test_audio_window_framing_invariants(spark, sf_dir):
    from duckdb_hybrid_doc_search_spark.index.catalog import load_table
    from duckdb_hybrid_doc_search_spark.operators.multimodal import (
        AUDIO_HOP_BYTES, AUDIO_WINDOW_BYTES, audio_window_features,
        synthesize_media)

    media = synthesize_media(spark, load_table(spark, sf_dir, "documents"))
    rows = audio_window_features(media).collect()
    assert rows
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, ws in by_id.items():
        ws = sorted(ws, key=lambda r: r.window_idx)
        # contiguous window indexes with hop-spaced starts
        assert [w.window_idx for w in ws] == list(range(len(ws)))
        assert all(w.start_byte == i * AUDIO_HOP_BYTES
                   for i, w in enumerate(ws))
        # energy stats bounded for uint8-centered samples
        assert all(0.0 <= w.rms <= 128.0 and 0.0 <= w.peak <= 128.0
                   for w in ws)
    # deterministic
    again = audio_window_features(media).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_permissive_decode_quarantines_instead_of_raising(spark, tmp_path):
    """decode_stats_permissive on a freshly-built dirty dir: failure
    classes land as rows, healthy files decode in the same scan, and
    the strict path would have raised on the same bytes."""
    import numpy as np
    import pytest

    from duckdb_hybrid_doc_search_spark.functions.bmp import (
        decode_bmp, encode_bmp)
    from duckdb_hybrid_doc_search_spark.operators.multimodal import (
        decode_stats_permissive)

    d = tmp_path / "dirty"
    d.mkdir()
    img = np.full((2, 3, 3), 7, dtype=np.uint8)
    (d / "ok.bmp").write_bytes(encode_bmp(img))
    (d / "short.bmp").write_bytes(encode_bmp(img)[:-5])
    (d / "junk.dat").write_bytes(b"JUNKJUNKJUNK")
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(img)[:-5])  # strict contract unchanged
    rows = {r["file_name"]: tuple(r)[1:] for r in
            decode_stats_permissive(spark, [str(d)]).collect()}
    assert rows["ok.bmp"] == ("bmp", "ok", 3, 2, 3, 7 * 18)
    assert rows["short.bmp"] == ("bmp", "corrupt", 0, 0, 0, 0)
    assert rows["junk.dat"] == ("unknown", "unrecognized", 0, 0, 0, 0)


def test_quarantine_sink_replayable_payloads(spark, tmp_path):
    """bad_records_dir e2e (the badRecordsPath loop): a dirty corpus run
    leaves a written decode ledger whose quarantined PAYLOADS are
    replayable — re-decode reproduces the same failure classes, a fixed
    payload re-decodes ok — and the stats frame served from the ledger
    equals the no-sink run. Ok rows store NULL payloads (the ledger's
    size is stats + the dirty fraction, never a corpus copy)."""
    import numpy as np

    from duckdb_hybrid_doc_search_spark.functions.bmp import encode_bmp
    from duckdb_hybrid_doc_search_spark.functions.gif import (
        decode_gif, encode_gif)
    from duckdb_hybrid_doc_search_spark.operators.multimodal import (
        decode_stats_permissive, read_quarantine, replay_quarantine)

    d = tmp_path / "dirty"
    d.mkdir()
    img = np.full((2, 3, 3), 7, dtype=np.uint8)
    gif_pal = np.array([[0, 0, 0], [9, 9, 9]], dtype=np.uint8)
    gif_idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    good_gif = encode_gif(gif_idx, gif_pal)
    (d / "ok.bmp").write_bytes(encode_bmp(img))
    (d / "short.bmp").write_bytes(encode_bmp(img)[:-5])
    (d / "cut.gif").write_bytes(good_gif[:-6])
    (d / "junk.dat").write_bytes(b"JUNKJUNKJUNK")

    sink = str(tmp_path / "quarantine")
    with_sink = [tuple(r) for r in
                 decode_stats_permissive(spark, [str(d)], sink).collect()]
    no_sink = [tuple(r) for r in
               decode_stats_permissive(spark, [str(d)]).collect()]
    assert with_sink == no_sink

    q = {r["file_name"]: r for r in
         read_quarantine(spark, sink).collect()}
    assert set(q) == {"short.bmp", "cut.gif", "junk.dat"}
    assert q["short.bmp"]["status"] == "corrupt"
    assert q["junk.dat"]["status"] == "unrecognized"
    for r in q.values():
        assert r["error"]  # the failure is recorded, not just flagged
    # payloads are the ORIGINAL bytes, byte for byte
    assert bytes(q["cut.gif"]["content"]) == good_gif[:-6]
    assert bytes(q["junk.dat"]["content"]) == b"JUNKJUNKJUNK"

    # replay: same failure classes out of the stored bytes
    replayed = {r["file_name"]: r for r in
                replay_quarantine(spark, sink).collect()}
    for name in q:
        assert replayed[name]["status"] == q[name]["status"], name
        assert replayed[name]["error"] == q[name]["error"], name

    # a "fixed" payload (re-fetched complete file) re-decodes ok
    assert decode_gif(good_gif).shape == (2, 2, 3)

    # ledger bounds: ok rows carry NULL payloads
    ledger = spark.read.parquet(sink)
    ok = ledger.where("status = 'ok'").collect()
    assert ok and all(r["payload"] is None and r["error"] is None
                      for r in ok)
