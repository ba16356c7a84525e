"""Multimodal plumbing + controller-ops API tests."""

from __future__ import annotations

from datetime import datetime

import pytest


def _media(spark):
    rows = [
        (1, "image/png", b"fake-png-bytes-1", ("https://d/1.png", 64, 64, None)),
        (2, "image/png", b"fake-png-bytes-2", ("https://d/2.png", 32, 32, None)),
        (3, "video/mp4", b"fake-mp4", ("https://d/v.mp4", 640, 480, 5500)),
    ]
    from doc2vec_spark.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(spark):
    from doc2vec_spark.multimodal import FEATURE_DIM, extract_features

    media = _media(spark)
    a = {r["media_id"]: r for r in extract_features(media).collect()}
    b = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(a) == 3
    for mid in a:
        assert a[mid]["feature"] == b[mid]["feature"]
        assert len(a[mid]["feature"]) == FEATURE_DIM
        assert a[mid]["n_bytes"] > 0 and len(a[mid]["content_hash"]) == 64
    assert a[1]["feature"] != a[2]["feature"]


def test_decode_real_gate():
    """Without pillow the real-decode path raises NotImplementedError (honest
    stub); with pillow it decodes an actual PNG through the same function."""
    from doc2vec_spark.multimodal import decode_image_real

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_image_real(b"bytes")
        return

    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), color=(200, 40, 40)).save(buf, format="PNG")
    px = decode_image_real(buf.getvalue())
    assert px.shape == (8, 8)
    assert 0.0 <= float(px.min()) and float(px.max()) <= 1.0

    from doc2vec_spark.multimodal import FEATURE_DIM, real_image_feature

    feat = real_image_feature(buf.getvalue())
    assert len(feat) == FEATURE_DIM
    assert abs(sum(x * x for x in feat) - 1.0) < 1e-5  # L2-normalized


def test_frame_sample_plan(spark):
    from pyspark.sql import functions as F

    from doc2vec_spark.multimodal import frame_sample_plan

    media = _media(spark)
    frames = frame_sample_plan(media, every_ms=1000).filter(F.col("media_id") == 3)
    rows = frames.collect()
    assert len(rows) == 5  # 5500ms at 1fps
    assert [r["frame_ts_ms"] for r in rows] == [0, 1000, 2000, 3000, 4000]


def test_ops_api(spark):
    from doc2vec_spark import ops

    runs = spark.createDataFrame(
        [
            (1, 10, "completed", datetime(2024, 1, 1, 9), datetime(2024, 1, 1, 9, 1), datetime(2024, 1, 1, 9, 5), 0),
            (2, 10, "failed", datetime(2024, 1, 1, 10), datetime(2024, 1, 1, 10, 1), datetime(2024, 1, 1, 10, 2), 3),
            (3, 20, "completed", datetime(2024, 1, 2, 9), datetime(2024, 1, 2, 9, 1), datetime(2024, 1, 2, 9, 2), 0),
        ],
        "run_id long, config_id long, status string, queued_at timestamp, started_at timestamp, finished_at timestamp, error_count int",
    )
    logs = spark.createDataFrame(
        [(1, i, "info" if i % 3 else "error", f"msg {i} {'needle' if i == 5 else ''}") for i in range(10)],
        "run_id long, seq long, level string, message string",
    )

    last = {r["config_id"]: r["run_id"] for r in ops.last_run_per_config(runs).collect()}
    assert last == {10: 2, 20: 3}

    page = ops.page_runs(runs, before_id=3, limit=10).collect()
    assert [r["run_id"] for r in page] == [2, 1]

    found = ops.page_logs(logs, run_id=1, keyword="NEEDLE").collect()
    assert [r["seq"] for r in found] == [5]

    errs = ops.page_logs(logs, run_id=1, levels=["error"]).collect()
    assert all(r["level"] == "error" for r in errs) and errs

    assert ops.tail_start_seq(logs, run_id=1, n=3) == 7

    daily = ops.daily_run_stats(runs).collect()
    assert {(r["day"].day, r["status"]): r["n"] for r in daily} == {(1, "completed"): 1, (1, "failed"): 1, (2, "completed"): 1}


def test_mm_feature_search_is_deterministic_topk(spark):
    from doc2vec_spark.multimodal import mm_feature_search
    from tests.conftest import SF_DIR

    a = mm_feature_search(spark, SF_DIR).collect()
    b = mm_feature_search(spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 5
    assert all(a[i].cosine_sim >= a[i + 1].cosine_sim for i in range(len(a) - 1))
    assert all(r.media_id != 0 for r in a)  # probe item excluded
