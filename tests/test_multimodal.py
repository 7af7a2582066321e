"""Multimodal column plumbing tests — binary media + typed metadata through
mapInPandas kernels (decode stubbed deterministically; see
operators/multimodal.py docstring)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from instructionspipe_spark.operators import multimodal as mm


def _media_df(spark):
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", mm.MEDIA_META_TYPE),
        ]
    )
    rows = [
        (1, b"image-bytes-aaaa", ("image", "png", 640, 480, 1, None, None)),
        (2, b"image-bytes-aaaa", ("image", "png", 640, 480, 1, None, None)),  # exact dup
        (3, b"video-bytes-bbbb", ("video", "mp4", 1280, 720, 30, None, 1000)),
        (4, None, None),
    ]
    return spark.createDataFrame(rows, schema)


def test_extract_features_deterministic(spark):
    df = _media_df(spark)
    out = {r["media_id"]: r for r in mm.extract_features(df).collect()}
    expected = hashlib.sha256(b"image-bytes-aaaa").hexdigest()
    assert out[1]["content_hash"] == expected == out[2]["content_hash"]
    assert out[1]["n_bytes"] == 16
    assert len(out[1]["features"]) == mm.FEATURE_DIM
    assert all(0.0 <= f <= 1.0 for f in out[1]["features"])
    assert out[4]["content_hash"] is None and out[4]["features"] is None
    # the codec that ran is stamped in the output: without Pillow the
    # fallback must NAME itself so downstream can't silently train on
    # hash-derived pseudo-features
    expected_decoder = "pil" if mm.have_pil() else "fake"
    assert all(r["decoder"] == expected_decoder for r in out.values())
    # explicit decode_fn: the custom name is stamped
    custom = mm.extract_features(df, decode_fn=mm.fake_decode).first()
    assert custom["decoder"] == "fake"


def test_resize_updates_meta_and_requires_codec(spark):
    df = _media_df(spark).filter(F.col("media_id") == 1)
    out = mm.resize_images(df, target_width=224, target_height=224, resize_fn=mm.passthrough_resize).first()
    assert out["meta"]["width"] == 224 and out["meta"]["height"] == 224
    assert bytes(out["content"]) == b"image-bytes-aaaa"
    # without a codec, touching real bytes raises (the stub contract)
    with pytest.raises(Exception, match="codec not available"):
        mm.resize_images(df).collect()


def test_sample_frames_explodes_by_meta(spark):
    df = _media_df(spark).filter(F.col("media_id") == 3)
    out = mm.sample_frames(df, every_nth=10).select("media_id", "frame_index").collect()
    assert sorted(r["frame_index"] for r in out) == [0, 10, 20]


def test_media_dedup(spark):
    df = _media_df(spark).filter(F.col("content").isNotNull())
    kept = sorted(r["media_id"] for r in mm.media_dedup(df).collect())
    assert kept == [1, 3]  # id 2 is a byte-identical dup of 1


def test_pdf_to_page_images_plumbing(spark):
    """S6/F18 plumbing with an injected fake renderer: one row per page,
    metadata carried, binary rewritten."""
    df = spark.createDataFrame([(1, b"%PDF-fake"), (2, None)], "pdf_id int, content binary")

    def fake_pdf(data: bytes, dpi: int):
        assert dpi == 600
        return [data + b"-page0", data + b"-page1"]

    out = mm.pdf_to_page_images(df, pdf_fn=fake_pdf)
    collected = out.collect()
    rows = [(r["pdf_id"], r["page_index"], bytes(r["content"])) for r in collected]
    assert sorted(rows) == [
        (1, 0, b"%PDF-fake-page0"),
        (1, 1, b"%PDF-fake-page1"),
    ]  # null-content pdf yields no pages
    assert all(r["decoder"] == "fake_pdf" for r in collected)


def test_pdf_requires_codec(spark):
    df = spark.createDataFrame([(1, b"%PDF-fake")], "pdf_id int, content binary")
    with pytest.raises(Exception, match="renderer not available"):
        mm.pdf_to_page_images(df).collect()


# ---------------------------------------------------------------------------
# Real-codec paths: exercised when the optional libs import, skipped here
# ---------------------------------------------------------------------------


@pytest.mark.skipif(
    not mm.have_pil(),
    reason="Pillow not installed (package installs are disallowed in this "
    "environment, so the real-codec path cannot be exercised here; it runs "
    "wherever Pillow is present)",
)
def test_pil_decode_and_resize_real(spark):
    """With Pillow present, extract_features defaults to pil_decode (pixel
    statistics) and resize_images defaults to pil_resize."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), color=(255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(1, png)], "media_id int, content binary"
    ).withColumn("meta", mm.media_struct("image", "png", width=32, height=16))
    feats = mm.extract_features(df).first()
    assert feats["n_bytes"] == len(png)
    # solid red: mean R ~1.0, G/B ~0.0; stds ~0
    f = feats["features"]
    assert abs(f[0] - 1.0) < 1e-6 and abs(f[1]) < 1e-6 and abs(f[2]) < 1e-6
    resized = mm.resize_images(df, target_width=8, target_height=8).first()
    img = Image.open(io.BytesIO(bytes(resized["content"])))
    assert img.size == (8, 8)
    assert resized["meta"]["width"] == 8 and resized["meta"]["height"] == 8


@pytest.mark.skipif(
    not mm.have_pdfium(),
    reason="pypdfium2 not installed (package installs are disallowed in this "
    "environment; the real renderer runs wherever pypdfium2 is present)",
)
def test_pdfium_render_real(spark):
    """With pypdfium2 present, pdf_to_page_images renders real pages."""
    import pypdfium2 as pdfium

    doc = pdfium.PdfDocument.new()
    doc.new_page(200, 100)
    import io

    buf = io.BytesIO()
    doc.save(buf)
    df = spark.createDataFrame([(1, buf.getvalue())], "pdf_id int, content binary")
    rows = mm.pdf_to_page_images(df, dpi=72).collect()
    assert len(rows) == 1 and rows[0]["page_index"] == 0
    assert bytes(rows[0]["content"]).startswith(b"\x89PNG")


def test_codec_stubs_raise_without_libs():
    """Direct calls to the real-codec helpers fail loudly when libs are
    absent (instead of silently faking)."""
    if not mm.have_pil():
        with pytest.raises(NotImplementedError, match="Pillow"):
            mm.pil_decode(b"x")
        with pytest.raises(NotImplementedError, match="Pillow"):
            mm.pil_resize(b"x", 2, 2)
    if not mm.have_pdfium():
        with pytest.raises(NotImplementedError, match="pypdfium2"):
            mm.pdfium_render(b"x")
