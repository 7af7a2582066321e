"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The reference touches multimodality only through base64-encoded PDF page
images spliced into prompts (``apps/poc-instruction-gen/
run_example2template.py:77-149``). A 100 TB training-data pipeline needs the
general form: media as ``binary`` columns with a typed metadata struct,
flowing through dedup/sampling/joins like any column, with decode /
feature-extract / resize / frame-sample as Arrow-batched pandas functions
over ``mapInPandas``.

Codec libraries are OPTIONAL: real PIL / pypdfium2 implementations
(:func:`pil_decode`, :func:`pil_resize`, :func:`pdfium_render`) are used as
operator defaults when the libraries import, with automatic fallback to the
deterministic stubs otherwise (this environment has neither, so the stubs
run here; the codec tests in ``tests/test_multimodal.py`` skip without the
libs and exercise the real path when present). The decode step also stays
pluggable per-call: pass ``decode_fn``/``resize_fn``/``pdf_fn`` to any
operator. :func:`fake_decode` derives pixel/sample statistics from the bytes
themselves, keeping the Spark-side plumbing (schema, batching, partitioning,
UDF signatures) real and fully tested either way — swapping codecs touches
no plan shape.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional image codec — absent in this environment
    from PIL import Image as _PILImage
except Exception:  # pragma: no cover - import guard
    _PILImage = None

try:  # optional PDF renderer — absent in this environment
    import pypdfium2 as _pdfium
except Exception:  # pragma: no cover - import guard
    _pdfium = None


def have_pil() -> bool:
    """True when Pillow imported — the real image decode/resize default."""
    return _PILImage is not None


def have_pdfium() -> bool:
    """True when pypdfium2 imported — the real PDF page renderer default."""
    return _pdfium is not None

#: Typed metadata carried beside every media binary column.
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 8

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _codec_name(fn, known: dict) -> str:
    """Stable name for the codec that actually ran, stamped into the output
    so downstream consumers can never silently train on hash-derived
    pseudo-features from a fallback decoder."""
    name = getattr(fn, "__name__", None) or "custom"
    return known.get(name, name)


def media_struct(
    media_type: str, fmt: str, width=None, height=None, n_frames=None, sample_rate=None, duration_ms=None
) -> Column:
    """Build a MEDIA_META_TYPE struct column from literals/columns."""
    def lit_or_col(v, cast: str):
        c = v if isinstance(v, Column) else F.lit(v)
        return c.cast(cast)

    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        lit_or_col(width, "int").alias("width"),
        lit_or_col(height, "int").alias("height"),
        lit_or_col(n_frames, "int").alias("n_frames"),
        lit_or_col(sample_rate, "int").alias("sample_rate"),
        lit_or_col(duration_ms, "long").alias("duration_ms"),
    )


def fake_decode(data: bytes) -> dict:
    """Deterministic stand-in for a codec: statistics derived from the raw
    bytes. REAL DECODE IS STUBBED — replace with PIL/ffmpeg in production
    (`decode_fn` argument of the operators below)."""
    digest = hashlib.sha256(data).hexdigest()
    features = [
        int(digest[i * 8 : (i + 1) * 8], 16) / 0xFFFFFFFF for i in range(FEATURE_DIM)
    ]
    return {"content_hash": digest, "n_bytes": len(data), "features": features}


def pil_decode(data: bytes) -> dict:
    """Real image decode (requires Pillow): content hash plus pixel
    statistics — per-channel RGB mean and std, and normalized dimensions —
    as the FEATURE_DIM feature vector. Same output contract as
    :func:`fake_decode`, so the two are drop-in interchangeable."""
    if _PILImage is None:
        raise NotImplementedError("Pillow is not installed; use fake_decode or pass decode_fn")
    import numpy as np

    img = _PILImage.open(io.BytesIO(data)).convert("RGB")
    arr = np.asarray(img, dtype=np.float64) / 255.0
    w, h = img.size
    features = (
        arr.mean(axis=(0, 1)).tolist()
        + arr.std(axis=(0, 1)).tolist()
        + [min(w / 4096.0, 1.0), min(h / 4096.0, 1.0)]
    )[:FEATURE_DIM]
    return {
        "content_hash": hashlib.sha256(data).hexdigest(),
        "n_bytes": len(data),
        "features": features,
    }


def pil_resize(data: bytes, w: int, h: int) -> bytes:
    """Real image resize (requires Pillow): decode, resample to (w, h),
    re-encode in the source format (PNG when the format is unknown)."""
    if _PILImage is None:
        raise NotImplementedError("Pillow is not installed; pass resize_fn")
    img = _PILImage.open(io.BytesIO(data))
    fmt = img.format or "PNG"
    out = io.BytesIO()
    img.resize((w, h)).save(out, format=fmt)
    return out.getvalue()


def pdfium_render(data: bytes, dpi: int = 600) -> list:
    """Real PDF -> page PNG bytes (requires pypdfium2); mirrors the
    reference's 600-dpi page rendering
    (``apps/poc-instruction-gen/run_example2template.py:77-149``)."""
    if _pdfium is None:
        raise NotImplementedError("pypdfium2 is not installed; pass pdf_fn")
    doc = _pdfium.PdfDocument(data)
    pages = []
    try:
        for page in doc:
            buf = io.BytesIO()
            page.render(scale=dpi / 72.0).to_pil().save(buf, format="PNG")
            pages.append(buf.getvalue())
    finally:
        doc.close()
    return pages


def extract_features(
    df: DataFrame, binary_col: str = "content", decode_fn=None
) -> DataFrame:
    """Decode + feature-extract each media binary via Arrow-batched
    ``mapInPandas``. Output adds (content_hash, n_bytes, features[FEATURE_DIM])
    plus a ``decoder`` column naming the codec that ran (``pil`` for the real
    Pillow path, ``fake`` for the deterministic byte-statistics fallback, the
    function name for a custom ``decode_fn``) — downstream filters/asserts on
    this instead of discovering pseudo-features at training time.

    ``decode_fn`` defaults to :func:`pil_decode` when Pillow is installed
    and the deterministic :func:`fake_decode` otherwise; callers that need
    reproducible features across environments should pass one explicitly.

    Plan shape at scale: narrow map over repartitioned binaries — no shuffle;
    batch size is the Arrow batch, so decoder memory is bounded regardless of
    partition size.
    """
    from instructionspipe_spark.session import ensure_parallelism

    if decode_fn is None:
        decode_fn = pil_decode if have_pil() else fake_decode
    df = ensure_parallelism(df)
    out_schema = T.StructType(df.schema.fields + list(_FEATURE_SCHEMA.fields))

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            decoded = [
                decode_fn(bytes(b)) if b is not None else
                {"content_hash": None, "n_bytes": 0, "features": None}
                for b in pdf[binary_col]
            ]
            pdf = pdf.copy()
            pdf["content_hash"] = [d["content_hash"] for d in decoded]
            pdf["n_bytes"] = [d["n_bytes"] for d in decoded]
            pdf["features"] = [d["features"] for d in decoded]
            yield pdf

    decoder = _codec_name(decode_fn, {"pil_decode": "pil", "fake_decode": "fake"})
    return df.mapInPandas(kernel, schema=out_schema).withColumn("decoder", F.lit(decoder))


def resize_images(
    df: DataFrame,
    binary_col: str = "content",
    meta_col: str = "meta",
    target_width: int = 224,
    target_height: int = 224,
    resize_fn=None,
) -> DataFrame:
    """Resize plumbing: rewrites the binary + updates metadata dims.

    ``resize_fn(data: bytes, w: int, h: int) -> bytes`` is the pluggable
    codec; the default is :func:`pil_resize` when Pillow is installed, else
    a stub raising ``NotImplementedError`` at *runtime* only if a non-null
    binary is actually processed — the plan itself (schema, metadata
    rewrite) is real either way. Pass ``resize_fn=passthrough_resize`` for
    tests.
    """
    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)

    if resize_fn is None:
        if have_pil():
            resize_fn = pil_resize
        else:
            def resize_fn(data: bytes, w: int, h: int) -> bytes:  # noqa: ARG001
                raise NotImplementedError(
                    "image codec not available in this environment; pass resize_fn"
                )

    schema = df.schema

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[binary_col] = [
                resize_fn(bytes(b), target_width, target_height) if b is not None else None
                for b in pdf[binary_col]
            ]
            metas = []
            for m in pdf[meta_col]:
                if m is None:
                    metas.append(None)
                    continue
                m = dict(m)
                m["width"], m["height"] = target_width, target_height
                metas.append(m)
            pdf[meta_col] = metas
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def passthrough_resize(data: bytes, w: int, h: int) -> bytes:  # noqa: ARG001
    """Test stub: returns the bytes unchanged (metadata still updates)."""
    return data


def sample_frames(
    df: DataFrame,
    binary_col: str = "content",
    meta_col: str = "meta",
    every_nth: int = 10,
    frame_fn=None,
) -> DataFrame:
    """Frame-sampling plumbing for video columns: explode each video row
    into one row per sampled frame index. ``frame_fn(data, idx) -> bytes``
    extracts a frame (stubbed like resize). The explode happens BEFORE
    decoding, so frame extraction parallelizes across the cluster rather
    than per-video."""
    frame_idx = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.coalesce(F.col(meta_col)["n_frames"], F.lit(1)) - 1, F.lit(0)),
            F.lit(every_nth),
        )
    ).alias("frame_index")
    exploded = df.select("*", frame_idx)
    if frame_fn is None:
        return exploded  # plumbing-only: downstream decode owns extraction
    from instructionspipe_spark.session import ensure_parallelism

    exploded = ensure_parallelism(exploded)
    schema = exploded.schema

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[binary_col] = [
                frame_fn(bytes(b), int(i)) if b is not None else None
                for b, i in zip(pdf[binary_col], pdf["frame_index"])
            ]
            yield pdf

    return exploded.mapInPandas(kernel, schema=schema)


def media_dedup(df: DataFrame, binary_col: str = "content", id_col: str = "media_id") -> DataFrame:
    """Exact media dedup by content hash — pure expression (sha2 over the
    binary), min-id survivor; composes with the whole dedup family."""
    from instructionspipe_spark.operators.dedup import exact_dedup

    with_hash = df.withColumn("__h", F.sha2(F.col(binary_col), 256))
    return exact_dedup(with_hash, ["__h"], [id_col]).drop("__h")


def pdf_to_page_images(
    df: DataFrame,
    binary_col: str = "content",
    dpi: int = 600,
    pdf_fn=None,
) -> DataFrame:
    """PDF -> per-page image rows (reference S6/F18:
    ``apps/poc-instruction-gen/run_example2template.py:77-149`` renders PDF
    pages at 600 dpi and base64-encodes them for multimodal prompts).

    ``pdf_fn(data: bytes, dpi: int) -> list[bytes]`` is the pluggable
    renderer; the default is :func:`pdfium_render` when pypdfium2 is
    installed, else a stub that raises at runtime. Output: one row per page
    with ``page_index``, the page image bytes in ``binary_col``, and a
    ``decoder`` column naming the renderer that ran (``pdfium`` / the
    function name for a custom ``pdf_fn``)."""
    from pyspark.sql import types as T

    from instructionspipe_spark.session import ensure_parallelism

    if pdf_fn is None:
        if have_pdfium():
            pdf_fn = pdfium_render
        else:
            def pdf_fn(data: bytes, dpi: int) -> list:  # noqa: ARG001
                raise NotImplementedError(
                    "pdf renderer not available in this environment; pass pdf_fn"
                )

    df = ensure_parallelism(df)
    fields = [f for f in df.schema.fields if f.name != binary_col]
    out_schema = T.StructType(
        fields
        + [
            T.StructField("page_index", T.IntegerType()),
            T.StructField(binary_col, T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf_batch in batches:
            rows = []
            for _, row in pdf_batch.iterrows():
                data = row[binary_col]
                pages = pdf_fn(bytes(data), dpi) if data is not None else []
                base = {f.name: row[f.name] for f in fields}
                for i, page in enumerate(pages):
                    rows.append({**base, "page_index": i, binary_col: page})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    decoder = _codec_name(pdf_fn, {"pdfium_render": "pdfium", "pdf_fn": "unavailable"})
    return df.mapInPandas(kernel, schema=out_schema).withColumn("decoder", F.lit(decoder))
