"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference models files as `File` values + `file::*` bucket functions
(types/src/value/mod.rs File variant; core/src/buc/, core/src/fnc/file.rs).
For a 100 TB training-data pipeline the Spark-side contract is:

  * payload column: ``binary`` (or a file reference resolved at read time);
  * typed metadata struct: {media_type, width, height, duration_ms, ...};
  * decode / feature-extract / resize / frame-sample as Arrow-batched
    ``mapInPandas`` operators — the batch shape (iterator of pandas
    DataFrames) keeps peak memory to one batch per core, which is what
    makes 100 TB of media tractable.

The decode internals are STUBBED (no image/audio libs in this container):
``decode_fn=None`` uses a deterministic fake that derives pseudo-features
from the payload bytes, so the plumbing — schema, partition sizing, UDF
signature, batch iteration — is real and tested; swapping in Pillow/ffmpeg
later is a one-argument change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, duration_ms long, codec string"
)


def attach_media(
    df: DataFrame, payload_col: str, media_type: str, **meta: object
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct."""
    fields = [F.lit(media_type).alias("media_type")]
    for k in ("width", "height", "duration_ms", "codec"):
        v = meta.get(k)
        fields.append(
            F.lit(v).alias(k)
            if v is not None
            else F.lit(None).cast("int" if k in ("width", "height") else "string" if k == "codec" else "long").alias(k)
        )
    return df.withColumn("media_meta", F.struct(*fields))


def _fake_features(payload: bytes, n: int) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded pseudo-features."""
    if payload is None:
        return [0.0] * n
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 255.0 for i in range(n)]


def extract_features(
    df: DataFrame,
    payload_col: str,
    n_features: int = 8,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_hint: int | None = None,
) -> DataFrame:
    """Per-item feature extraction via mapInPandas (Arrow batches).

    ``decode_fn`` is the real decoder (bytes → feature list); None uses the
    deterministic fake.  Output schema = input columns + features array.
    """
    fn = decode_fn or (lambda b: _fake_features(b, n_features))
    out_schema = ", ".join(
        f"`{c}` {t}" for c, t in df.dtypes
    ) + ", features array<double>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [fn(b) for b in pdf[payload_col]]
            yield pdf

    return df.mapInPandas(op, out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize operator — STUB decode (no Pillow in this container).

    With ``resize_fn=None`` the payload passes through unchanged but the
    metadata is updated — exercising schema + batching; supply a real
    ``resize_fn(bytes, w, h) -> bytes`` to do actual work.
    """
    fn = resize_fn or (lambda b, w, h: b)
    out_schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [fn(b, width, height) for b in pdf[payload_col]]
            yield pdf

    out = df.mapInPandas(op, out_schema)
    if "media_meta" in df.columns:
        out = out.withColumn(
            "media_meta",
            F.col("media_meta").withField("width", F.lit(width)).withField(
                "height", F.lit(height)
            ),
        )
    return out


def sample_frames(
    df: DataFrame,
    payload_col: str,
    every_ms: int,
    extract_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (explode).

    STUB extractor fakes ``duration_ms // every_ms`` frames by slicing the
    payload; a real ``extract_fn(bytes, every_ms) -> list[bytes]`` plugs in
    ffmpeg-style decoding.  Output: original id columns + frame_idx + frame.
    """
    fn = extract_fn or (
        lambda b, ms: [b[i : i + 16] for i in range(0, min(len(b or b""), 64), 16)]
    )
    id_cols = [c for c, _ in df.dtypes if c != payload_col and c != "media_meta"]
    out_schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c in id_cols)
    out_schema += ", frame_idx int, frame binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # itertuples, not iterrows: no per-row Series construction
            # (guide §4.2 — keep the Python inner loop lean)
            rows = []
            payloads = pdf[payload_col].to_numpy()
            ids = {c: pdf[c].to_numpy() for c in id_cols}
            for j in range(len(pdf)):
                for i, frame in enumerate(fn(payloads[j], every_ms)):
                    row = {c: ids[c][j] for c in id_cols}
                    row["frame_idx"] = i
                    row["frame"] = frame
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[*id_cols, "frame_idx", "frame"])

    return df.mapInPandas(op, out_schema)
