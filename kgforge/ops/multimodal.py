"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with sidecar metadata
(mime, width/height/duration). The decode/resize/frame-sample kernels
need codec libraries this container doesn't ship, so the CODEC step is
stubbed (``DecodeStub`` raises NotImplementedError unless the
deterministic fake is enabled) — but everything Ray-side is real and
tested: schema, actor-pool signature, batch sizing for large payloads,
output layout.

Scale notes: large binary rows need SMALL batch_size (payload ×
batch_size × concurrency must fit the worker heap) and
``batch_format="pyarrow"`` throughout (binary columns degrade to object
dtype under pandas).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ..sources.readers import read_table

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])

FEATURE_DIM = 16


def synth_media(sf_dir: str, limit: int | None = None) -> "ray.data.Dataset":
    """Deterministic fake media table derived from documents (payload =
    utf-8 text bytes posing as an opaque blob)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    if limit:
        ds = ds.limit(limit)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks()
        texts = batch["text"].to_pylist()
        n_chars = batch["n_chars"].to_pylist()
        return pa.table({
            "media_id": ids.cast(pa.int64()),
            "mime": pa.array(["image/x-fake"] * len(texts), type=pa.string()),
            "payload": pa.array([t.encode() for t in texts], type=pa.binary()),
            "width": pa.array([int(c) % 640 + 1 for c in n_chars],
                              type=pa.int32()),
            "height": pa.array([int(c) % 480 + 1 for c in n_chars],
                               type=pa.int32()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


class DecodeStub:
    """Actor-pool decode/feature-extract stage.

    With ``fake=True`` produces a deterministic FEATURE_DIM-float
    embedding from a sha256 of the payload (real plumbing, fake codec);
    with ``fake=False`` raises NotImplementedError — the marked slot
    where a real decoder (PIL/ffmpeg/torchvision) drops in, loaded once
    per actor right here in __init__.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "real image/audio codecs are not available in this "
                "environment; construct DecodeStub(fake=True) for the "
                "deterministic fake featurizer")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            d = hashlib.sha256(payload).digest()
            v = np.frombuffer(d[:FEATURE_DIM * 2], dtype=np.uint16)
            feats.append((v.astype(np.float32) / 65535.0).tolist())
        return pa.table({
            "media_id": batch["media_id"],
            "width": batch["width"],
            "height": batch["height"],
            "feature": pa.array(feats, type=pa.list_(pa.float32())),
        })


def media_features(sf_dir: str, concurrency: int = 2,
                   batch_size: int = 64) -> "ray.data.Dataset":
    """synth media -> actor-pool featurize. Small batch_size on purpose:
    sized for payload bytes, not row count."""
    media = synth_media(sf_dir)
    return media.map_batches(
        DecodeStub, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"fake": True},
        concurrency=concurrency, num_cpus=0.5)


def media_feature_stats(sf_dir: str) -> "ray.data.Dataset":
    """SQL-checkable rollup of the fake featurizer output: per media row,
    feature length + scaled first component (deterministic ints).
    Rounding is half-away-from-zero to match DuckDB's round(), so the
    independent SQL oracle below can reproduce the value exactly."""
    feats = media_features(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        lst = batch["feature"].combine_chunks()
        import pyarrow.compute as pc
        first = pc.list_element(lst, 0)
        return pa.table({
            "media_id": batch["media_id"].combine_chunks().cast(pa.int64()),
            "feat_len": pc.list_value_length(lst).cast(pa.int64()),
            "first_milli": pc.round(pc.multiply(first.cast(pa.float64()),
                                                pa.scalar(1000.0)),
                                    round_mode="half_towards_infinity")
                             .cast(pa.int64()),
        })

    return feats.map_batches(fn, batch_format="pyarrow")


# Independent SQL mirror of the fake featurizer: the feature's first
# component is the first little-endian uint16 of sha256(payload), where
# payload = utf-8 text bytes (synth_media). DuckDB's sha256(VARCHAR)
# hashes the same utf-8 bytes; the engine's float32 division
# (v.astype(float32) / 65535.0) is replicated with FLOAT casts, which
# DuckDB evaluates in single precision.
MEDIA_FEATURE_STATS_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST({FEATURE_DIM} AS BIGINT) AS feat_len,
       CAST(round(CAST(CAST(
            CAST('0x' || substr(sha256(text), 1, 2) AS INT)
            + 256 * CAST('0x' || substr(sha256(text), 3, 2) AS INT)
         AS FLOAT) / CAST(65535 AS FLOAT) AS FLOAT) * 1000.0)
        AS BIGINT) AS first_milli
FROM documents
"""
