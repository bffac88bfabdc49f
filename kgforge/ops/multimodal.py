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


# ----------------------------------------------- frame-sample / resize
FRAME_BYTES = 256
SAMPLE_EVERY = 4


class FrameSample:
    """Actor-pool frame-sampling stage: one 'video' payload row ->
    MANY per-frame rows (the flat-map shape every video pipeline
    needs). The codec slot is the same honest stub as DecodeStub
    (``fake=True`` chunks the payload into fixed FRAME_BYTES 'frames'
    deterministically; ``fake=False`` marks where a real demuxer —
    ffmpeg/pyav, loaded once per actor HERE — drops in). Every Nth
    frame is kept (``sample_every``); output rows carry the frame
    payload plus (media_id, frame_idx, ts_ms) metadata, so downstream
    featurizers batch by PAYLOAD size, not row count."""

    def __init__(self, fake: bool = True, frame_bytes: int = FRAME_BYTES,
                 sample_every: int = SAMPLE_EVERY, fps: int = 25):
        if not fake:
            raise NotImplementedError(
                "real video demuxers are not available in this "
                "environment; construct FrameSample(fake=True) for the "
                "deterministic fake frame splitter")
        self.frame_bytes = frame_bytes
        self.sample_every = sample_every
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames, ts = [], [], [], []
        fb, se = self.frame_bytes, self.sample_every
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            n = max(1, -(-len(payload) // fb))      # ceil; empty -> 1
            for i in range(0, n, se):
                ids.append(mid)
                idxs.append(i)
                frames.append(payload[i * fb:(i + 1) * fb])
                ts.append(i * 1000 // self.fps)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(idxs, type=pa.int64()),
            "frame": pa.array(frames, type=pa.binary()),
            "ts_ms": pa.array(ts, type=pa.int64()),
        })


class ResizeStub:
    """Per-batch resize plumbing: (payload, width, height) -> payload'
    with target dims. Fake kernel = deterministic byte resampling to
    target_w × target_h bytes (truncate / cyclic-pad); the real one
    (PIL.Image.resize, loaded per actor) drops into the marked slot."""

    def __init__(self, target_w: int = 64, target_h: int = 64,
                 fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real image codecs are not available here; use fake=True")
        self.w, self.h = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        size = self.w * self.h
        out = []
        for payload in batch["payload"].to_pylist():
            if not payload:
                out.append(b"\x00" * size)
            elif len(payload) >= size:
                out.append(payload[:size])
            else:
                reps = -(-size // len(payload))
                out.append((payload * reps)[:size])
        return pa.table({
            "media_id": batch["media_id"],
            "mime": batch["mime"],
            "payload": pa.array(out, type=pa.binary()),
            "width": pa.array(np.full(len(out), self.w, np.int32)),
            "height": pa.array(np.full(len(out), self.h, np.int32)),
        })


def frame_sample_stats(sf_dir: str, concurrency: int = 2,
                       batch_size: int = 64) -> "ray.data.Dataset":
    """Gate rollup of the frame-sample flat-map: per media,
    (media_id, n_frames_sampled, bytes_sampled, first_frame_sha8) —
    aggregated back from the per-frame rows with a per-batch Arrow
    combiner (frames of one media never split across batches because
    FrameSample emits them together and the rollup runs INSIDE the
    same fused chain)."""
    import pyarrow.compute as pc

    media = synth_media(sf_dir)
    sampler = FrameSample(fake=True)

    def rollup(batch: pa.Table) -> pa.Table:
        f = sampler(batch)
        ids = f["media_id"].to_numpy(zero_copy_only=False)
        lens = pc.binary_length(f["frame"]).to_numpy(zero_copy_only=False)
        uniq, starts = np.unique(ids, return_index=True)
        order = np.argsort(starts)
        uniq, starts = uniq[order], starts[order]
        ends = np.append(starts[1:], len(ids))
        firsts = []
        frames = f["frame"].to_pylist()
        for s in starts:
            firsts.append(hashlib.sha256(frames[s]).hexdigest()[:8])
        return pa.table({
            "media_id": pa.array(uniq, type=pa.int64()),
            "n_frames_sampled": pa.array(ends - starts, type=pa.int64()),
            "bytes_sampled": pa.array(
                np.add.reduceat(lens, starts), type=pa.int64()),
            "first_frame_sha8": pa.array(firsts, type=pa.string()),
        })

    return media.map_batches(rollup, batch_format="pyarrow",
                             batch_size=batch_size)


# SQL mirror: payloads are the utf-8 text bytes and the corpus is pure
# ASCII (chars == bytes), so frame arithmetic and the first-frame hash
# are scalar expressions over text
FRAME_SAMPLE_STATS_SQL = f"""
WITH n AS (
  SELECT doc_id, length(text) AS len, text,
         CAST(greatest(ceil(length(text) / {FRAME_BYTES}.0), 1) AS BIGINT)
             AS n_frames
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST((n_frames - 1) // {SAMPLE_EVERY} + 1 AS BIGINT)
           AS n_frames_sampled,
       -- every sampled frame is full except (possibly) the payload's
       -- tail frame, which is sampled iff its index is a multiple of
       -- SAMPLE_EVERY
       CAST({FRAME_BYTES} * ((n_frames - 1) // {SAMPLE_EVERY} + 1)
            - CASE WHEN (n_frames - 1) % {SAMPLE_EVERY} = 0
                   THEN {FRAME_BYTES} * n_frames - len ELSE 0 END
            AS BIGINT) AS bytes_sampled,
       substr(sha256(substr(text, 1, {FRAME_BYTES})), 1, 8)
           AS first_frame_sha8
FROM n
"""
