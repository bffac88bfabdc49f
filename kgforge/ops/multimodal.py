"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with sidecar metadata
(mime, width/height/duration). Each codec stage is an actor-pool
``map_batches`` class that loads its decoder ONCE per actor in
``__init__``:

- **Image / video** (``DecodeStub`` / ``ResizeStub`` / ``FrameSample``
  with ``fake=False``): real adapters over pillow / pyav, loaded via
  :func:`load_image_codec` / :func:`load_video_codec` when the library
  is importable; ``NotImplementedError`` with a clear message when it
  isn't (this container ships neither — the real paths are covered by
  skip-if-unavailable tests). ``fake=True`` keeps the deterministic
  sha256/byte-chunk kernels the driver gates hash-check.
- **Audio** (``AudioDecode``): a REAL codec path with no optional
  dependency — stdlib ``wave`` RIFF encode/decode — gated end-to-end
  against a DuckDB mirror (``media_audio_stats``).

Scale notes: large binary rows need SMALL batch_size (payload ×
batch_size × concurrency must fit the worker heap) and
``batch_format="pyarrow"`` throughout (binary columns degrade to object
dtype under pandas).
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa

import ray.data

from ..sources.readers import read_table


def load_image_codec():
    """Pillow-backed image codec, or None when PIL is unavailable.
    Called once per actor (``__init__``), never per batch."""
    try:
        from PIL import Image
    except ImportError:
        return None

    class _PilCodec:
        name = "pillow"

        def decode(self, payload: bytes):
            return Image.open(io.BytesIO(payload)).convert("RGB")

        def features(self, payload: bytes) -> list[float]:
            # deterministic FEATURE_DIM-dim embedding: 4×4 grayscale
            # thumbnail, row-major, scaled to [0, 1]
            img = self.decode(payload).convert("L").resize(
                (4, 4), resample=Image.BILINEAR)
            v = np.asarray(img, dtype=np.float32).reshape(-1)
            return (v / 255.0).tolist()

        def resize(self, payload: bytes, w: int, h: int) -> bytes:
            img = self.decode(payload).resize((w, h),
                                              resample=Image.BILINEAR)
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()

    return _PilCodec()


def load_video_codec():
    """pyav-backed video demuxer, or None when av is unavailable."""
    try:
        import av
    except ImportError:
        return None

    class _AvCodec:
        name = "pyav"

        def iter_frames(self, payload: bytes, sample_every: int):
            """Yield (frame_idx, ts_ms, rgb24_bytes) for every Nth
            frame of the container's first video stream."""
            with av.open(io.BytesIO(payload)) as container:
                stream = container.streams.video[0]
                tb = float(stream.time_base) if stream.time_base else 0.0
                for i, frame in enumerate(container.decode(stream)):
                    if i % sample_every:
                        continue
                    ts = (int(frame.pts * tb * 1000)
                          if frame.pts is not None and tb else i * 40)
                    yield i, ts, frame.to_ndarray(format="rgb24").tobytes()

    return _AvCodec()

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
    embedding from a sha256 of the payload (real plumbing, fake codec
    — what the driver gates hash-check); with ``fake=False`` loads the
    pillow adapter ONCE per actor here in ``__init__`` and decodes
    real images into 4×4-grayscale-thumbnail features, raising
    NotImplementedError only when pillow is not importable.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake
        self.codec = None
        if not fake:
            self.codec = load_image_codec()
            if self.codec is None:
                raise NotImplementedError(
                    "DecodeStub(fake=False) needs pillow, which is not "
                    "importable here; construct DecodeStub(fake=True) "
                    "for the deterministic fake featurizer")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            if self.fake:
                d = hashlib.sha256(payload).digest()
                v = np.frombuffer(d[:FEATURE_DIM * 2], dtype=np.uint16)
                feats.append((v.astype(np.float32) / 65535.0).tolist())
            else:
                feats.append(self.codec.features(payload))
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
    needs). ``fake=True`` chunks the payload into fixed FRAME_BYTES
    'frames' deterministically (the gate-checked kernel);
    ``fake=False`` loads the pyav demuxer once per actor in
    ``__init__`` and decodes real containers. Every Nth
    frame is kept (``sample_every``); output rows carry the frame
    payload plus (media_id, frame_idx, ts_ms) metadata, so downstream
    featurizers batch by PAYLOAD size, not row count."""

    def __init__(self, fake: bool = True, frame_bytes: int = FRAME_BYTES,
                 sample_every: int = SAMPLE_EVERY, fps: int = 25):
        self.fake = fake
        self.codec = None
        if not fake:
            self.codec = load_video_codec()
            if self.codec is None:
                raise NotImplementedError(
                    "FrameSample(fake=False) needs pyav, which is not "
                    "importable here; construct FrameSample(fake=True) "
                    "for the deterministic fake frame splitter")
        self.frame_bytes = frame_bytes
        self.sample_every = sample_every
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames, ts = [], [], [], []
        fb, se = self.frame_bytes, self.sample_every
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            if not self.fake:
                for i, t_ms, frame in self.codec.iter_frames(payload, se):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(frame)
                    ts.append(t_ms)
                continue
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
        self.fake = fake
        self.codec = None
        if not fake:
            self.codec = load_image_codec()
            if self.codec is None:
                raise NotImplementedError(
                    "ResizeStub(fake=False) needs pillow, which is not "
                    "importable here; use fake=True")
        self.w, self.h = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        size = self.w * self.h
        out = []
        mimes = batch["mime"]
        for payload in batch["payload"].to_pylist():
            if not self.fake:
                out.append(self.codec.resize(payload, self.w, self.h))
            elif not payload:
                out.append(b"\x00" * size)
            elif len(payload) >= size:
                out.append(payload[:size])
            else:
                reps = -(-size // len(payload))
                out.append((payload * reps)[:size])
        if not self.fake:
            mimes = pa.array(["image/png"] * len(out), type=pa.string())
        return pa.table({
            "media_id": batch["media_id"],
            "mime": mimes,
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


# ------------------------------------------------------- audio (REAL)
AUDIO_SR = 8000


def synth_audio(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic WAV table: each document's text becomes a REAL
    RIFF/WAVE payload (PCM s16le mono @ AUDIO_SR) whose samples are
    ``(byte - 128) * 256`` per character — encoded with the stdlib
    ``wave`` writer, so downstream stages exercise a genuine container
    format, not a by-convention blob."""
    import wave

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch["text"].to_pylist():
            samples = (np.frombuffer(t.encode(), dtype=np.uint8)
                       .astype(np.int16) - 128) * 256
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(AUDIO_SR)
                w.writeframes(samples.tobytes())
            payloads.append(buf.getvalue())
        return pa.table({
            "media_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "mime": pa.array(["audio/wav"] * batch.num_rows,
                             type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


class AudioDecode:
    """Actor-pool audio decode — a REAL codec path with no optional
    dependency: stdlib ``wave`` parses the RIFF container, numpy views
    the PCM frames. Emits integer-exact per-clip stats (sample rate,
    sample count, duration, int64 sum of squared samples), so the
    DuckDB oracle can mirror them without float-rounding hazards."""

    def __init__(self):
        import wave
        self._wave = wave      # loaded once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        srs, counts, durs, sumsqs = [], [], [], []
        for payload in batch["payload"].to_pylist():
            with self._wave.open(io.BytesIO(payload), "rb") as w:
                sr = w.getframerate()
                n = w.getnframes()
                raw = w.readframes(n)
            s = np.frombuffer(raw, dtype=np.int16).astype(np.int64)
            srs.append(sr)
            counts.append(n)
            durs.append(n * 1000 // sr)
            sumsqs.append(int((s * s).sum()))
        return pa.table({
            "media_id": batch["media_id"].combine_chunks().cast(pa.int64()),
            "sr": pa.array(srs, type=pa.int64()),
            "n_samples": pa.array(counts, type=pa.int64()),
            "duration_ms": pa.array(durs, type=pa.int64()),
            "sumsq": pa.array(sumsqs, type=pa.int64()),
        })


def media_audio_stats(sf_dir: str, concurrency: int = 2,
                      batch_size: int = 64) -> "ray.data.Dataset":
    """wave-encode -> actor-pool wave-decode -> integer stats. The
    whole round trip runs the real codec; the driver gate hash-checks
    it against MEDIA_AUDIO_STATS_SQL."""
    return synth_audio(sf_dir).map_batches(
        AudioDecode, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5)


# SQL mirror: samples are (ascii(ch) - 128) * 256 over the pure-ASCII
# corpus, so sumsq = 65536 * sum((ascii - 128)^2) per document —
# integer-exact, no float rounding anywhere
MEDIA_AUDIO_STATS_SQL = f"""
WITH sq AS (
  SELECT doc_id,
         sum((ascii(substr(text, i, 1)) - 128)
             * (ascii(substr(text, i, 1)) - 128)) AS s
  FROM (SELECT doc_id, text,
               unnest(range(1, length(text) + 1)) AS i
        FROM documents)
  GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS media_id,
       CAST({AUDIO_SR} AS BIGINT) AS sr,
       CAST(length(d.text) AS BIGINT) AS n_samples,
       CAST(length(d.text) * 1000 // {AUDIO_SR} AS BIGINT) AS duration_ms,
       CAST(65536 * coalesce(sq.s, 0) AS BIGINT) AS sumsq
FROM documents d LEFT JOIN sq ON d.doc_id = sq.doc_id
"""


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
