"""Real-codec adapters behind the multimodal stages (VERDICT r3
item 4): the audio path (stdlib wave) runs everywhere; the pillow /
pyav paths run where those libraries exist and skip otherwise —
with a guard that the fake paths stay byte-stable either way."""

import io

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_audio_real_codec_round_trip(ray_session):
    """wave-encode -> Ray actor-pool wave-decode: a REAL container
    format round trip with integer-exact stats."""
    import wave

    from kgforge.ops.multimodal import AUDIO_SR, media_audio_stats, \
        synth_audio
    # the synthesized payloads are genuine RIFF/WAVE files
    first = synth_audio(SF).take(1)[0]
    assert first["payload"][:4] == b"RIFF"
    with wave.open(io.BytesIO(first["payload"]), "rb") as w:
        assert w.getframerate() == AUDIO_SR
        assert w.getsampwidth() == 2 and w.getnchannels() == 1

    out = media_audio_stats(SF).to_pandas()
    assert len(out) == 500
    assert (out["sr"] == AUDIO_SR).all()
    assert (out["duration_ms"] == out["n_samples"] * 1000 // AUDIO_SR).all()
    # a hand-checked row: stats must equal a direct numpy computation
    row = out[out.media_id == first["media_id"]].iloc[0]
    with wave.open(io.BytesIO(first["payload"]), "rb") as w:
        s = np.frombuffer(w.readframes(w.getnframes()),
                          dtype=np.int16).astype(np.int64)
    assert row["n_samples"] == len(s)
    assert row["sumsq"] == int((s * s).sum())


def test_decode_stub_real_requires_codec():
    """fake=False raises a clear NotImplementedError exactly when the
    codec library is missing — never silently falls back to the fake."""
    from kgforge.ops.multimodal import (DecodeStub, FrameSample,
                                        ResizeStub, load_image_codec,
                                        load_video_codec)
    if load_image_codec() is None:
        with pytest.raises(NotImplementedError, match="pillow"):
            DecodeStub(fake=False)
        with pytest.raises(NotImplementedError, match="pillow"):
            ResizeStub(fake=False)
    else:
        assert DecodeStub(fake=False).codec is not None
    if load_video_codec() is None:
        with pytest.raises(NotImplementedError, match="pyav"):
            FrameSample(fake=False)
    else:
        assert FrameSample(fake=False).codec is not None


def _png_payload(w, h, seed):
    from PIL import Image
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3),
                                       dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_image_real_decode_and_resize(ray_session):
    """Pillow path (skips where pillow is absent): real PNGs through
    the SAME actor-pool stages the fake gates exercise."""
    pytest.importorskip("PIL")
    import ray

    from kgforge.ops.multimodal import FEATURE_DIM, DecodeStub, ResizeStub
    tbl = pa.table({
        "media_id": pa.array([1, 2], type=pa.int64()),
        "mime": pa.array(["image/png"] * 2),
        "payload": pa.array([_png_payload(32, 24, 0),
                             _png_payload(8, 8, 1)], type=pa.binary()),
        "width": pa.array([32, 8], type=pa.int32()),
        "height": pa.array([24, 8], type=pa.int32()),
    })
    ds = ray.data.from_arrow(tbl)
    feats = ds.map_batches(DecodeStub, batch_format="pyarrow",
                           fn_constructor_kwargs={"fake": False},
                           concurrency=1, num_cpus=0.5).to_pandas()
    assert len(feats) == 2
    for f in feats["feature"]:
        assert len(f) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in f)

    resized = ds.map_batches(ResizeStub, batch_format="pyarrow",
                             fn_constructor_kwargs={"fake": False,
                                                    "target_w": 16,
                                                    "target_h": 12},
                             concurrency=1, num_cpus=0.5).to_pandas()
    from PIL import Image
    for payload in resized["payload"]:
        assert Image.open(io.BytesIO(payload)).size == (16, 12)


def test_video_real_frame_sample(ray_session):
    """pyav path (skips where av is absent): demux a real container,
    keep every Nth frame as rgb24 bytes."""
    av = pytest.importorskip("av")
    import ray

    from kgforge.ops.multimodal import FrameSample
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=25)
        stream.width, stream.height = 32, 24
        stream.pix_fmt = "yuv420p"
        for i in range(8):
            arr = np.full((24, 32, 3), i * 16, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    tbl = pa.table({
        "media_id": pa.array([7], type=pa.int64()),
        "payload": pa.array([buf.getvalue()], type=pa.binary()),
    })
    out = (ray.data.from_arrow(tbl)
           .map_batches(FrameSample, batch_format="pyarrow",
                        fn_constructor_kwargs={"fake": False,
                                               "sample_every": 4},
                        concurrency=1, num_cpus=0.5).to_pandas())
    assert list(out["frame_idx"]) == [0, 4]
    assert all(len(f) == 32 * 24 * 3 for f in out["frame"])
