"""Multimodal REAL kernels: pure-numpy PPM/WAV/PPMV codecs + actor-pool
stages over genuine payloads."""

import numpy as np
import pyarrow as pa
import pytest

from project_gutenberg_full_text_search_ray.stages.multimodal import (
    DecodeImageStage, FrameSampleStage, ResizeImageStage, decode_ppm,
    decode_ppmv_frame, decode_wav_pcm16, encode_ppm, encode_ppmv,
    encode_wav_pcm16, ppmv_frame_count, resize_nearest, synth_media_table,
    synth_video_table)


def test_ppm_roundtrip_and_comments():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_ppm(encode_ppm(px)) == px).all()
    # header with a comment line (spec-legal)
    raw = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
    assert (decode_ppm(raw) == px).all()
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n...")


def test_wav_roundtrip():
    s = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    out, rate = decode_wav_pcm16(encode_wav_pcm16(s, 8000))
    assert rate == 8000 and (out == s).all()


def test_resize_nearest_known_pixels():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 0] = 10
    px[1, 1] = 20
    up = resize_nearest(px, 4, 4)
    assert up.shape == (4, 4, 3)
    assert (up[0, 0] == 10).all() and (up[3, 3] == 20).all()
    assert (resize_nearest(up, 2, 2) == px).all()


def test_ppmv_random_access():
    frames = [np.full((2, 2, 3), i, dtype=np.uint8) for i in range(5)]
    payload = encode_ppmv(frames)
    assert ppmv_frame_count(payload) == 5
    assert (decode_ppmv_frame(payload, 3) == frames[3]).all()
    with pytest.raises(IndexError):
        decode_ppmv_frame(payload, 5)


def test_decode_stage_real_kernels(ray_session):
    import ray.data as rd

    media = synth_media_table(16)
    out = rd.from_arrow(media).map_batches(
        DecodeImageStage, fn_constructor_kwargs={"dim": 16, "fake": False},
        batch_format="pyarrow", concurrency=2, batch_size=8,
    ).to_pandas().sort_values("media_id")
    assert len(out) == 16
    feats = np.asarray([f for f in out["features"]])
    assert feats.shape == (16, 16)
    # image features are grayscale fractions; audio features RMS energies
    assert (feats >= 0).all() and (feats <= 1.5).all()
    # unknown format raises at the codec slot
    bad = pa.table({"media_id": [0], "payload": [b"GIF89a..."],
                    "meta": media["meta"].slice(0, 1)})
    with pytest.raises(NotImplementedError):
        DecodeImageStage(fake=False)(bad)


def test_resize_stage_real(ray_session):
    import ray.data as rd

    px = [np.random.default_rng(i).integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
          for i in range(4)]
    t = pa.table({
        "media_id": pa.array(range(4), type=pa.int64()),
        "payload": pa.array([encode_ppm(p) for p in px], type=pa.binary()),
        "meta": pa.array([{"mime": "image/x-portable-pixmap", "width": 8,
                           "height": 6, "duration_ms": 0}] * 4,
                         type=synth_media_table(1)["meta"].type),
    })
    out = rd.from_arrow(t).map_batches(
        ResizeImageStage, fn_constructor_kwargs={"width": 4, "height": 3, "fake": False},
        batch_format="pyarrow", concurrency=1, batch_size=4,
    ).to_pandas().sort_values("media_id")
    for i, payload in enumerate(out["payload"]):
        got = decode_ppm(payload)
        assert got.shape == (3, 4, 3)
        assert (got == resize_nearest(px[i], 4, 3)).all()
    assert all(m["width"] == 4 and m["height"] == 3 for m in out["meta"])


def test_frame_sample_stage_real(ray_session):
    import ray.data as rd

    vids = synth_video_table(3, frames=6)
    out = rd.from_arrow(vids).map_batches(
        FrameSampleStage, fn_constructor_kwargs={"n_frames": 3, "fake": False},
        batch_format="pyarrow", concurrency=1, batch_size=2,
    ).to_pandas()
    assert len(out) == 9  # 3 videos x 3 sampled frames
    # evenly spaced over 6 frames: 0, 2, 5
    assert sorted(out[out["media_id"] == 0]["frame_idx"]) == [0, 2, 5]
    # sampled frame pixels equal the source frame
    row = out[(out["media_id"] == 1) & (out["frame_idx"] == 5)].iloc[0]
    src = decode_ppmv_frame(vids["payload"][1].as_py(), 5)
    assert (decode_ppm(row["frame_payload"]) == src).all()


def test_resize_stage_real_passes_through_non_images(ray_session):
    """Real resize over the MIXED synthetic corpus (PPM + WAV interleaved):
    images resize, non-images pass through byte-identical with their meta
    untouched (used to crash on the first WAV row)."""
    import ray.data as rd

    media = synth_media_table(6)  # even ids PPM, odd ids WAV
    out = rd.from_arrow(media).map_batches(
        ResizeImageStage, fn_constructor_kwargs={"width": 4, "height": 3, "fake": False},
        batch_format="pyarrow", concurrency=1, batch_size=6,
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    src = media.to_pandas().sort_values("media_id").reset_index(drop=True)
    for i in range(6):
        if src["payload"][i].startswith(b"P6"):
            assert decode_ppm(out["payload"][i]).shape == (3, 4, 3)
            assert out["meta"][i]["width"] == 4 and out["meta"][i]["height"] == 3
        else:
            assert out["payload"][i] == src["payload"][i]
            assert out["meta"][i] == src["meta"][i]
