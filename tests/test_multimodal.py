"""Multimodal: real PPM/WAV codecs, actor featurize, resize, fan-out."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from standardized_omop_data_etl_ray.stages.multimodal import (
    MediaFeaturizer,
    decode_ppm,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
    featurize_media,
    frame_sample_plan,
    resize_images,
    synth_media_table,
)


def test_synth_media_deterministic():
    a, b = synth_media_table(20), synth_media_table(20)
    assert a.equals(b)
    assert a.schema.field("payload").type == pa.binary()


def test_ppm_roundtrip():
    img = (np.arange(5 * 7 * 3) % 251).reshape(5, 7, 3).astype(np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    with pytest.raises(ValueError):
        decode_ppm(b"nope")


def test_wav_roundtrip():
    t = np.arange(800, dtype=np.float32) / 8000
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    out, rate = decode_wav_pcm16(encode_wav_pcm16(sig, rate=8000))
    assert rate == 8000
    assert np.max(np.abs(out - sig)) < 1e-3  # 16-bit quantization
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFFxxxxJUNK")


def test_featurize_actor_pool_real_decoders():
    media = synth_media_table(40)
    out = featurize_media(rd.from_arrow(media), concurrency=2, batch_size=16)
    df = out.to_pandas()
    assert len(df) == 40
    assert all(len(v) == 16 for v in df["feature"])
    # image features reflect decoded pixels: channel means ordered by the
    # synth gradient's scales (R > G > B)
    img_rows = df[df["kind"] == "image"]
    assert len(img_rows) > 0
    for v in img_rows["feature"]:
        assert v[0] > v[1] > v[2]
    # audio features: positive RMS, plausible zcr, duration > 0
    aud = df[df["kind"] == "audio"]
    for v in aud["feature"]:
        assert v[0] > 0.1 and v[2] > 0
    # determinism: same payload → same feature
    f2 = featurize_media(rd.from_arrow(media), concurrency=2).to_pandas()
    m1 = {i: list(v) for i, v in zip(df["media_id"], df["feature"])}
    m2 = {i: list(v) for i, v in zip(f2["media_id"], f2["feature"])}
    assert m1 == m2


def test_resize_images_real():
    media = synth_media_table(30)
    small = resize_images(rd.from_arrow(media), out_w=8, out_h=6,
                          concurrency=2, batch_size=16).to_pandas()
    src = media.to_pandas().set_index("media_id")
    for _, row in small.iterrows():
        if row["mime"] == "image/x-portable-pixmap":
            img = decode_ppm(row["payload"])
            assert img.shape == (6, 8, 3)
        else:  # non-images pass through untouched
            assert row["payload"] == src.loc[row["media_id"], "payload"]


def test_fake_decoder_still_available():
    media = synth_media_table(10)
    df = featurize_media(rd.from_arrow(media), decoder="fake").to_pandas()
    assert len(df) == 10
    with pytest.raises(ValueError):
        MediaFeaturizer(decoder="ffmpeg")


def test_frame_sample_fanout():
    media = synth_media_table(30)
    frames = frame_sample_plan(rd.from_arrow(media), every_ms=10_000).to_pandas()
    vids = media.to_pandas().query("kind == 'video' and duration_ms > 0")
    expect = int((vids["duration_ms"] // 10_000 + 1).sum())
    assert len(frames) == expect


def test_ppm_stream_roundtrip_and_video_feats():
    """PPM-stream (ffmpeg image2pipe format) round-trips frame-exact;
    video features reflect decoded frames: frame count in slot 0 and
    nonzero motion energy for the moving-gradient synth videos."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.multimodal import (
        decode_ppm_stream,
        encode_ppm_stream,
    )

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
              for _ in range(4)]
    back = decode_ppm_stream(encode_ppm_stream(frames))
    assert len(back) == 4
    for a, b in zip(frames, back):
        assert (a == b).all()

    media = synth_media_table(40)
    df = featurize_media(rd.from_arrow(media), concurrency=2,
                         batch_size=16).to_pandas()
    vids = df[df["kind"] == "video"]
    src = media.to_pandas().set_index("media_id")
    assert len(vids) > 0
    for mid, v in zip(vids["media_id"], vids["feature"]):
        n_expected = max(2, int(src.loc[mid, "duration_ms"]) // 250)
        assert v[0] == n_expected  # decoded frame count
        assert v[3] > 0.0          # motion energy of the rolling gradient


def test_sample_frames_real_fanout():
    """sample_frames fans each video out to every-kth DECODED frame as a
    standalone image payload the image stages accept."""
    from standardized_omop_data_etl_ray.stages.multimodal import (
        sample_frames,
    )

    media = synth_media_table(30)
    out = sample_frames(rd.from_arrow(media), every_k=3,
                        concurrency=2, batch_size=8).to_pandas()
    src = media.to_pandas().query("kind == 'video'").set_index("media_id")
    expect = sum(
        len(range(0, max(2, int(d) // 250), 3))
        for d in src["duration_ms"]
    )
    assert len(out) == expect and expect > 0
    assert set(out["media_id"]) == set(src.index)
    for _, row in out.iterrows():
        img = decode_ppm(row["payload"])
        assert img.shape == (row["height"], row["width"], 3)
        assert row["frame_idx"] % 3 == 0


def test_resample_audio_real():
    """Linear resample of WAV/PCM16 payloads: output rate and duration
    preserved (±1 sample), a pure sine survives recognizably (the
    dominant DFT bin maps to the same frequency), non-audio rows pass
    through byte-identical."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
        resample_audio,
    )

    rate_in, rate_out, freq = 8_000, 16_000, 440.0
    t = np.arange(rate_in) / rate_in  # 1 second
    sine = (np.sin(2 * np.pi * freq * t) * 20_000).astype(np.int16)
    wav = encode_wav_pcm16(sine, rate_in)
    png = b"not-audio-bytes"
    tbl = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "mime": ["audio/wav", "image/x-portable-pixmap"],
        "payload": pa.array([wav, png], pa.binary()),
    })
    out = (
        resample_audio(rd.from_arrow(tbl), out_rate=rate_out,
                       concurrency=1, batch_size=8)
        .to_pandas().set_index("media_id")
    )
    assert out.loc[2, "payload"] == png  # passthrough untouched

    samples, rate = decode_wav_pcm16(out.loc[1, "payload"])
    assert rate == rate_out
    assert abs(len(samples) - rate_out) <= 1  # still ~1 second
    spec = np.abs(np.fft.rfft(samples.astype(np.float64)))
    peak_hz = np.argmax(spec[1:]) + 1  # bin ≈ Hz for a 1 s clip
    assert abs(peak_hz - freq) <= 2
