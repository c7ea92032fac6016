"""Multimodal plumbing: schema round-trip, actor featurize, frame fan-out."""

import pyarrow as pa
import pytest
import ray.data as rd

from standardized_omop_data_etl_ray.stages.multimodal import (
    MediaFeaturizer,
    featurize_media,
    frame_sample_plan,
    synth_media_table,
)


def test_synth_media_deterministic():
    a, b = synth_media_table(20), synth_media_table(20)
    assert a.equals(b)
    assert a.schema.field("payload").type == pa.binary()


def test_featurize_actor_pool():
    media = synth_media_table(40)
    out = featurize_media(rd.from_arrow(media), concurrency=2, batch_size=16)
    df = out.to_pandas()
    assert len(df) == 40
    assert all(len(v) == 16 for v in df["feature"])
    # determinism: same payload → same feature
    f2 = featurize_media(rd.from_arrow(media), concurrency=2).to_pandas()
    m1 = {i: list(v) for i, v in zip(df["media_id"], df["feature"])}
    m2 = {i: list(v) for i, v in zip(f2["media_id"], f2["feature"])}
    assert m1 == m2


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        MediaFeaturizer(decoder="real")


def test_frame_sample_fanout():
    media = synth_media_table(30)
    frames = frame_sample_plan(rd.from_arrow(media), every_ms=10_000).to_pandas()
    vids = media.to_pandas().query("kind == 'video' and duration_ms > 0")
    expect = int((vids["duration_ms"] // 10_000 + 1).sum())
    assert len(frames) == expect
