import numpy as np
import pytest

import ray.data as rd

from logpipe_ray.functions.multimodal import (
    MediaFeatureStage,
    media_features,
    synthesize_media_table,
)


def test_synthesize_deterministic():
    a = synthesize_media_table(50)
    b = synthesize_media_table(50)
    assert a.equals(b)


def test_stage_fake_decode_features():
    t = synthesize_media_table(20)
    out = MediaFeatureStage(decode="fake")(t)
    assert "payload" not in out.column_names  # heavy bytes dropped
    assert out.num_rows == 20
    lens = out["payload_bytes"].to_pylist()
    exp = [len(p) for p in t["payload"].to_pylist()]
    assert lens == exp
    means = out["byte_mean"].to_pylist()
    assert all(100 < m < 155 for m in means)  # uniform random bytes


def test_stage_real_decode_raises():
    t = synthesize_media_table(2)
    with pytest.raises(NotImplementedError, match="PIL"):
        MediaFeatureStage(decode="real")(t)


def test_actor_pool_pipeline(ray_session):
    t = synthesize_media_table(300)
    out = media_features(rd.from_arrow(t), concurrency=(1, 2), batch_size=64)
    df = out.to_pandas()
    assert len(df) == 300
    direct = MediaFeatureStage()(t).to_pandas()
    merged = df.sort_values("item_id", ignore_index=True)
    assert np.allclose(merged["byte_mean"], direct["byte_mean"])
