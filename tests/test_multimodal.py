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


def test_media_resize_stage(ray_session):
    import numpy as np

    import ray.data as rd

    from logpipe_ray.functions.multimodal import (
        media_resize,
        synthesize_media_table,
    )

    t = synthesize_media_table(500)
    out = media_resize(rd.from_arrow(t), target=(256, 256)).to_pandas()
    assert len(out) == 500
    assert (out["width"] <= 256).all() and (out["height"] <= 256).all()
    by_id = out.set_index("item_id")
    w0 = t["width"].to_numpy()
    h0 = t["height"].to_numpy()
    for i in (0, 17, 499):
        # aspect preserved to integer truncation
        scale = min(256 / w0[i], 256 / h0[i], 1.0)
        assert by_id.loc[i, "width"] == max(int(w0[i] * scale), 1)
        assert by_id.loc[i, "height"] == max(int(h0[i] * scale), 1)
        # payload shrank with the area ratio
        assert 0 < len(by_id.loc[i, "payload"]) <= len(t["payload"][i].as_py())


def test_frame_sample_stage(ray_session):
    import numpy as np

    import ray.data as rd

    from logpipe_ray.functions.multimodal import (
        frame_sample,
        synthesize_video_table,
    )

    t = synthesize_video_table(200, frame_bytes=128)
    out = frame_sample(
        rd.from_arrow(t), k=4, frame_bytes=128
    ).to_pandas()
    nf = dict(zip(t["item_id"].to_pylist(), t["n_frames"].to_pylist()))
    counts = out.groupby("item_id").size()
    for item, c in counts.items():
        assert c == min(4, nf[item])
    # frame bytes match the exact slice of the original payload
    payloads = dict(zip(t["item_id"].to_pylist(), t["payload"].to_pylist()))
    sample = out.sample(20, random_state=0)
    for _, r in sample.iterrows():
        src = payloads[r.item_id]
        s = r.frame_idx * 128
        assert r.frame_bytes == src[s : s + 128]


def test_real_decode_raises_everywhere(ray_session):
    import pytest as _pytest

    from logpipe_ray.functions.multimodal import (
        FrameSampleStage,
        MediaResizeStage,
        synthesize_media_table,
        synthesize_video_table,
    )

    with _pytest.raises(NotImplementedError, match="PIL"):
        MediaResizeStage(decode="real")(synthesize_media_table(3))
    with _pytest.raises(NotImplementedError, match="libav"):
        FrameSampleStage(decode="real")(synthesize_video_table(3))


_HAS_PIL = __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is not None


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_real_decode_with_pil():
    """Environments with Pillow exercise the real branch structure:
    feature schema matches the fake path, resize respects the box."""
    import io

    from PIL import Image

    from logpipe_ray.functions.multimodal import (
        MediaFeatureStage,
        MediaResizeStage,
    )

    bufs = []
    for w, h in [(64, 32), (300, 400)]:
        img = Image.new("RGB", (w, h), (10, 20, 30))
        out = io.BytesIO()
        img.save(out, format="PNG")
        bufs.append(out.getvalue())
    t = pa.table(
        {
            "item_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(bufs, pa.binary()),
            "mime": pa.array(["image/png"] * 2),
            "width": pa.array([64, 300], pa.int32()),
            "height": pa.array([32, 400], pa.int32()),
        }
    )
    feats = MediaFeatureStage(decode="real")(t)
    assert {"payload_bytes", "byte_mean", "byte_std", "aspect_ratio"} <= set(
        feats.column_names
    )
    assert feats["aspect_ratio"][0].as_py() == 2.0
    resized = MediaResizeStage(target_w=128, target_h=128, decode="real")(t)
    assert resized["width"][0].as_py() <= 128
    assert resized["height"][1].as_py() <= 128
    # round-trips as a decodable image
    Image.open(io.BytesIO(resized["payload"][0].as_py()))


@pytest.mark.skipif(_HAS_PIL, reason="Pillow installed: raise path n/a")
def test_real_decode_raises_at_construction_without_pil():
    from logpipe_ray.functions.multimodal import MediaFeatureStage

    with pytest.raises(NotImplementedError, match="PIL"):
        MediaFeatureStage(decode="real")
