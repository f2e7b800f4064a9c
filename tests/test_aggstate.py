"""Incremental keyed-aggregate state (state/aggstate.py)."""

import json
import os

import pyarrow as pa
import pytest


def _waves(rd):
    w1 = rd.from_arrow(
        pa.table({"k": ["a", "a", "b"], "cnt": [1, 2, 5]})
    )
    w2 = rd.from_arrow(pa.table({"k": ["b", "c"], "cnt": [1, 7]}))
    w3 = rd.from_arrow(pa.table({"k": ["a"], "cnt": [10]}))
    return w1, w2, w3


def _state_dict(st):
    df = st.read().to_pandas()
    return dict(zip(df["k"], df["cnt"]))


def test_incremental_equals_full_recompute(ray_session, tmp_path):
    import ray.data as rd

    from logpipe_ray.state.aggstate import CountState

    st = CountState(str(tmp_path), keys=["k"])
    for i, w in enumerate(_waves(rd)):
        assert st.update(f"w{i}", w) is True
    assert _state_dict(st) == {"a": 13, "b": 6, "c": 7}


def test_replayed_wave_is_noop(ray_session, tmp_path):
    import ray.data as rd

    from logpipe_ray.state.aggstate import CountState

    st = CountState(str(tmp_path), keys=["k"])
    w1, w2, _ = _waves(rd)
    assert st.update("w1", w1) is True
    assert st.update("w1", w1) is False  # at-least-once upstream replay
    assert st.update("w2", w2) is True
    assert st.update("w2", w2) is False
    assert _state_dict(st) == {"a": 3, "b": 6, "c": 7}
    assert st.applied_waves() == ["w1", "w2"]


def test_crash_leaves_previous_state_live(ray_session, tmp_path):
    """An orphaned .tmp dir (crash mid-merge) doesn't corrupt reads
    and is cleaned by the next merge; old versions are gc'd."""
    import ray.data as rd

    from logpipe_ray.state.aggstate import CountState

    st = CountState(str(tmp_path), keys=["k"])
    w1, w2, _ = _waves(rd)
    st.update("w1", w1)
    # simulate a crash: a half-written merge directory, head untouched
    orphan = tmp_path / "state_v9.tmp"
    orphan.mkdir()
    (orphan / "junk.parquet").write_bytes(b"not parquet")
    assert _state_dict(st) == {"a": 3, "b": 5}
    st.update("w2", w2)
    assert _state_dict(st) == {"a": 3, "b": 6, "c": 7}
    dirs = [d for d in os.listdir(tmp_path) if d.startswith("state_v")]
    # only the live version remains (orphan + superseded gc'd)
    head = json.load(open(tmp_path / "HEAD.json"))
    assert dirs == [head["state_dir"]]


def test_empty_state_reads_empty(ray_session, tmp_path):
    from logpipe_ray.state.aggstate import CountState

    st = CountState(str(tmp_path), keys=["k"])
    assert st.read().count() == 0
