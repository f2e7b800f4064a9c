"""Streaming exact-dedup shared index (logpipe_ray/state/dedup_index.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _docs_ds(ids, texts):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )
    )


@pytest.mark.usefixtures("ray_session")
def test_exactly_one_survivor_per_key():
    from logpipe_ray.state.dedup_index import DedupIndex

    idx = DedupIndex(num_shards=3)
    try:
        texts = [f"t{i % 40}" for i in range(400)]  # 10x duplication
        out = idx.filter_new(_docs_ds(range(400), texts), "text").to_pandas()
        assert len(out) == 40
        assert sorted(out.text) == sorted(set(texts))
        assert idx.total_keys() == 40
    finally:
        idx.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_cross_wave_state_persists():
    from logpipe_ray.state.dedup_index import DedupIndex

    idx = DedupIndex(num_shards=2)
    try:
        w1 = idx.filter_new(_docs_ds([0, 1, 2], ["a", "b", "a"]), "text").to_pandas()
        assert len(w1) == 2
        # wave 2: one repeat of wave 1, one repeat within itself, one new
        w2 = idx.filter_new(
            _docs_ds([3, 4, 5, 6], ["b", "c", "c", "d"]), "text"
        ).to_pandas()
        assert sorted(w2.text) == ["c", "d"]
        assert idx.total_keys() == 4
    finally:
        idx.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_sequential_first_occurrence_wins():
    from logpipe_ray.state.dedup_index import DedupIndex

    idx = DedupIndex(num_shards=1)
    try:
        # one block -> one batch -> in-order admission
        out = idx.filter_new(
            _docs_ds([10, 11, 12], ["x", "x", "y"]).repartition(1), "text"
        ).to_pandas()
        assert out.doc_id.tolist() == [10, 12]
    finally:
        idx.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_streaming_dedup_query_counts():
    from logpipe_ray.queries import docs_streaming_dedup

    out = docs_streaming_dedup("/root/testdata/sf0.001").to_pandas()
    assert out.wave.tolist() == [1, 2]
    assert (out.n_kept <= out.n_in).all()
    # replay the semantics in pandas
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    cut = len(t) // 2
    w1 = set(t[t.doc_id < cut].text)
    w2 = set(t[t.doc_id >= cut].text)
    assert out.n_kept.tolist() == [len(w1), len(w2 - w1)]
