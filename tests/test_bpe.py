"""Distributed BPE-merge learning vs a pure-Python reference."""

import numpy as np
import pyarrow as pa

from logpipe_ray.functions.bpe import (
    apply_merge_batch,
    apply_merges,
    learn_bpe_merges,
)


def _ref_bpe(seqs, k, first_new_id):
    """Textbook BPE: overlapping pair counts, max count with smallest
    (t1, t2) tiebreak, greedy left-to-right rewrite."""
    seqs = [list(s) for s in seqs]
    merges = []
    nid = first_new_id
    for rank in range(k):
        counts = {}
        for s in seqs:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break
        merges.append((rank, best[0], best[1], nid, counts[best]))
        out = []
        for s in seqs:
            r, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    r.append(nid)
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            out.append(r)
        seqs = out
        nid += 1
    return merges, seqs


def _toks_table(seqs):
    return pa.table({"tokens": pa.array(seqs, pa.list_(pa.int32()))})


def test_apply_merge_overlap_greedy():
    t = _toks_table([[7, 7, 7], [7, 7, 7, 7], [1, 7, 7, 2], [7], []])
    out = apply_merge_batch(t, 7, 7, 99)
    assert out["tokens"].to_pylist() == [
        [99, 7],
        [99, 99],
        [1, 99, 2],
        [7],
        [],
    ]


def test_apply_merge_never_crosses_rows():
    t = _toks_table([[1, 2, 3], [4, 1, 2]])
    out = apply_merge_batch(t, 3, 4, 99)  # (3,4) only exists across rows
    assert out["tokens"].to_pylist() == [[1, 2, 3], [4, 1, 2]]


def test_learn_matches_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(23)
    seqs = [rng.integers(3, 11, size=rng.integers(2, 30)).tolist() for _ in range(300)]
    k = 8
    ds = rd.from_arrow(_toks_table(seqs))
    merges = learn_bpe_merges(ds, k_merges=k)
    ref_merges, ref_seqs = _ref_bpe(seqs, k, first_new_id=int(max(map(max, seqs))) + 1)
    got = list(
        zip(
            merges["rank"].to_pylist(),
            merges["t1"].to_pylist(),
            merges["t2"].to_pylist(),
            merges["new_id"].to_pylist(),
            merges["cnt"].to_pylist(),
        )
    )
    assert got == ref_merges
    # and re-tokenizing with the learned table reproduces the
    # reference's rewritten corpus
    out = apply_merges(rd.from_arrow(_toks_table(seqs)), merges).to_pandas()
    assert [list(x) for x in out["tokens"]] == ref_seqs


def test_learn_block_layout_invariant(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(29)
    seqs = [rng.integers(3, 9, size=20).tolist() for _ in range(200)]
    a = learn_bpe_merges(rd.from_arrow(_toks_table(seqs)), k_merges=5)
    b = learn_bpe_merges(
        rd.from_arrow(_toks_table(seqs)).repartition(7), k_merges=5
    )
    assert a.equals(b)


def test_sample_mod_trains_on_subset(ray_session):
    import ray.data as rd

    seqs = [[3, 4, 3, 4]] * 50 + [[5, 6, 5, 6]] * 50
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(100)), pa.int64()),
            "tokens": pa.array(seqs, pa.list_(pa.int32())),
        }
    )
    m = learn_bpe_merges(
        rd.from_arrow(tbl), k_merges=1, sample_mod=2, id_col="doc_id"
    )
    assert m.num_rows == 1  # learns from the sampled half without error


def test_sample_mod_equals_prefiltered_training(ray_session):
    """The bench's sampled entry must be PATH-EQUAL to training on the
    pre-filtered corpus: learn(sample_mod=4 on string doc_ids) ==
    learn(manually hash-filtered dataset), byte-identical merge table
    (same hash, same ordering, same counts)."""
    import ray.data as rd

    from logpipe_ray.stages.transform import hash64_strings

    rng = np.random.default_rng(31)
    seqs = [rng.integers(3, 40, size=rng.integers(5, 30)).tolist() for _ in range(400)]
    ids = [f"doc-{i:04d}" for i in range(400)]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "tokens": pa.array(seqs, pa.list_(pa.int32())),
        }
    )
    sampled = learn_bpe_merges(
        rd.from_arrow(tbl).repartition(5), k_merges=6, sample_mod=4,
        id_col="doc_id",
    )
    keep = hash64_strings(pa.array(ids, pa.string())) % np.uint64(4) == 0
    pre = tbl.filter(pa.array(keep))
    assert 0 < pre.num_rows < 400
    manual = learn_bpe_merges(rd.from_arrow(pre).repartition(3), k_merges=6)
    assert sampled.equals(manual)


def test_driver_and_distributed_routes_byte_equal(ray_session):
    """All THREE training routes must learn the IDENTICAL merge table:
    the bounded-driver loop (corpus <= driver_rows), the fused-task
    loop (driver_rows=0, blocks <= BPE_FUSED_MAX_BLOCKS — one
    rewrite+count pass per round), and the all-Dataset loop (the
    >BPE_FUSED_MAX_BLOCKS route, called directly)."""
    import ray.data as rd

    from logpipe_ray.functions.bpe import _learn_dataset_loop

    rng = np.random.default_rng(41)
    seqs = [rng.integers(3, 30, size=rng.integers(4, 40)).tolist() for _ in range(500)]
    tbl = _toks_table(seqs)
    a = learn_bpe_merges(rd.from_arrow(tbl).repartition(5), k_merges=8)
    b = learn_bpe_merges(
        rd.from_arrow(tbl).repartition(5), k_merges=8, driver_rows=0
    )
    assert a.num_rows == 8
    assert a.equals(b)

    cur = rd.from_arrow(tbl).select_columns(["tokens"]).materialize()
    first_new_id = int(max(max(s) for s in seqs if s)) + 1
    ds_rows = _learn_dataset_loop(cur, 8, "tokens", first_new_id)
    got = [
        (int(a["rank"][i].as_py()), int(a["t1"][i].as_py()),
         int(a["t2"][i].as_py()), int(a["new_id"][i].as_py()),
         int(a["cnt"][i].as_py()))
        for i in range(a.num_rows)
    ]
    assert ds_rows == got
