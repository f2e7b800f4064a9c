"""Round-5 session-2: the BPE-training SQL replay (the last
algorithmically-oracle-able `no_oracle` family).

The DuckDB oracle replays every BPE round bitwise — pair counts,
(cnt DESC, t1, t2) argmax, and the greedy left-to-right non-overlap
rewrite expressed as run-parity. These tests pin the replay against
the repo's own kernels on a synthetic corpus engineered around the
hard cases (overlap runs of even/odd length, ties, empty and
length-1 sequences), plus the real fixture end-to-end.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_shards(tmp_path, seqs_per_shard):
    for s, seqs in enumerate(seqs_per_shard):
        tbl = pa.table(
            {
                "doc_id": pa.array(
                    [f"doc-{s:04d}-{i:06d}" for i in range(len(seqs))]
                ),
                "tokens": pa.array(
                    [list(map(int, x)) for x in seqs], pa.list_(pa.int32())
                ),
            }
        )
        pq.write_table(tbl, str(tmp_path / f"shard_{s:04d}.parquet"))
    return str(tmp_path)


@pytest.fixture(scope="module")
def overlap_corpus(tmp_path_factory):
    """Two shards engineered for the rewrite's hard cases: (a,a) runs
    of even and odd length (run-parity), exact count ties (argmax
    tiebreak), empty and singleton sequences, and pairs that only
    become frequent AFTER an earlier merge creates the new token."""
    rng = np.random.default_rng(11)
    seqs0 = [
        [2, 2, 2, 2, 2, 2],          # even run of (2,2)
        [2, 2, 2, 2, 2],             # odd run
        [3, 3, 3, 1, 3, 3, 3, 3],    # runs split by a non-match
        [],                          # empty sequence
        [7],                         # singleton
        [1, 2, 1, 2, 1, 2, 1],       # alternating — (1,2)/(2,1) tie shape
    ]
    seqs1 = [rng.integers(1, 8, size=int(rng.integers(0, 14))) for _ in range(60)]
    return seqs0, seqs1


def _learn_sql(path: str, k: int) -> str:
    from logpipe_ray.queries import (
        _sql_bpe_flat_cte,
        _sql_bpe_merge_rows,
        _sql_bpe_round_ctes,
    )

    nid = "(SELECT nid0 FROM mx)"
    ctes = [
        _sql_bpe_flat_cte("", path),
        "mx AS (SELECT CAST(max(tok) + 1 AS INTEGER) AS nid0 FROM f0)",
    ]
    for r in range(k):
        ctes += _sql_bpe_round_ctes("", r, nid)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + _sql_bpe_merge_rows("", k, nid) + "\nORDER BY rank"
    )


def test_bpe_learn_sql_replay_synthetic(tmp_path, overlap_corpus):
    from logpipe_ray.functions.bpe import _learn_driver

    seqs0, seqs1 = overlap_corpus
    path = _write_shards(tmp_path, [seqs0, seqs1])
    tbl = pq.read_table(path, columns=["tokens"])
    flat = tbl["tokens"].combine_chunks().flatten()
    first_new_id = int(pa.compute.max(flat).as_py() or 0) + 1

    K = 6
    ref = _learn_driver(tbl, K, "tokens", first_new_id)
    got = duckdb.connect().execute(_learn_sql(path, K)).fetchall()
    assert [tuple(int(v) for v in row) for row in got] == [
        tuple(r) for r in ref
    ]
    assert len(ref) >= 3  # the corpus actually trains several merges


def test_bpe_apply_sql_replay_synthetic(tmp_path, overlap_corpus):
    """The APPLY chain (best_from=literal merge CTEs) must reproduce
    apply_merge_batch exactly — checked on the post-rewrite per-seq
    token COUNTS (what seq_bpe_encode aggregates) and total sum."""
    from logpipe_ray.functions.bpe import apply_merge_batch, _learn_driver
    from logpipe_ray.queries import _sql_bpe_flat_cte, _sql_bpe_round_ctes

    seqs0, seqs1 = overlap_corpus
    path = _write_shards(tmp_path, [seqs0, seqs1])
    tbl = pq.read_table(path, columns=["tokens"])
    flat = tbl["tokens"].combine_chunks().flatten()
    nid0 = int(pa.compute.max(flat).as_py() or 0) + 1

    K = 4
    merges = _learn_driver(tbl, K, "tokens", nid0)
    assert len(merges) == K
    out = tbl
    for rank, t1, t2, new_id, _ in merges:
        out = apply_merge_batch(out, t1, t2, new_id, "tokens")
    ref_lens = sorted(
        pa.compute.list_value_length(out["tokens"]).to_pylist()
    )

    ctes = [_sql_bpe_flat_cte("a", path)]
    for r, (rank, t1, t2, new_id, _) in enumerate(merges):
        ctes.append(
            f"sb{r} AS (SELECT CAST({t1} AS INTEGER) AS t1,"
            f" CAST({t2} AS INTEGER) AS t2)"
        )
        ctes += _sql_bpe_round_ctes("a", r, str(nid0), best_from=f"sb{r}")
    sql = (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT seq, count(*) AS n FROM af{K} GROUP BY seq"
    )
    got = duckdb.connect().execute(sql).fetchdf()
    # empty/fully-consumed seqs don't appear in the flat table
    n_nonempty = int((pa.compute.list_value_length(out["tokens"]).to_numpy(
        zero_copy_only=False) > 0).sum())
    assert len(got) == n_nonempty
    got_lens = sorted(
        int(v) for v in got["n"]
    ) + [0] * (len(ref_lens) - n_nonempty)
    assert sorted(got_lens) == ref_lens


def test_sweep_fold_task_routes_byte_equal(ray_session):
    """The single-task sweep fold (default below SWEEP_FOLD_TASK_ROWS)
    and the bucketed boundary-scan plan (forced via fold_task_rows=0)
    must agree exactly — intervals engineered with cross-bucket spans,
    boundary ties (+1/-1 at the same t), and zero-length intervals."""
    import pandas as pd
    import ray.data as rd

    from logpipe_ray.stages.aggregate import (
        sweep_max_concurrent,
        sweep_time_integral,
    )

    rng = np.random.default_rng(17)
    n = 4000
    t0 = rng.integers(0, 40 * 3_600_000_000, n)
    dur = np.where(
        rng.random(n) < 0.1, 0, rng.integers(1, 9 * 3_600_000_000, n)
    )
    tbl = pa.table(
        {
            "t0": pa.array(t0.astype(np.int64)),
            "t1": pa.array((t0 + dur).astype(np.int64)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(6)
    kw = dict(t0_col="t0", t1_col="t1", bucket_us=3_600_000_000,
              out_grain_us=86_400_000_000)
    fast = sweep_max_concurrent(ds, **kw).to_pandas()
    slow = sweep_max_concurrent(ds, **kw, fold_task_rows=0).to_pandas()
    pd.testing.assert_frame_equal(
        fast.sort_values("grain", ignore_index=True),
        slow.sort_values("grain", ignore_index=True),
    )

    fi = sweep_time_integral(ds, "t0", "t1", 3_600_000_000)
    si = sweep_time_integral(ds, "t0", "t1", 3_600_000_000, fold_task_rows=0)
    assert fi.equals(si)


def test_editdist_pairs_matrix_equals_scalar():
    """The pair-vectorized Levenshtein DP must be bitwise-equal to the
    scalar kernel (itself verified 300/300 against DuckDB levenshtein)
    — empty strings, equal strings, multibyte UTF-8 included."""
    from logpipe_ray.functions.dedup import (
        editdist_bytes,
        editdist_bytes_pairs,
    )

    rng = np.random.default_rng(29)
    strs = [b"", b"a", "café".encode(), "cafe".encode()]
    for _ in range(40):
        n = int(rng.integers(0, 40))
        strs.append(bytes(rng.integers(97, 123, n).astype(np.uint8)))
    strs.append(strs[4])  # planted exact duplicate
    n = len(strs)
    ia, ib = np.triu_indices(n, k=1)
    got = editdist_bytes_pairs(strs, ia, ib, chunk=100)
    want = np.array(
        [editdist_bytes(strs[i], strs[j]) for i, j in zip(ia, ib)],
        dtype=np.int64,
    )
    assert np.array_equal(got, want)


def test_asof_fold_task_route_equals_bucketed(ray_session):
    """The single-task merge_asof fold (default below
    ASOF_FOLD_TASK_ROWS) must produce the same relation as the
    bucketed carry plan (forced via fold_task_rows=0) — ts ties with
    tiebreak, keys with no right rows, and cross-bucket gaps
    included."""
    import pandas as pd
    import ray.data as rd

    from logpipe_ray.stages.join import asof_join

    rng = np.random.default_rng(23)
    nl, nr = 3000, 2000
    lt = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, nl).astype(np.int64)),
            "ts": pa.array(rng.integers(0, 10_000, nl).astype(np.int64)),
            "lv": pa.array(np.arange(nl, dtype=np.int64)),
        }
    )
    rt = pa.table(
        {
            "k": pa.array(rng.integers(0, 50, nr).astype(np.int64)),
            "ts": pa.array(
                (rng.integers(0, 2_500, nr) * 4).astype(np.int64)  # ties
            ),
            "rv": pa.array(rng.integers(0, 1000, nr).astype(np.int64)),
            "tb": pa.array(np.arange(nr, dtype=np.int64)),
        }
    )
    kw = dict(
        key="k",
        ts_col="ts",
        left_cols={"lv": pa.int64()},
        right_cols={"rv": pa.int64(), "tb": pa.int64()},
        tiebreak="tb",
        bucket_width_us=512,
    )

    def run(**extra):
        out = asof_join(
            rd.from_arrow(lt).repartition(5),
            rd.from_arrow(rt).repartition(4),
            **kw,
            **extra,
        ).to_pandas()
        # per-block dtypes vary on BOTH routes (pandas NaN coercion);
        # callers cast in their finalize — normalize for the compare
        for c in ("lv", "rv", "tb"):
            out[c] = out[c].astype("float64")
        return out.sort_values(
            ["k", "ts", "lv"], ignore_index=True
        )

    fast = run()
    slow = run(fold_task_rows=0)
    assert len(fast) == nl
    pd.testing.assert_frame_equal(fast, slow)


def test_order_profile_attach_equals_left_outer_join(ray_session):
    """customers_order_profile's broadcast left-outer attach (default)
    must equal the native left_outer hash join (attach_broadcast_rows=0)
    — zero-order customers included."""
    import pandas as pd

    from logpipe_ray.queries import customers_order_profile

    sf = "/root/testdata/sf0.001"
    fast = customers_order_profile(sf).to_pandas()
    slow = customers_order_profile(sf, attach_broadcast_rows=0).to_pandas()
    cols = sorted(fast.columns)
    pd.testing.assert_frame_equal(
        fast[cols].sort_values(cols, ignore_index=True),
        slow[cols].sort_values(cols, ignore_index=True),
    )
    assert len(fast) > 0 and (fast["n_orders"] >= 0).all()


def test_attribution_fold_route_equals_bucketed(ray_session):
    """purchases_linear_attribution's single-task fold (default) and
    the bucketed map_groups plan (fold_task_rows=0) must agree exactly
    on the fixture."""
    import pandas as pd

    from logpipe_ray.queries import purchases_linear_attribution

    sf = "/root/testdata/sf0.001"
    fast = purchases_linear_attribution(sf).to_pandas()
    slow = purchases_linear_attribution(sf, fold_task_rows=0).to_pandas()
    cols = ["click_day", "n_pairs", "attributed_microcents"]
    pd.testing.assert_frame_equal(
        fast[cols].sort_values("click_day", ignore_index=True),
        slow[cols].sort_values("click_day", ignore_index=True),
    )
    assert len(fast) > 0


def test_bpe_sampled_oracle_on_fixture(ray_session):
    """End-to-end at sf0.001: the registry query (real distributed
    route incl. the hash-sample) vs its DuckDB oracle (FNV+splitmix
    membership replay + 12 replay rounds)."""
    from logpipe_ray.queries import (
        _sql_seq_bpe_merges_sampled,
        seq_bpe_merges_sampled,
    )

    sf = "/root/testdata/sf0.001"
    ray_tbl = seq_bpe_merges_sampled(sf)
    got = duckdb.connect().execute(_sql_seq_bpe_merges_sampled(sf)).fetchdf()
    assert len(got) == ray_tbl.num_rows
    rdf = ray_tbl.to_pandas()
    for c in ["rank", "t1", "t2", "new_id", "cnt"]:
        assert got[c].tolist() == rdf[c].tolist(), c
