import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from logpipe_ray.functions.tokens import (
    EOS_ID,
    PAD_ID,
    BOS_ID,
    pack_batch,
    pack_sequences,
    token_frequency,
)
from logpipe_ray.tokenizer import encode_lines


def _seq_table(lines):
    toks = encode_lines(lines)
    return pa.table(
        {
            "doc_id": [f"d{i}" for i in range(len(lines))],
            "tokens": toks,
            "n_tok": pa.compute.list_value_length(toks).cast(pa.int32()),
            "source": ["auth"] * len(lines),
        }
    )


def test_token_frequency_matches_python(ray_session):
    lines = [b"aab", b"abc", b"ccc"]
    t = _seq_table(lines)
    out = token_frequency(rd.from_arrow(t)).to_pandas()
    got = dict(zip(out["token_id"], out["cnt"]))
    exp = {}
    for line in lines:
        for b in line:
            exp[b + 3] = exp.get(b + 3, 0) + 1
    assert got == exp


def test_pack_batch_invariants():
    lines = [b"x" * 50, b"y" * 30, b"z" * 100, b"w" * 10, b"v" * 200]
    t = _seq_table(lines)
    out = pack_batch(t, context_len=128)
    ctxs = out["context_tokens"].to_pylist()
    assert all(len(c) == 128 for c in ctxs)
    # every context: BOS starts each seq, EOS ends it, PAD only at tail
    total_payload = 0
    all_ids = []
    for ctx, members, trunc in zip(
        ctxs, out["doc_ids"].to_pylist(), out["truncated"].to_pylist()
    ):
        assert ctx[0] == BOS_ID
        nonpad = [x for x in ctx if x != PAD_ID]
        tail = ctx[len(nonpad):]
        assert all(x == PAD_ID for x in tail)
        assert nonpad.count(BOS_ID) == len(members)
        assert nonpad.count(EOS_ID) == len(members)
        total_payload += len(nonpad) - 2 * len(members)
        all_ids.extend(members)
    # v (200 bytes) truncated to 126; all sequences present exactly once
    assert sorted(all_ids) == [f"d{i}" for i in range(5)]
    exp_payload = sum(min(len(l), 126) for l in lines)
    assert total_payload == exp_payload
    assert sum(out["truncated"].to_pylist()) == 1  # only the 200-byte doc


def test_pack_sequences_distributed(ray_session, tiny_sequences):
    ds = rd.read_parquet(tiny_sequences)
    packed = pack_sequences(ds, context_len=1024)
    df = packed.to_pandas()
    assert (df["fill_ratio"] > 0).all() and (df["fill_ratio"] <= 1).all()
    assert df["n_seqs"].sum() == 2000  # every sequence packed exactly once
    # mean fill should be decent for ~300-token docs in 1024 contexts
    assert df["fill_ratio"].mean() > 0.6


def test_pack_batch_empty_is_typed():
    t = _seq_table([b"abc"]).slice(0, 0)
    out = pack_batch(t, context_len=64)
    assert out.num_rows == 0
    assert out["doc_ids"].type == pa.list_(pa.string())
    full = pack_batch(_seq_table([b"abc"]), context_len=64)
    assert out.schema.equals(full.schema)


def test_pack_batch_matches_reference_greedy():
    """The vectorized packer must byte-match the straightforward
    per-token greedy loop on randomized inputs."""
    import numpy as np
    import pyarrow as pa

    from logpipe_ray.functions.tokens import BOS_ID, EOS_ID, PAD_ID, pack_batch

    rng = np.random.default_rng(5)
    for trial in range(5):
        CL = int(rng.integers(16, 64))
        n = int(rng.integers(1, 60))
        seqs = [
            list(rng.integers(3, 100, rng.integers(0, CL + 10)))
            for _ in range(n)
        ]
        ids = list(range(n))
        t = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "tokens": pa.array(
                    [[int(x) for x in s] for s in seqs], pa.list_(pa.int32())
                ),
            }
        )
        got = pack_batch(t, context_len=CL)

        # reference greedy loop (the pre-vectorization implementation)
        contexts, members, truncated = [], [], []
        cur, cur_ids, cur_trunc = [], [], 0
        maxp = CL - 2
        for doc_id, seq in zip(ids, seqs):
            bodyseq = seq[:maxp]
            need = len(bodyseq) + 2
            if cur and len(cur) + need > CL:
                contexts.append(cur + [PAD_ID] * (CL - len(cur)))
                members.append(cur_ids)
                truncated.append(cur_trunc)
                cur, cur_ids, cur_trunc = [], [], 0
            cur += [BOS_ID, *bodyseq, EOS_ID]
            cur_ids.append(doc_id)
            cur_trunc += int(len(seq) > maxp)
        if cur:
            contexts.append(cur + [PAD_ID] * (CL - len(cur)))
            members.append(cur_ids)
            truncated.append(cur_trunc)

        assert got["context_tokens"].to_pylist() == contexts
        assert got["doc_ids"].to_pylist() == members
        assert got["truncated"].to_pylist() == truncated
        assert got["n_seqs"].to_pylist() == [len(m) for m in members]


def test_bigram_frequency_matches_python(ray_session):
    import collections

    import ray.data as rd

    from logpipe_ray.functions.tokens import bigram_frequency

    rng = np.random.default_rng(9)
    seqs = [list(map(int, rng.integers(3, 20, rng.integers(0, 30)))) for _ in range(200)]
    t = pa.table({"tokens": pa.array(seqs, pa.list_(pa.int32()))})
    got = bigram_frequency(rd.from_arrow(t).repartition(4)).to_pandas()
    want = collections.Counter(
        (s[i], s[i + 1]) for s in seqs for i in range(len(s) - 1)
    )
    got_map = {(r.t1, r.t2): r.cnt for r in got.itertuples()}
    assert got_map == dict(want)


def test_prune_vocab_matches_python(ray_session):
    import collections

    import ray.data as rd

    from logpipe_ray.functions.tokens import prune_vocab

    rng = np.random.default_rng(12)
    seqs = [list(map(int, rng.integers(3, 40, rng.integers(0, 30)))) for _ in range(300)]
    t = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "tokens": pa.array(seqs, pa.list_(pa.int32())),
        }
    )
    out = (
        prune_vocab(rd.from_arrow(t).repartition(4), vocab_size=10)
        .to_pandas()
        .set_index("doc_id")
    )
    freq = collections.Counter(x for s in seqs for x in s)
    keep = set(
        tid for tid, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    )
    for i in (0, 100, 299):
        want = [x if x in keep else 0 for x in seqs[i]]
        assert list(out.loc[i, "tokens"]) == want


@pytest.mark.slow
def test_pack_stats_sql_oracle_sf0001(ray_session):
    """Continuously prove the greedy-packing SQL equivalence at small
    scale (VERDICT r2 #10): replay first-fit packing in a DuckDB
    recursive CTE over the same shard files and compare per-context
    stats exactly. O(rows_per_shard) CTE iterations x table joins —
    proven-but-prohibitive beyond sf0.001, hence the registry entry
    stays rows-only."""
    import duckdb

    from logpipe_ray.fixtures.generator import ensure_sequences
    from logpipe_ray.queries import seq_pack_stats

    sf_dir = "/root/testdata/sf0.001"
    seq_dir = ensure_sequences(sf_dir)
    got = (
        seq_pack_stats(sf_dir)
        .to_pandas()
        .sort_values(["n_seqs", "fill_ratio", "truncated"], ignore_index=True)
    )
    want = duckdb.sql(
        f"""
WITH RECURSIVE seq AS MATERIALIZED (
  SELECT filename AS shard, file_row_number AS rn,
         least(coalesce(len(tokens), 0), 1022) + 2 AS need,
         CASE WHEN coalesce(len(tokens), 0) > 1022 THEN 1 ELSE 0 END AS tr
  FROM read_parquet('{seq_dir}/shard_*.parquet',
                    filename=true, file_row_number=true)
),
walk AS (
  SELECT shard, rn, need, tr, CAST(0 AS BIGINT) AS ctx, need AS off
  FROM seq WHERE rn = 0
  UNION ALL
  SELECT s.shard, s.rn, s.need, s.tr,
         CASE WHEN w.off + s.need > 1024 THEN w.ctx + 1 ELSE w.ctx END,
         CASE WHEN w.off + s.need > 1024 THEN s.need ELSE w.off + s.need END
  FROM walk w JOIN seq s ON s.shard = w.shard AND s.rn = w.rn + 1
)
SELECT CAST(count(*) AS INTEGER) AS n_seqs,
       CAST(sum(need) AS DOUBLE) / 1024 AS fill_ratio,
       CAST(sum(tr) AS INTEGER) AS truncated
FROM walk GROUP BY shard, ctx
ORDER BY n_seqs, fill_ratio, truncated
"""
    ).df()
    assert len(got) == len(want)
    assert (got["n_seqs"].to_numpy() == want["n_seqs"].to_numpy()).all()
    assert (got["truncated"].to_numpy() == want["truncated"].to_numpy()).all()
    assert np.allclose(
        got["fill_ratio"].to_numpy(), want["fill_ratio"].to_numpy(), atol=1e-12
    )
