import glob
import os

import pyarrow.parquet as pq
import pytest

import ray.data as rd

from logpipe_ray.pipelines.flagship import build_pipeline, run_flagship, sink_counts
from logpipe_ray.stages.aggregate import count_groupby, stats_groupby
from logpipe_ray.tokenizer import detokenize

from oracle import run as oracle_run


@pytest.fixture(scope="module")
def oracle_expected(tiny_sequences):
    rows = []
    for f in sorted(glob.glob(os.path.join(tiny_sequences, "*.parquet"))):
        t = pq.read_table(f)
        lines = detokenize(t["tokens"]).to_pylist()
        for d, l, s in zip(t["doc_id"].to_pylist(), lines, t["source"].to_pylist()):
            rows.append({"doc_id": d, "line": l, "source": s})
    return oracle_run(rows)


def test_e2e_counts_and_row_sets(ray_session, tiny_sequences, oracle_expected, tmp_path):
    out_dir = str(tmp_path / "out")
    summary = run_flagship(tiny_sequences, out_dir, checkpoint_groups=2)
    assert summary["rows_in"] == 2000
    assert summary["rows_out"] == 2000  # routing loses no rows
    got = {
        tuple(k.split("/")): v for k, v in summary["sink_counts"].items()
    }
    assert got == oracle_expected["counts"]

    # routed-row set equality + token-array equality per sink
    orig = {}
    for f in sorted(glob.glob(os.path.join(tiny_sequences, "*.parquet"))):
        t = pq.read_table(f)
        for d, tk in zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()):
            orig[d] = tk
    for sink, expected_docs in oracle_expected["sink_docs"].items():
        files = glob.glob(
            os.path.join(out_dir, "data", "group=*", "shard=*", f"sink={sink}", "*.parquet")
        )
        assert files, f"no output for sink {sink}"
        t = pq.read_table(files)
        docs = t["doc_id"].to_pylist()
        assert set(docs) == expected_docs, sink
        for d, tk in zip(docs, t["tokens"].to_pylist()):
            assert tk == orig[d], f"token mismatch for {d} in {sink}"


def test_dataset_mode_counts_match(ray_session, tiny_sequences, oracle_expected, tmp_path):
    out_dir = str(tmp_path / "ds_mode")
    summary = run_flagship(
        tiny_sequences, out_dir, checkpoint_groups=1, mode="dataset"
    )
    got = {tuple(k.split("/")): v for k, v in summary["sink_counts"].items()}
    assert got == oracle_expected["counts"]


def test_null_sink_counts_match(ray_session, tiny_sequences, oracle_expected, tmp_path):
    out_dir = str(tmp_path / "null_sink")
    summary = run_flagship(
        tiny_sequences, out_dir, checkpoint_groups=1, write_sinks=False
    )
    got = {tuple(k.split("/")): v for k, v in summary["sink_counts"].items()}
    assert got == oracle_expected["counts"]
    assert not os.path.exists(os.path.join(out_dir, "data", "group=g0000", "shard=0000"))


def test_aggregates_match_oracle(ray_session, tiny_sequences, oracle_expected):
    ds = build_pipeline(rd.read_parquet(tiny_sequences))
    lc = count_groupby(ds, ["level"], alias="cnt").to_pandas()
    got = dict(zip(lc["level"], lc["cnt"]))
    assert got == oracle_expected["level_counts"]

    st = stats_groupby(ds, "level", "response_time", prefix="rt").to_pandas()
    for _, row in st.iterrows():
        exp = oracle_expected["stats"][row["level"]]
        assert row["cnt_rt"] == exp["cnt"]
        assert row["sum_rt"] == exp["sum"]
        assert row["min_rt"] == exp["min"]
        assert row["max_rt"] == exp["max"]
        assert row["avg_rt"] == pytest.approx(exp["avg"])


def test_resume_equivalence(ray_session, tiny_sequences, oracle_expected, tmp_path):
    out_a = str(tmp_path / "uninterrupted")
    out_b = str(tmp_path / "interrupted")
    sa = run_flagship(tiny_sequences, out_a, checkpoint_groups=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_flagship(tiny_sequences, out_b, checkpoint_groups=4, fail_after_groups=2)
    sb = run_flagship(tiny_sequences, out_b, checkpoint_groups=4)  # resume
    assert sb["sink_counts"] == sa["sink_counts"]
    assert sb["rows_in"] == sa["rows_in"] == 2000

    def doc_sets(out_dir):
        result = {}
        for sink in oracle_expected["sink_docs"]:
            files = glob.glob(
                os.path.join(out_dir, "data", "group=*", "shard=*", f"sink={sink}", "*.parquet")
            )
            result[sink] = set(pq.read_table(files)["doc_id"].to_pylist())
        return result

    assert doc_sets(out_a) == doc_sets(out_b)


def test_resume_with_different_group_count(
    ray_session, tiny_sequences, oracle_expected, tmp_path
):
    """Resume is file-based: changing checkpoint_groups between the
    crashed run and the resume must not drop or double-process shards."""
    import json

    out = str(tmp_path / "regroup")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_flagship(tiny_sequences, out, checkpoint_groups=4, fail_after_groups=2)
    s = run_flagship(tiny_sequences, out, checkpoint_groups=2)  # different k
    assert s["rows_in"] == 2000 and s["rows_out"] == 2000
    got = {tuple(k.split("/")): v for k, v in s["sink_counts"].items()}
    assert got == oracle_expected["counts"]
    m = json.load(open(os.path.join(out, "manifest.json")))
    all_files = [f for e in m["groups"].values() for f in e["input_files"]]
    assert len(all_files) == len(set(all_files))  # nothing double-processed


def test_sink_projections(ray_session, tiny_sequences, tmp_path):
    """Per-sink column projection: the dead-letter sink keeps only the
    lineage columns."""
    out = str(tmp_path / "proj")
    run_flagship(
        tiny_sequences, out, checkpoint_groups=1,
        sink_projections={"deadletter": ["doc_id", "tokens", "n_tok", "source"]},
    )
    dl = glob.glob(os.path.join(out, "data", "**", "sink=deadletter", "*.parquet"),
                   recursive=True)
    assert dl
    schema = pq.read_schema(dl[0])
    assert schema.names == ["doc_id", "tokens", "n_tok", "source"]
    other = glob.glob(os.path.join(out, "data", "**", "sink=errors", "*.parquet"),
                      recursive=True)
    assert len(pq.read_schema(other[0]).names) > 10  # full record elsewhere


def test_incremental_ingestion_of_new_shards(ray_session, tmp_path):
    """Continuous-ingestion shape: shards landing AFTER a completed run
    are picked up by a simple rerun (file-based resume), without
    reprocessing the old shards."""
    import json
    import shutil

    from logpipe_ray.fixtures.generator import generate_shard
    import pyarrow.parquet as pq2

    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    for s in range(2):
        pq2.write_table(
            generate_shard(s, 500, s * 500, 777), str(in_dir / f"shard_{s:04d}.parquet")
        )
    out = str(tmp_path / "out")
    s1 = run_flagship(str(in_dir), out, checkpoint_groups=1)
    assert s1["rows_in"] == 1000
    m1 = json.load(open(os.path.join(out, "manifest.json")))

    # two new shards land; rerun the same command
    for s in (2, 3):
        pq2.write_table(
            generate_shard(s, 500, s * 500, 777), str(in_dir / f"shard_{s:04d}.parquet")
        )
    s2 = run_flagship(str(in_dir), out, checkpoint_groups=1)
    assert s2["rows_in"] == 2000 and s2["rows_out"] == 2000
    m2 = json.load(open(os.path.join(out, "manifest.json")))
    # old group untouched, exactly one new group with only the new files
    assert set(m1["groups"]) < set(m2["groups"])
    new_gids = set(m2["groups"]) - set(m1["groups"])
    assert len(new_gids) == 1
    new_files = m2["groups"][new_gids.pop()]["input_files"]
    assert all("shard_0002" in f or "shard_0003" in f for f in new_files)


def test_sink_counts_dataset(ray_session, tiny_sequences, oracle_expected):
    ds = build_pipeline(rd.read_parquet(tiny_sequences))
    df = sink_counts(ds).to_pandas()
    got = {(r["source"], r["sink"]): r["cnt"] for _, r in df.iterrows()}
    assert got == oracle_expected["counts"]


def test_flagship_graceful_sigint(ray_session, tmp_path):
    """SIGINT mid-run: the in-flight group finishes + commits, the run
    returns interrupted=True, and a resume run completes the rest with
    totals identical to an uninterrupted run (reference
    checkpointManager.js:94-105 semantics, group-granular)."""
    import os
    import signal
    import threading

    from logpipe_ray.fixtures.generator import ensure_sequences
    from logpipe_ray.pipelines.flagship import run_flagship

    seq = ensure_sequences("/root/testdata/sf0.001")
    out_dir = str(tmp_path / "o")

    t = threading.Timer(0.3, os.kill, (os.getpid(), signal.SIGINT))
    t.start()
    try:
        first = run_flagship(
            seq, out_dir, write_sinks=False, checkpoint_groups=8,
            install_signal_handler=True,
        )
    finally:
        t.cancel()
    # whether the signal landed mid-run or the run finished first, the
    # manifest must be consistent; if interrupted, resume finishes it
    if first.get("interrupted"):
        assert 0 < first["groups"] < 8
        resumed = run_flagship(seq, out_dir, write_sinks=False,
                               checkpoint_groups=8)
        assert "interrupted" not in resumed
        full = run_flagship(seq, str(tmp_path / "ref"), write_sinks=False)
        assert resumed["sink_counts"] == full["sink_counts"]
        assert resumed["rows_in"] == full["rows_in"]
