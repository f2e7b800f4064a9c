import json

import pyarrow as pa
import pytest

import ray.data as rd

from logpipe_ray.api import Pipeline
from logpipe_ray.stages.aggregate import bounded_partial_counts, custom_aggregate
from logpipe_ray.stages.transform import map_preserving, sha256_iterated


def test_pipeline_end_to_end(ray_session, tiny_sequences):
    df = (
        Pipeline.read(tiny_sequences + "/shard_0000.parquet")
        .parse_tokens()
        .enrich()
        .route()
        .filter({"level": "ERROR"})
        .select(["doc_id", "level", "error_code", "meta.env"])
        .to_pandas()
    )
    assert set(df.columns) == {"doc_id", "level", "error_code", "meta_env"}
    assert (df["level"] == "ERROR").all()
    assert len(df) > 0


def test_pipeline_count_and_stats(ray_session, tiny_sequences):
    p = Pipeline.read(tiny_sequences).parse_tokens()
    counts = p.count_by("level").to_pandas()
    assert set(counts["level"]) == {"INFO", "WARN", "ERROR"}
    stats = p.stats("level", "response_time", prefix="rt").to_pandas()
    assert {"cnt_rt", "sum_rt", "min_rt", "max_rt", "avg_rt"} <= set(stats.columns)


def test_pipeline_custom_map_and_stateful(ray_session):
    ds = rd.range(100).map_batches(
        lambda t: t.rename_columns(["v"]), batch_format="pyarrow"
    )

    def double(t: pa.Table) -> pa.Table:
        return t.append_column("v2", pa.compute.multiply(t["v"], 2))

    class AddConst:
        def __init__(self, c=5):
            self.c = c

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.append_column("vc", pa.compute.add(t["v"], self.c))

    df = (
        Pipeline.from_dataset(ds).map(double).map_stateful(AddConst, c=7).to_pandas()
    )
    assert (df["v2"] == df["v"] * 2).all()
    assert (df["vc"] == df["v"] + 7).all()


def test_map_preserving_falls_back_per_row():
    def bad_on_even(t: pa.Table) -> pa.Table:
        if any(v % 2 == 0 for v in t["v"].to_pylist()):
            raise ValueError("even!")
        return t.append_column("ok", pa.array([True] * t.num_rows))

    t = pa.table({"v": [1, 2, 3]})
    out = map_preserving(bad_on_even)(t)
    assert out.num_rows == 3  # batch preserved despite failures


def test_sha256_iterated_known_value():
    import hashlib

    t = pa.table({"x": ["abc"]})
    out = sha256_iterated("x", iterations=2)(t)
    h = hashlib.sha256(b"abc").digest()
    h = hashlib.sha256(h).digest()
    assert out["x_hash"][0].as_py() == h.hex()


def test_custom_aggregate(ray_session):
    ds = rd.from_items(
        [{"k": "a", "v": 1}, {"k": "b", "v": 10}, {"k": "a", "v": 3}] * 10
    )
    out = custom_aggregate(
        ds,
        "k",
        init=lambda: {"s": 0, "n": 0},
        accumulate=lambda st, g: {"s": st["s"] + g["v"].sum(), "n": st["n"] + len(g)},
        merge=lambda a, b: {"s": a["s"] + b["s"], "n": a["n"] + b["n"]},
        finalize=lambda st: {"total": int(st["s"]), "cnt": int(st["n"])},
    ).to_pandas()
    got = {r["k"]: (r["total"], r["cnt"]) for _, r in out.iterrows()}
    assert got == {"a": (40, 20), "b": (100, 10)}


def test_bounded_partial_counts_exact_after_merge(ray_session):
    ds = rd.from_items([{"k": f"k{i % 37}"} for i in range(500)])
    partials = ds.map_batches(
        bounded_partial_counts("k", max_groups=10), batch_format="pyarrow"
    )
    merged = partials.groupby("k").sum("partial_count").to_pandas()
    assert len(merged) == 37
    assert merged["sum(partial_count)"].sum() == 500


def test_cli_run_and_flagship(ray_session, tiny_sequences, tmp_path, capsys):
    from logpipe_ray.cli import main

    rc = main(
        [
            "run",
            tiny_sequences + "/shard_0001.parquet",
            "--parse-tokens",
            "--count-by",
            "level",
            "--sink",
            "console",
            "--limit",
            "5",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert '"sink": "console"' in out

    out_dir = str(tmp_path / "cli_flag")
    rc = main(["flagship", tiny_sequences, out_dir, "--checkpoint-groups", "2"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert data["rows_in"] == 2000


def test_pipeline_round3_operator_methods(ray_session):
    """The fluent Pipeline surface exposes the round-3 operator
    families; spot-check validate / latest_by / global_top_k /
    chunk_text / join_dim / join_window end to end."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.api import Pipeline

    t = pa.table(
        {
            "k": [1, 1, 2, 2, 3],
            "ts": [10, 20, 5, 7, 1],
            "v": [1.0, 2.0, 3.0, None, 5.0],
        }
    )
    p = Pipeline.from_dataset(rd.from_arrow(t))

    rep = p.validate([{"col": "v", "check": "not_null"}]).to_pandas()
    assert rep["n_violations"].tolist() == [1]

    latest = p.latest_by("k", ["ts"]).to_pandas().sort_values("k")
    assert latest["ts"].tolist() == [20, 7, 1]

    got = p.global_top_k("ts", "k", 2).to_pandas()
    assert sorted(got["ts"]) == [10, 20]

    docs = Pipeline.from_dataset(
        rd.from_arrow(pa.table({"doc_id": [1], "text": ["a b c d e"]}))
    )
    ch = docs.chunk_text(chunk_words=3, overlap=1).to_pandas()
    assert ch["chunk_text"].tolist() == ["a b c", "c d e"]

    dim = rd.from_arrow(pa.table({"dk": [1, 2], "lab": ["x", "y"]}))
    j = p.join_dim(dim, "k", "dk", ["lab"], hot_threshold=100).to_pandas()
    assert sorted(j["lab"]) == ["x", "x", "y", "y"]

    right = Pipeline.from_dataset(
        rd.from_arrow(pa.table({"k": [1, 1], "rts": [8, 19], "rid": [100, 101]}))
    )
    w = p.join_window(right, "k", "ts", "rts", window_us=5).to_pandas()
    # ts=10 matches rts=8 (within 5 back); ts=20 matches rts=19
    assert sorted(zip(w["ts"], w["rid"])) == [(10, 100), (20, 101)]


def test_pipeline_round4_operator_methods(ray_session):
    """The fluent surface exposes the round-4 families: sample_weighted /
    split / bigram_lift / pca."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.api import Pipeline

    docs = Pipeline.from_dataset(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": list(range(100)),
                    "w": [10 + (i % 90) for i in range(100)],
                }
            )
        )
    )
    s = docs.sample_weighted("doc_id", "w", w_cap=80, rate_pct=60).to_pandas()
    assert 0 < len(s) < 100

    sp = docs.split("doc_id").to_pandas()
    assert set(sp["split"]) <= {"train", "val", "test"} and len(sp) == 100

    toks = Pipeline.from_dataset(
        rd.from_arrow(
            pa.table(
                {"tokens": pa.array([[1, 2, 1, 2, 1]] * 40, pa.list_(pa.int32()))}
            )
        )
    )
    lift = toks.bigram_lift(k=5, min_count=2).to_pandas()
    assert len(lift) == 2  # (1,2) and (2,1)

    vecs = Pipeline.from_dataset(
        rd.from_arrow(
            pa.table(
                {
                    "vec_id": list(range(50)),
                    "embedding": pa.array(
                        np.random.default_rng(3).normal(size=(50, 8)).tolist(),
                        pa.list_(pa.float64()),
                    ),
                }
            )
        )
    )
    pcs = vecs.pca("embedding", "vec_id", k=2).to_pandas()
    assert list(pcs.columns) == ["vec_id", "pc1", "pc2"] and len(pcs) == 50
