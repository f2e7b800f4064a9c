"""Schema-harmonizing reader + shard compaction (late round 3)."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_read_parquet_harmonized_drifted_schemas(ray_session, tmp_path):
    pq.write_table(
        pa.table({"a": pa.array([1, 2], pa.int64()), "b": ["x", "y"]}),
        tmp_path / "old.parquet",
    )
    pq.write_table(
        pa.table(
            {"a": pa.array([3, 4], pa.int32()), "c": [1.0, 2.0]}
        ),  # re-typed a, dropped b, added c
        tmp_path / "new.parquet",
    )
    from logpipe_ray.sources.factory import read_parquet_harmonized

    target = pa.schema(
        [("a", pa.int64()), ("b", pa.string()), ("d", pa.float64())]
    )
    out = (
        read_parquet_harmonized(str(tmp_path), target)
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["a", "b", "d"]
    assert out["a"].tolist() == [1, 2, 3, 4]
    assert out["b"].tolist()[:2] == ["x", "y"]
    assert out["b"].isna().tolist() == [False, False, True, True]
    assert out["d"].isna().all()  # column never existed -> typed nulls


def test_compact_shards_roundtrip(ray_session, tmp_path):
    src = tmp_path / "tiny"
    src.mkdir()
    for i in range(20):
        pq.write_table(
            pa.table({"v": pa.array(range(i * 10, i * 10 + 10), pa.int64())}),
            src / f"part_{i:03d}.parquet",
        )
    from logpipe_ray.sources.factory import compact_shards, read_parquet_clean

    out = tmp_path / "compact"
    stats = compact_shards(str(src), str(out), target_rows_per_file=100)
    assert stats == {"files_in": 20, "files_out": 2, "rows": 200}
    vals = sorted(read_parquet_clean(str(out)).to_pandas()["v"])
    assert vals == list(range(200))


def test_read_parquet_filter_pushdown_exact(ray_session, tmp_path):
    """The filter= expression forwarded by read_parquet_clean filters
    EXACTLY (row-level, not just row-group statistics), across
    multiple row groups."""
    import pyarrow as pa
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from logpipe_ray.sources.factory import read_parquet_clean

    t = pa.table({"x": list(range(1000)), "y": [i % 7 for i in range(1000)]})
    p = str(tmp_path / "rg.parquet")
    pq.write_table(t, p, row_group_size=100)
    assert pq.ParquetFile(p).num_row_groups == 10

    out = read_parquet_clean(p, filter=(pds.field("x") >= 437)).to_pandas()
    assert sorted(out.x) == list(range(437, 1000))
    assert (out.y == out.x % 7).all()


def test_cluster_write_pruned_read_roundtrip(ray_session, tmp_path):
    """Range-clustered layout: balanced files from exact quantile
    bounds, zone map records true min/max, pruned_read touches only
    overlapping files, and the filtered union equals a full-scan
    filter — including boundary values."""
    import json

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.sources.layout import cluster_write, pruned_read

    rng = np.random.default_rng(13)
    v = np.concatenate([rng.normal(0, 100, 9000), [250.0, 100.0]])
    ids = np.arange(len(v))
    ds = rd.from_arrow(pa.table({"id": ids, "value": v})).repartition(6)
    out = str(tmp_path / "layout")
    zm = cluster_write(ds, "value", out, n_ranges=8)
    assert len(zm) == 8
    rows = [r for (_, _, r) in zm.values()]
    assert max(rows) - min(rows) <= 2  # balanced by exact selection
    meta = json.load(open(f"{out}/zonemap.json"))
    # zones are disjoint and ordered by construction
    zs = sorted(meta["zones"].values(), key=lambda z: z[0])
    for a, b in zip(zs, zs[1:]):
        assert a[1] <= b[0]

    pruned, stats = pruned_read(out, lo=100.0, hi=250.0)
    assert stats["files_read"] < stats["files_total"]
    got = pruned.to_pandas().sort_values("id")
    m = (v >= 100.0) & (v <= 250.0)
    assert got["id"].tolist() == ids[m].tolist()
    assert np.array_equal(got["value"].to_numpy(), v[m])

    # unbounded side + no-overlap guard
    left, st2 = pruned_read(out, hi=-350.0) if (v <= -350).any() else (None, None)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no file overlaps"):
        pruned_read(out, lo=1e12)


def test_cluster_write_heavy_ties_collapse_bounds(ray_session, tmp_path):
    """A column dominated by one value collapses duplicate quantile
    bounds instead of emitting empty ranges; pruning stays exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.sources.layout import cluster_write, pruned_read

    v = np.concatenate([np.full(5000, 7.0), np.arange(100, dtype=np.float64)])
    ds = rd.from_arrow(
        pa.table({"id": np.arange(len(v)), "value": v})
    ).repartition(4)
    out = str(tmp_path / "ties")
    zm = cluster_write(ds, "value", out, n_ranges=8)
    assert 1 <= len(zm) <= 8  # collapsed, no empty ranges
    pruned, stats = pruned_read(out, lo=7.0, hi=7.0)
    got = pruned.to_pandas()
    assert len(got) == (v == 7.0).sum()
    assert (got["value"] == 7.0).all()


def test_cluster_write_integer_column_zonemap(ray_session, tmp_path):
    """Zone-map values from an INTEGER clustering column must survive
    json.dump (np.int64 is not JSON-serializable — only float columns
    worked by accident of np.float64 subclassing float)."""
    import json
    import numpy as np
    import ray.data as rd

    from logpipe_ray.sources.layout import ZONEMAP_NAME, cluster_write, pruned_read

    rng = np.random.default_rng(9)
    v = rng.integers(-1000, 1000, 5000)
    ds = rd.from_arrow(
        pa.table({"value": v, "id": np.arange(len(v))})
    ).repartition(4)
    out = str(tmp_path / "clustered_int")
    zm = cluster_write(ds, "value", out, n_ranges=6)
    with open(f"{out}/{ZONEMAP_NAME}") as f:
        disk = json.load(f)
    assert disk["zones"].keys() == zm.keys()
    for lo, hi, rows in disk["zones"].values():
        assert isinstance(lo, int) and isinstance(hi, int)
    pruned, stats = pruned_read(out, lo=0, hi=100)
    got = pruned.to_pandas()["value"].to_numpy()
    want = v[(v >= 0) & (v <= 100)]
    assert sorted(got.tolist()) == sorted(want.tolist())
    assert stats["files_read"] < stats["files_total"]


def test_orc_feather_roundtrip_and_sniffing(ray_session, tmp_path):
    """write_files -> read_any roundtrip for ORC and Feather: data
    equality, extension sniffing, manifest rows, idempotent re-write
    (content-addressed names: re-running writes the same files)."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.sources.factory import read_any, write_files

    rng = np.random.default_rng(21)
    t = pa.table(
        {
            "id": pa.array(np.arange(1000), pa.int64()),
            "v": pa.array(rng.normal(size=1000)),
            "s": pa.array([f"s{i % 7}" for i in range(1000)]),
        }
    )
    for fmt in ("orc", "feather"):
        out = str(tmp_path / fmt)
        manifest = write_files(
            rd.from_arrow(t).repartition(4), out, fmt=fmt
        ).to_pandas()
        assert manifest["rows"].sum() == 1000
        assert len(manifest) == 4
        back = read_any(out).to_pandas().sort_values("id", ignore_index=True)
        assert back["id"].tolist() == list(range(1000))
        assert back["s"].tolist() == t["s"].to_pylist()
        assert np.allclose(back["v"].to_numpy(), t["v"].to_numpy())
        # idempotent: same content -> same names, no duplicate files
        import os

        before = sorted(os.listdir(out))
        write_files(rd.from_arrow(t).repartition(4), out, fmt=fmt).to_pandas()
        assert sorted(os.listdir(out)) == before
