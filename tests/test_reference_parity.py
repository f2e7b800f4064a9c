"""Parity against the reference's OWN checked-in fixtures
(/root/reference/data — read-only inputs): our engine's operators must
produce the same results a correct implementation of the reference's
transformer semantics produces on the reference's data.
"""

import csv
import json
import os

import pytest

from logpipe_ray.sources.factory import read_logs_csv, read_logs_ndjson_lenient
from logpipe_ray.stages.transform import make_filter, select_fields

REF_DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not present"
)


@pytest.fixture(scope="module")
def ref_records():
    recs = []
    with open(f"{REF_DATA}/logs.ndjson") as f:
        for line in f:
            if line.strip():
                recs.append(json.loads(line))
    return recs


def test_ndjson_rowcount_and_fields(ray_session, ref_records):
    ds = read_logs_ndjson_lenient(f"{REF_DATA}/logs.ndjson")
    df = ds.to_pandas()
    assert len(df) == len(ref_records) == 1000
    assert sorted(df["message"]) == sorted(r["message"] for r in ref_records)


def test_filter_and_countby_match_reference_semantics(ray_session, ref_records):
    ds = read_logs_ndjson_lenient(f"{REF_DATA}/logs.ndjson")
    # reference CLI: --filter level:ERROR (string equality conjunction)
    flt = ds.map_batches(make_filter({"level": "ERROR"}), batch_format="pyarrow")
    exp_err = [r for r in ref_records if r.get("level") == "ERROR"]
    assert flt.count() == len(exp_err)
    # --filter level:ERROR service:auth conjunction
    flt2 = ds.map_batches(
        make_filter({"level": "ERROR", "service": "auth"}), batch_format="pyarrow"
    )
    assert flt2.count() == len([r for r in exp_err if r["service"] == "auth"])
    # --count-by level
    from logpipe_ray.stages.aggregate import count_groupby

    counts = count_groupby(ds, ["level"], alias="cnt").to_pandas()
    got = dict(zip(counts["level"], counts["cnt"]))
    exp = {}
    for r in ref_records:
        exp[r["level"]] = exp.get(r["level"], 0) + 1
    assert got == exp


def test_stats_match_reference_semantics(ray_session, ref_records):
    from logpipe_ray.stages.aggregate import stats_groupby

    ds = read_logs_ndjson_lenient(f"{REF_DATA}/logs.ndjson")
    st = stats_groupby(ds, "level", "responseTime", prefix="rt").to_pandas()
    for _, row in st.iterrows():
        vals = [
            r["responseTime"] for r in ref_records if r["level"] == row["level"]
        ]
        assert row["cnt_rt"] == len(vals)
        assert row["sum_rt"] == sum(vals)
        assert row["min_rt"] == min(vals)
        assert row["max_rt"] == max(vals)
        assert row["avg_rt"] == pytest.approx(sum(vals) / len(vals))


def test_select_nested_paths(ray_session, ref_records):
    ds = read_logs_ndjson_lenient(f"{REF_DATA}/logs.ndjson")
    sel = ds.map_batches(
        select_fields(["timestamp", "level", "meta.env"]), batch_format="pyarrow"
    ).to_pandas()
    assert list(sel.columns) == ["timestamp", "level", "meta_env"]
    assert sorted(sel["meta_env"]) == sorted(r["meta"]["env"] for r in ref_records)


def test_malformed_lines_skipped_like_reference(ray_session):
    with open(f"{REF_DATA}/logs_with_errors.ndjson") as f:
        lines = f.read().splitlines()
    valid = 0
    for line in lines:
        if not line.strip():
            continue
        try:
            if isinstance(json.loads(line), dict):
                valid += 1
        except Exception:
            pass
    ds = read_logs_ndjson_lenient(f"{REF_DATA}/logs_with_errors.ndjson")
    assert ds.count() == valid
    assert valid < len(lines)  # the file really does contain bad lines


def test_csv_reference_all_strings(ray_session):
    with open(f"{REF_DATA}/logs.csv") as f:
        rows = list(csv.DictReader(f, delimiter=";"))
    df = read_logs_csv(f"{REF_DATA}/logs.csv", typed=False).to_pandas()
    assert len(df) == len(rows) == 800
    # csv-parser semantics: everything a string, empty string for null
    assert df["status"].dtype == object
    assert sorted(df["message"]) == sorted(r["message"] for r in rows)
