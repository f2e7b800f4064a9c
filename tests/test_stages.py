import json

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from logpipe_ray.fixtures.generator import generate_shard
from logpipe_ray.stages.enrich import EnrichStage
from logpipe_ray.stages.parse import parse_batch
from logpipe_ray.stages.route import route_batch
from logpipe_ray.stages.transform import (
    add_constant_fields,
    add_fields,
    hash_column,
    make_filter,
    rename_fields,
    select_fields,
)
from logpipe_ray.tokenizer import detokenize

from oracle import enrich as oracle_enrich, parse_line, route as oracle_route


@pytest.fixture(scope="module")
def routed():
    tbl = generate_shard(0, 2000, 0, 999)
    return tbl, route_batch(EnrichStage()(parse_batch(tbl)))


def test_parse_matches_json_oracle(routed):
    tbl, out = routed
    lines = detokenize(tbl["tokens"]).to_pylist()
    for i, line in enumerate(lines):
        rec = parse_line(line)
        assert out["parse_ok"][i].as_py() == (rec is not None)
        if rec is None:
            assert out["level"][i].as_py() is None
            assert out["status"][i].as_py() is None
            continue
        assert out["level"][i].as_py() == rec["level"]
        assert out["status"][i].as_py() == rec["status"]
        assert out["response_time"][i].as_py() == rec["responseTime"]
        assert out["user_id"][i].as_py() == rec.get("userId")
        assert out["session_id"][i].as_py() == rec.get("sessionId")
        assert out["payload_size"][i].as_py() == rec.get("payloadSize")
        assert out["tags"][i].as_py() == rec.get("tags")
        assert out["meta"][i].as_py() == rec["meta"]
        assert out["error_code"][i].as_py() == rec.get("errorCode")


def test_enrich_route_match_oracle(routed):
    tbl, out = routed
    lines = detokenize(tbl["tokens"]).to_pylist()
    for i, line in enumerate(lines):
        rec = parse_line(line)
        src = tbl["source"][i].as_py()
        assert out["sink"][i].as_py() == oracle_route(rec, src)
        if rec is not None:
            erec = oracle_enrich(rec)
            assert out["geo"][i].as_py() == erec["geo"]
            assert out["severity"][i].as_py() == erec["severity"]


def test_tokens_passthrough(routed):
    tbl, out = routed
    assert out["tokens"].combine_chunks().equals(tbl["tokens"].combine_chunks())
    assert out["doc_id"].combine_chunks().equals(tbl["doc_id"].combine_chunks())


def test_filter_conjunction_and_regex(routed):
    _, out = routed
    f = make_filter({"level": "ERROR", "method": "POST"})
    got = f(out)
    assert got.num_rows > 0
    assert set(got["level"].to_pylist()) == {"ERROR"}
    assert set(got["method"].to_pylist()) == {"POST"}
    # regex mode + anti-filter
    f2 = make_filter({"message": "~timeout"})
    got2 = f2(out)
    assert all("timeout" in m for m in got2["message"].to_pylist())
    f3 = make_filter({"message": "~timeout"}, include_matches=False)
    assert f3(out).num_rows == out.num_rows - got2.num_rows
    # dot-path into struct
    f4 = make_filter({"meta.env": "prod"})
    assert all(m["env"] == "prod" for m in f4(out)["meta"].to_pylist())
    # custom vectorized predicate over the batch
    f5 = make_filter(lambda b: pc.greater(b["status"], 499))
    assert all(s >= 500 for s in f5(out)["status"].to_pylist())


def test_filter_tilde_escape_and_structured_regex():
    import pyarrow as pa

    batch = pa.table({"name": ["~literal", "plain", "~other", "xliteral"]})
    # bare '~' prefix is a regex...
    assert make_filter({"name": "~lit"})(batch).num_rows == 2
    # ...'\~' escapes to literal equality on a value starting with '~'
    got = make_filter({"name": "\\~literal"})(batch)
    assert got["name"].to_pylist() == ["~literal"]
    # structured regex form is unambiguous regardless of prefix
    got2 = make_filter({"name": {"re": "^~"}})(batch)
    assert got2["name"].to_pylist() == ["~literal", "~other"]


def test_select_rename_add(routed):
    _, out = routed
    sel = select_fields(["doc_id", "meta.env", "missing_col", "level"])(out)
    assert sel.column_names == ["doc_id", "meta_env", "level"]
    ren = rename_fields({"level": "lvl"})(sel)
    assert "lvl" in ren.column_names and "level" not in ren.column_names
    added = add_fields(
        {
            "status_class": lambda b: pc.multiply(
                pc.divide(b["status"], 100), 100
            ),
            "broken": lambda b: (_ for _ in ()).throw(ValueError("boom")),
        }
    )(out)
    assert "status_class" in added.column_names
    assert "broken" not in added.column_names  # bad field skipped, batch passes
    const = add_constant_fields({"version": "1.0"})(sel)
    assert set(const["version"].to_pylist()) == {"1.0"}


def test_hash_column_deterministic(routed):
    _, out = routed
    h1 = hash_column("doc_id")(out)["doc_id_hash"].to_pylist()
    h2 = hash_column("doc_id")(out)["doc_id_hash"].to_pylist()
    assert h1 == h2
    assert len(set(h1)) == len(h1)  # no collisions on unique ids at this size
    b = hash_column("doc_id", "bucket", buckets=16)(out)["bucket"].to_pylist()
    assert set(b) <= set(range(16))
    assert len(set(b)) == 16


def test_foreign_input_routes_safely():
    """Lines that aren't from the fixture grammar must never produce
    half-parsed rows or null sinks."""
    from logpipe_ray.tokenizer import encode_lines

    lines = [
        # loose-looking but not fully parseable -> deadletter
        b'{"timestamp":"x","level":"INFO","service":"weird","other":1}',
        # valid grammar but unknown source -> unrouted sink
        b'{"timestamp":"2024-01-01T00:00:00.000Z","level":"INFO",'
        b'"service":"unknown-src","method":"GET","path":"/x","status":200,'
        b'"responseTime":5,"userId":null,"ip":"1.2.3.4","message":"m",'
        b'"meta":{"env":"dev","host":"h"}}',
    ]
    t = pa.table(
        {
            "doc_id": ["a", "b"],
            "tokens": encode_lines(lines),
            "n_tok": pa.array([len(x) for x in lines], pa.int32()),
            "source": ["mystery", "mystery"],
        }
    )
    out = route_batch(EnrichStage()(parse_batch(t)))
    assert out["sink"].to_pylist() == ["deadletter", "unrouted"]
    assert out["parse_ok"].to_pylist() == [False, True]
    assert out["sink"].null_count == 0


def test_parse_handles_batch_of_only_bad_lines():
    from logpipe_ray.tokenizer import encode_lines

    tokens = encode_lines([b"", b"not json at all", b"{broken"])
    tbl = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": tokens,
            "n_tok": pa.array([0, 15, 7], pa.int32()),
            "source": ["auth", "auth", "orders"],
        }
    )
    out = route_batch(EnrichStage()(parse_batch(tbl)))
    assert out["parse_ok"].to_pylist() == [False, False, False]
    assert set(out["sink"].to_pylist()) == {"deadletter"}


def test_validation_report_null_hostile_counts(ray_session):
    """Exact per-rule violation counts; predicate NULL counts as a
    violation (null-hostile), layout-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.stages.validate import validation_report

    t = pa.table(
        {
            "a": [1, None, 3, None, 5, 6],
            "s": ["x", "y", None, "x", "zz", "x"],
            "v": [0.5, 2.0, -1.0, None, 9.0, 3.0],
        }
    )
    rules = [
        {"col": "a", "check": "not_null"},
        {"col": "s", "check": "in_set", "values": ["x", "y"]},
        {"col": "v", "check": "between", "lo": 0, "hi": 5},
        {"col": "s", "check": "regex", "pattern": "^[a-z]$", "name": "one_char"},
    ]
    want = {
        "not_null:a": 2,
        "in_set:s": 2,      # None + 'zz'
        "between:v": 3,     # -1.0, None, 9.0
        "one_char": 2,      # None + 'zz'
    }
    for nparts in (1, 4):
        out = (
            validation_report(rd.from_arrow(t).repartition(nparts), rules)
            .to_pandas().set_index("rule")
        )
        assert out["n_rows"].tolist() == [6] * 4
        assert {r: int(out.loc[r, "n_violations"]) for r in want} == want

    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate"):
        validation_report(rd.from_arrow(t), [rules[0], rules[0]])


def test_melt_batch_unpivot():
    """melt_batch == pandas melt (row-major layout), typed values,
    empty-batch stable schema."""
    import pandas as pd
    import pyarrow as pa

    from logpipe_ray.stages.transform import melt_batch

    t = pa.table({"k": [1, 2], "a": [10, 20], "b": [30, 40]})
    out = melt_batch(t, ["k"], ["a", "b"], value_type=pa.int64()).to_pandas()
    assert list(zip(out.k, out.metric, out.value)) == [
        (1, "a", 10), (1, "b", 30), (2, "a", 20), (2, "b", 40)
    ]
    ref = (
        pd.DataFrame({"k": [1, 2], "a": [10, 20], "b": [30, 40]})
        .melt(id_vars="k", var_name="metric", value_name="value")
    )
    assert set(zip(out.k, out.metric, out.value)) == set(
        zip(ref.k, ref.metric, ref.value)
    )
    empty = melt_batch(t.slice(0, 0), ["k"], ["a", "b"], value_type=pa.int64())
    assert empty.num_rows == 0
    assert empty.column_names == ["k", "metric", "value"]
