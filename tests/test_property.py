"""Property-based tests (hypothesis) — round-trip and semantics
invariants promised in SURVEY.md §5."""

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from logpipe_ray.stages.transform import get_path, hash64_strings, make_filter
from logpipe_ray.tokenizer import detokenize, encode_lines

ascii_line = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=300
)


@given(st.lists(ascii_line, max_size=50))
@settings(max_examples=200, deadline=None)
def test_tokenize_round_trip(lines):
    arr = encode_lines([l.encode() for l in lines])
    assert detokenize(arr).to_pylist() == lines


@given(st.lists(st.binary(max_size=200), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_tokenize_round_trip_arbitrary_bytes(blobs):
    # the byte<->token bijection holds for ANY bytes, not just ascii
    arr = encode_lines(blobs)
    toks = arr.to_pylist()
    assert all(all(3 <= t <= 258 for t in row) for row in toks)
    back = [bytes(t - 3 for t in row) for row in toks]
    assert back == blobs


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "k": st.sampled_from(["a", "b", "c"]),
                "v": st.integers(-1000, 1000),
            }
        ),
        min_size=1,
        max_size=100,
    )
)
@settings(max_examples=100, deadline=None)
def test_filter_equality_matches_python(rows):
    t = pa.Table.from_pylist(rows)
    out = make_filter({"k": "a"})(t)
    assert out.num_rows == sum(1 for r in rows if r["k"] == "a")
    anti = make_filter({"k": "a"}, include_matches=False)(t)
    assert anti.num_rows == len(rows) - out.num_rows


@given(st.lists(ascii_line, min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_hash64_deterministic_and_batch_invariant(lines):
    arr = pa.array(lines, pa.string())
    h1 = hash64_strings(arr)
    h2 = hash64_strings(arr)
    assert (h1 == h2).all()
    # hashing a slice gives the same per-element values
    if len(lines) > 2:
        sub = pa.array(lines[1:], pa.string())
        hs = hash64_strings(sub)
        assert (h1[1:] == hs).all()


_field_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x7E, exclude_characters='"\\,}{][',
    ),
    min_size=1,
    max_size=20,
)

_record = st.fixed_dictionaries(
    {
        "level": st.sampled_from(["INFO", "WARN", "ERROR"]),
        "service": st.sampled_from(["auth", "payments", "api-gateway"]),
        "method": st.sampled_from(["GET", "POST"]),
        "path": _field_text.map(lambda s: "/" + s),
        "status": st.integers(100, 599),
        "responseTime": st.integers(0, 5000),
        "userId": st.none() | _field_text,
        "sessionId": st.none() | _field_text,
        "ip": st.tuples(*[st.integers(1, 255)] * 4).map(
            lambda t: ".".join(map(str, t))
        ),
        "message": _field_text,
        "payloadSize": st.integers(0, 10**6),
        "tags": st.lists(st.sampled_from(["db", "auth", "retry"]), max_size=3),
        "env": st.sampled_from(["dev", "prod"]),
        "host": _field_text,
        "omit": st.sampled_from([(), ("sessionId",), ("tags",), ("payloadSize",)]),
    }
)


@given(st.lists(_record, min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_parse_round_trips_arbitrary_valid_records(records):
    """Serialize arbitrary grammar-valid records (not the fixture
    generator) and assert the grok parse recovers every field."""
    import json

    from logpipe_ray.stages.parse import parse_batch
    from logpipe_ray.tokenizer import encode_lines

    lines = []
    recs = []
    for r in records:
        rec = {
            "timestamp": "2024-01-15T01:02:03.456Z",
            "level": r["level"],
            "service": r["service"],
            "method": r["method"],
            "path": r["path"],
            "status": r["status"],
            "responseTime": r["responseTime"],
            "userId": r["userId"],
            "sessionId": r["sessionId"],
            "ip": r["ip"],
            "message": r["message"],
            "payloadSize": r["payloadSize"],
            "tags": r["tags"],
            "meta": {"env": r["env"], "host": r["host"]},
        }
        if r["level"] == "ERROR":
            rec["errorCode"] = "E_DB"
        for k in r["omit"]:
            rec.pop(k)
        recs.append(rec)
        lines.append(json.dumps(rec, separators=(",", ":")).encode("ascii"))
    t = pa.table(
        {
            "doc_id": [f"d{i}" for i in range(len(lines))],
            "tokens": encode_lines(lines),
            "n_tok": pa.array([len(x) for x in lines], pa.int32()),
            "source": ["auth"] * len(lines),
        }
    )
    out = parse_batch(t)
    for i, rec in enumerate(recs):
        assert out["parse_ok"][i].as_py() is True
        assert out["level"][i].as_py() == rec["level"]
        assert out["status"][i].as_py() == rec["status"]
        assert out["user_id"][i].as_py() == rec.get("userId")
        assert out["session_id"][i].as_py() == rec.get("sessionId")
        assert out["payload_size"][i].as_py() == rec.get("payloadSize")
        assert out["tags"][i].as_py() == rec.get("tags")
        assert out["message"][i].as_py() == rec["message"]
        assert out["meta"][i].as_py() == rec["meta"]
        assert out["error_code"][i].as_py() == rec.get("errorCode")


@given(
    st.lists(
        st.fixed_dictionaries(
            {"meta": st.fixed_dictionaries({"env": st.sampled_from(["d", "p"])})}
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_dot_path_struct_access(rows):
    t = pa.Table.from_pylist(rows)
    col = get_path(t, "meta.env")
    assert col.to_pylist() == [r["meta"]["env"] for r in rows]
    missing = get_path(t, "meta.nope.deep")
    assert missing.null_count == len(rows)


# --------------------------- distributed selection properties (Ray) ---------


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=5, max_size=400
    ),
    nparts=st.integers(min_value=1, max_value=7),
    rank_frac=st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=8, deadline=None)
def test_exact_rank_value_property(ray_session, vals, nparts, rank_frac):
    """exact_rank_value == np.sort at an arbitrary rank, under heavy
    ties, any partitioning, tiny collect limits."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.stages.aggregate import exact_rank_value

    arr = np.array(vals, dtype=np.int64)
    rank = min(len(arr) - 1, int(rank_frac * len(arr)))
    ds = rd.from_arrow(pa.table({"v": arr})).repartition(nparts)
    got = exact_rank_value(ds, "v", rank, collect_limit=16)
    assert got == int(np.sort(arr)[rank])


@given(
    n=st.integers(min_value=4, max_value=300),
    distinct=st.integers(min_value=1, max_value=6),
    k_frac=st.floats(min_value=0.01, max_value=0.99),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=8, deadline=None)
def test_global_topk_filter_property(ray_session, n, distinct, k_frac, seed):
    """global_topk_filter == pandas row_number()<=k for random tie
    density, size and k."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from logpipe_ray.stages.aggregate import global_topk_filter

    rng = np.random.default_rng(seed)
    score = rng.integers(0, distinct, size=n).astype(float)
    ids = rng.permutation(n)
    k = max(1, int(k_frac * n))
    ref = (
        pd.DataFrame({"id": ids, "s": score})
        .sort_values(["s", "id"], ascending=[False, True])
        .head(k)
    )
    ds = rd.from_arrow(pa.table({"id": ids, "s": score})).repartition(3)
    out = global_topk_filter(ds, "s", "id", k, collect_limit=16).to_pandas()
    assert len(out) == k
    assert set(zip(out.id, out.s)) == set(zip(ref.id, ref.s))


@given(
    n=st.integers(min_value=1, max_value=200),
    nkeys=st.integers(min_value=1, max_value=5),
    nparts=st.integers(min_value=1, max_value=6),
    nb=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=8, deadline=None)
def test_latest_by_key_property(ray_session, n, nkeys, nparts, nb, seed):
    """latest_by_key == pandas sort+drop_duplicates for random key
    skew, tie-breaking id, any partitioning and bucket count."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from logpipe_ray.stages.aggregate import latest_by_key

    rng = np.random.default_rng(seed)
    k = rng.integers(0, nkeys, size=n)
    ts = rng.integers(0, 50, size=n)  # heavy ts ties -> id breaks them
    eid = rng.permutation(n)
    ds = rd.from_arrow(pa.table({"k": k, "ts": ts, "id": eid})).repartition(nparts)
    out = (
        latest_by_key(ds, "k", ["ts", "id"], num_buckets=nb)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    ref = (
        pd.DataFrame({"k": k, "ts": ts, "id": eid})
        .sort_values(["k", "ts", "id"], ascending=[True, False, False])
        .drop_duplicates("k").sort_values("k").reset_index(drop=True)
    )
    assert out[["k", "ts", "id"]].values.tolist() == ref[["k", "ts", "id"]].values.tolist()


@given(
    nl=st.integers(min_value=0, max_value=60),
    nr=st.integers(min_value=0, max_value=60),
    w=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=8, deadline=None)
def test_window_join_property(ray_session, nl, nr, w, seed):
    """window_join == brute-force double loop for random window
    widths, bucket-edge timestamps and key overlap (exactly-once)."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.stages.join import window_join

    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 4, size=nl)
    lts = rng.integers(0, 100, size=nl)
    rk = rng.integers(0, 4, size=nr)
    rts = rng.integers(0, 100, size=nr)
    want = sorted(
        (int(lk[i]), int(lts[i]), int(rts[j]))
        for i in range(nl)
        for j in range(nr)
        if lk[i] == rk[j] and lts[i] - w <= rts[j] <= lts[i]
    )
    left = rd.from_arrow(
        pa.table({"k": lk, "lts": lts, "lid": np.arange(nl)})
    ).repartition(3)
    right = rd.from_arrow(
        pa.table({"k": rk, "rts": rts, "rid": np.arange(nr)})
    ).repartition(2)
    out = window_join(
        left, right, "k", "lts", "rts", window_us=w, num_partitions=4
    ).to_pandas()
    if len(out) == 0:
        # an entirely empty side may lose its schema inside Ray; the
        # guaranteed contract there is emptiness, not column layout
        assert want == []
    else:
        assert sorted(zip(out.k, out.lts, out.rts)) == want


@given(
    n=st.integers(min_value=0, max_value=400),
    hot_frac=st.floats(min_value=0.0, max_value=1.0),
    nd=st.integers(min_value=0, max_value=30),
    thr=st.integers(min_value=1, max_value=200),
    bcast=st.sampled_from([0, 100_000]),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=8, deadline=None)
def test_skew_join_property(ray_session, n, hot_frac, nd, thr, bcast, seed):
    """skew_join == brute-force inner join for random hot fractions
    (0%..100%), dim sizes (incl. empty), thresholds and both planner
    modes."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.stages.join import skew_join

    rng = np.random.default_rng(seed)
    fk = np.where(rng.random(n) < hot_frac, 7, rng.integers(0, 12, size=n))
    dk = rng.integers(0, 12, size=nd)
    dv = np.arange(nd) * 10
    want = sorted(
        (int(fk[i]), i, int(dv[j]))
        for i in range(n)
        for j in range(nd)
        if fk[i] == dk[j]
    )
    fact = rd.from_arrow(
        pa.table({"k": fk.astype(np.int64), "i": np.arange(n)})
    ).repartition(4)
    dim = rd.from_arrow(
        pa.table({"dk": dk.astype(np.int64), "dv": dv})
    ).repartition(2)
    out = skew_join(
        fact, dim, "k", "dk", ["dv"],
        hot_threshold=thr, dim_broadcast_rows=bcast,
    ).to_pandas()
    if len(out) == 0:
        assert want == []
    else:
        assert sorted(zip(out.k, out.i, out.dv)) == want


@given(
    nl=st.integers(min_value=0, max_value=60),
    nr=st.integers(min_value=0, max_value=60),
    dom=st.integers(min_value=1, max_value=15),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=8, deadline=None)
def test_setops_property(ray_session, nl, nr, dom, seed):
    """except/intersect == python set algebra under random sizes
    (incl. EMPTY sides), duplicate rates and partitioning."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.stages.setops import except_distinct, intersect_distinct

    rng = np.random.default_rng(seed)
    l = rng.integers(0, dom, size=nl)
    r = rng.integers(0, dom, size=nr)
    schema = pa.schema([("k", pa.int64())])
    left = rd.from_arrow(
        pa.table({"k": pa.array(l, pa.int64())}).cast(schema)
    ).repartition(3)
    right = rd.from_arrow(
        pa.table({"k": pa.array(r, pa.int64())}).cast(schema)
    ).repartition(2)
    exc = except_distinct(left, right, ["k"])
    inter = intersect_distinct(left, right, ["k"])

    def collect(ds):
        import ray

        tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
        return set(pa.concat_tables(tbls)["k"].to_pylist()) if tbls else set()

    assert collect(exc) == set(l.tolist()) - set(r.tolist())
    assert collect(inter) == set(l.tolist()) & set(r.tolist())


@given(
    n=st.integers(min_value=1, max_value=300),
    nkeys=st.integers(min_value=1, max_value=4),
    ties=st.booleans(),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=6, deadline=None)
def test_grouped_mad_property(ray_session, n, nkeys, ties, seed):
    """grouped_mad == pandas median-of-absolute-deviations under random
    group counts, tie-heavy data and any partitioning."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from logpipe_ray.stages.aggregate import grouped_mad

    rng = np.random.default_rng(seed)
    k = rng.integers(0, nkeys, size=n).astype(str)
    pool = np.round(rng.normal(0, 10, size=max(2, n // 8 if ties else n)), 2)
    v = rng.choice(pool, size=n)
    ds = rd.from_arrow(
        pa.table({"g": k, "v": pa.array(v, pa.float64())})
    ).repartition(3)
    out = grouped_mad(ds, "g", "v", collect_limit=16).to_pandas()
    got = out.set_index("g")["mad_value"]
    df = pd.DataFrame({"g": k, "v": v})
    med = df.groupby("g")["v"].median()
    ref = df.assign(d=(df.v - df.g.map(med)).abs()).groupby("g")["d"].median()
    assert len(got) == len(ref)
    for g in ref.index:
        assert got[g] == ref[g], (g, got[g], ref[g])


@given(
    n=st.integers(min_value=0, max_value=200),
    nkeys=st.integers(min_value=1, max_value=3),
    span_h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=8, deadline=None)
def test_dense_time_counts_property(ray_session, n, nkeys, span_h, seed):
    """dense_time_counts: grid covers [min,max] per hour for EVERY key,
    non-zero cells equal brute-force counts, zero cells fill the rest."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from logpipe_ray.stages.aggregate import dense_time_counts

    H = 3_600_000_000
    base = 1_700_000_000_000_000 // H * H
    rng = np.random.default_rng(seed)
    k = rng.integers(0, nkeys, size=n).astype(str)
    ts = base + rng.integers(0, span_h, size=n) * H + rng.integers(0, H, size=n)
    ds = rd.from_arrow(
        pa.table(
            {"k": k, "ts": pa.array(ts.astype("datetime64[us]"))}
        ).cast(pa.schema([("k", pa.string()), ("ts", pa.timestamp("us"))]))
    ).repartition(3)
    out = dense_time_counts(ds, "k", "ts").to_pandas()
    if n == 0:
        assert len(out) == 0
        return
    hours = (ts // H) * H
    used = np.unique(hours)
    nb = int((used.max() - used.min()) // H + 1)
    assert len(out) == len(np.unique(k)) * nb
    df = pd.DataFrame({"k": k, "h": hours})
    ref = df.groupby(["k", "h"]).size()
    got = {
        (r.k, int(pd.Timestamp(r.bucket).value // 1000)): int(r.cnt)
        for r in out.itertuples()
    }
    assert sum(got.values()) == n
    for (kk, hh), c in ref.items():
        assert got[(kk, int(hh))] == c


@given(
    n=st.integers(min_value=0, max_value=200),
    nkeys=st.integers(min_value=1, max_value=5),
    alpha=st.sampled_from([0.1, 0.3, 0.5, 0.9]),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=6, deadline=None)
def test_grouped_ewma_property(ray_session, n, nkeys, alpha, seed):
    """grouped_ewma_last == naive per-key adjust=False recursion,
    bitwise, under random groups/order/partitioning."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.stages.aggregate import grouped_ewma_last

    rng = np.random.default_rng(seed)
    k = rng.integers(0, nkeys, size=n)
    order = rng.permutation(n).astype(np.int64)
    v = np.round(rng.normal(0, 10, size=n), 3)
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "o": pa.array(order),
                "v": pa.array(v, pa.float64()),
            }
        )
    ).repartition(3)
    out = grouped_ewma_last(ds, "k", ["o"], "v", alpha=alpha).to_pandas()
    if n == 0:
        assert len(out) == 0
        return
    got = out.set_index("k")
    import pandas as pd

    df = pd.DataFrame({"k": k, "o": order, "v": v}).sort_values(["k", "o"])
    seen = 0
    # the documented contract: pandas' adjust=False kernel, including
    # the com round-trip (alpha -> 1/alpha-1 -> back) that perturbs
    # alpha in the last bit, and the non-unit normalizing denominator
    a2 = 1.0 / (1.0 + (1.0 / alpha - 1.0))
    ow, nw = 1.0 - a2, a2
    for kk, g in df.groupby("k"):
        y = None
        for x in g["v"]:
            y = x if y is None else (ow * y + nw * x) / (ow + nw)
        assert got.loc[kk, "n_obs"] == len(g)
        assert got.loc[kk, "ewma_last"] == y, (kk, got.loc[kk, "ewma_last"], y)
        seen += 1
    assert len(got) == seen


@given(
    strs=st.lists(
        st.text(alphabet="abcé ", max_size=12), min_size=2, max_size=6
    ),
    seed=st.integers(min_value=0, max_value=100),
)
@settings(max_examples=30, deadline=None)
def test_editdist_bytes_matches_duckdb(strs, seed):
    """editdist_bytes == DuckDB levenshtein (byte-level, multibyte
    included) on arbitrary pairs."""
    import duckdb

    from logpipe_ray.functions.dedup import editdist_bytes

    con = duckdb.connect()
    a, b = strs[seed % len(strs)], strs[(seed + 1) % len(strs)]
    want = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert editdist_bytes(a.encode(), b.encode()) == want


@given(
    n=st.integers(min_value=0, max_value=300),
    ngroups=st.integers(min_value=1, max_value=4),
    vals=st.integers(min_value=2, max_value=5),
    k=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=8, deadline=None)
def test_grouped_top_k_ties_property(ray_session, n, ngroups, vals, k, seed):
    """grouped_top_k_ties == pandas rank(method='min') <= k under
    heavy ties and any partitioning."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from logpipe_ray.stages.aggregate import grouped_top_k_ties

    rng = np.random.default_rng(seed)
    g = rng.integers(0, ngroups, size=n).astype(str)
    v = rng.integers(0, vals, size=n)
    rid = np.arange(n)
    ds = rd.from_arrow(
        pa.table(
            {
                "g": g,
                "v": pa.array(v, pa.int64()),
                "rid": pa.array(rid, pa.int64()),
            }
        )
    ).repartition(3)
    out = grouped_top_k_ties(ds, ["g"], [("v", "descending")], k=k)
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_columns]
    got = (
        pa.concat_tables(tbls).to_pandas().sort_values("rid").reset_index(drop=True)
        if tbls
        else pd.DataFrame(columns=["g", "v", "rid", "rnk"])
    )
    df = pd.DataFrame({"g": g, "v": v, "rid": rid})
    df["rnk"] = df.groupby("g")["v"].rank(method="min", ascending=False)
    ref = df[df["rnk"] <= k].sort_values("rid").reset_index(drop=True)
    assert got["rid"].tolist() == ref["rid"].tolist()
    assert got["rnk"].astype(int).tolist() == ref["rnk"].astype(int).tolist()


@given(
    n=st.integers(min_value=0, max_value=150),
    nkeys=st.integers(min_value=1, max_value=5),
    ntypes=st.integers(min_value=1, max_value=4),
    nparts=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=8, deadline=None)
def test_scd2_intervals_property(ray_session, n, nkeys, ntypes, nparts, seed):
    """scd2_intervals == a pandas run-length reference for random key
    skew, ts ties, any partitioning — incl. n=0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from logpipe_ray.stages.aggregate import scd2_intervals

    rng = np.random.default_rng(seed)
    k = rng.integers(0, nkeys, n).astype(np.int64)
    ts = rng.integers(0, 20, n).astype(np.int64)  # heavy ties
    eid = rng.permutation(n).astype(np.int64)
    attr = np.array([f"t{x}" for x in rng.integers(0, ntypes, n)])
    t = pa.table(
        {"k": k, "ts": ts, "id": eid, "attr": pa.array(list(attr), pa.string())}
    )
    ds = rd.from_arrow(t).repartition(nparts)
    got = scd2_intervals(ds, "k", "ts", "id", "attr").to_pandas()
    if len(got):
        got = got.sort_values(["k", "version"]).reset_index(drop=True)
    # reference: per-key ordered run-length encode
    ref_rows = []
    df = pd.DataFrame({"k": k, "ts": ts, "id": eid, "attr": attr})
    for kk, g in df.sort_values(["ts", "id"]).groupby("k", sort=True):
        prev, ver = None, 0
        runs = []
        for _, r in g.iterrows():
            if prev is None or r["attr"] != prev:
                ver += 1
                runs.append([kk, r["attr"], r["ts"], None, ver])
                prev = r["attr"]
        for i in range(len(runs) - 1):
            runs[i][3] = runs[i + 1][2]
        ref_rows += runs
    ref = pd.DataFrame(
        ref_rows,
        columns=["k", "attr", "valid_from_us", "valid_to_us", "version"],
    ).sort_values(["k", "version"]).reset_index(drop=True)
    assert len(got) == len(ref)
    if len(ref):
        assert got["k"].tolist() == ref["k"].tolist()
        assert got["attr"].tolist() == ref["attr"].tolist()
        assert got["valid_from_us"].tolist() == ref["valid_from_us"].tolist()
        gnull = got["valid_to_us"].isna().tolist()
        rnull = ref["valid_to_us"].isna().tolist()
        assert gnull == rnull
        gvals = got["valid_to_us"].dropna().astype("int64").tolist()
        rvals = ref["valid_to_us"].dropna().astype("int64").tolist()
        assert gvals == rvals
        assert got["version"].tolist() == ref["version"].tolist()


@given(
    n=st.integers(min_value=0, max_value=120),
    nkeys=st.integers(min_value=1, max_value=4),
    nparts=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=8, deadline=None)
def test_resample_linear_property(ray_session, n, nkeys, nparts, seed):
    """grouped_resample_linear == a brute per-grid-point reference
    (prev = max (ts,id) <= h, next = min (ts,id) >= h) with ts ties."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.stages.aggregate import grouped_resample_linear

    H = 10
    rng = np.random.default_rng(seed)
    k = rng.integers(0, nkeys, n).astype(np.int64)
    ts = rng.integers(0, 100, n).astype(np.int64)
    eid = rng.permutation(n).astype(np.int64)
    v = rng.normal(size=n)
    ds = rd.from_arrow(
        pa.table({"k": k, "ts": ts, "id": eid, "v": v})
    ).repartition(nparts)
    got = grouped_resample_linear(ds, "k", "ts", "id", "v", H).to_pandas()
    if len(got):
        got = got.sort_values(["k", "grid_us"]).reset_index(drop=True)
    ref = []
    for kk in np.unique(k):
        m = k == kk
        kt, ki, kv = ts[m], eid[m], v[m]
        lo = -((-kt.min()) // H) * H
        hi = (kt.max() // H) * H
        for h in range(lo, hi + 1, H):
            before = (kt <= h)
            after = (kt >= h)
            bi = np.lexsort((ki[before], kt[before]))[-1]
            ai = np.lexsort((ki[after], kt[after]))[0]
            tp, vp = kt[before][bi], kv[before][bi]
            tn, vn = kt[after][ai], kv[after][ai]
            if tn == tp:
                val = vp
            else:
                val = vp + (vn - vp) * (float(h - tp) / float(tn - tp))
            ref.append((kk, h, val))
    assert len(got) == len(ref)
    for (rk, rh, rv), (_, gr) in zip(ref, got.iterrows()):
        assert gr["k"] == rk and gr["grid_us"] == rh
        assert gr["v_interp"] == rv  # same IEEE expression order


@given(
    n=st.integers(min_value=0, max_value=400),
    nkeys=st.integers(min_value=1, max_value=30),
    num=st.integers(min_value=1, max_value=3),
    nparts=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=8, deadline=None)
def test_heavy_hitters_property(ray_session, n, nkeys, num, nparts, seed):
    """heavy_hitters == pandas HAVING count >= ceil(N*num/10) for
    random skew, any partitioning, sketch far smaller than needed
    (k=8) — the guarantee must hold through truncation; incl. n=0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from logpipe_ray.stages.aggregate import heavy_hitters

    rng = np.random.default_rng(seed)
    # zipf-ish skew so some keys are genuinely heavy
    raw = rng.zipf(1.5, n) if n else np.array([], dtype=np.int64)
    k = (raw % nkeys).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": k})).repartition(nparts)
    got = heavy_hitters(ds, ["k"], num, 10, sketch_k=16).to_pandas()
    thr = (num * n + 9) // 10
    ref = (
        pd.Series(k).value_counts().rename_axis("k").reset_index(name="n")
        if n
        else pd.DataFrame({"k": [], "n": []})
    )
    ref = ref[ref["n"] >= max(thr, 1)]
    assert sorted(got["k"].tolist()) == sorted(ref["k"].tolist())
    assert (
        got.sort_values("k")["n"].tolist()
        == ref.sort_values("k")["n"].tolist()
    )


@given(
    n=st.integers(min_value=0, max_value=80),
    nkeys=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=6, deadline=None)
def test_linear_attribution_property(ray_session, tmp_path_factory, n, nkeys, seed):
    """purchases_linear_attribution == a brute pandas range-join
    reference, with timestamps clustered around 7-day bucket
    boundaries (the replication edge) and ts ties."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq_

    from logpipe_ray.queries import purchases_linear_attribution

    W = 7 * 86_400_000_000
    D = 86_400_000_000
    rng = np.random.default_rng(seed)
    u = rng.integers(0, nkeys, n).astype(np.int64)
    # cluster near bucket edges: k*W +- a few days
    base = rng.integers(0, 4, n).astype(np.int64) * W
    off = rng.integers(-2 * D, 2 * D, n).astype(np.int64)
    ts = np.maximum(base + off, 0)
    et = np.where(rng.random(n) < 0.4, "purchase", "click")
    val = rng.integers(1, 500, n).astype(np.float64)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(u),
            "event_type": pa.array(list(et), pa.string()),
            "value": pa.array(val),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("attr")
    pq_.write_table(t, str(d / "events.parquet"))
    got = purchases_linear_attribution(str(d)).to_pandas()
    got = (
        got.sort_values("click_day").reset_index(drop=True)
        if len(got)
        else got
    )
    # brute reference
    df = pd.DataFrame({"u": u, "ts": ts, "et": et, "v": val,
                       "id": np.arange(1, n + 1)})
    rows = {}
    p = df[df.et == "purchase"]
    c = df[df.et == "click"]
    for _, pr in p.iterrows():
        q = c[(c.u == pr.u) & (c.ts <= pr.ts) & (pr.ts - c.ts <= W)]
        k = len(q)
        if k == 0:
            continue
        cents = int(round(pr.v * 100))
        share = (cents * 1_000_000) // k
        for _, cl in q.iterrows():
            day = int(cl.ts // D)
            nn, mm = rows.get(day, (0, 0))
            rows[day] = (nn + 1, mm + share)
    ref = sorted(rows.items())
    assert len(got) == len(ref)
    for (day, (nn, mm)), (_, gr) in zip(ref, got.iterrows()):
        assert int(gr["click_day"]) == day
        assert int(gr["n_pairs"]) == nn
        assert int(gr["attributed_microcents"]) == mm


@given(
    strs=st.lists(st.binary(max_size=50), min_size=2, max_size=25),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=50, deadline=None)
def test_editdist_pairs_matrix_property(strs, seed):
    """The pair-axis-vectorized Levenshtein DP == the scalar kernel for
    arbitrary byte strings (empties, equal strings, max-length mixes)."""
    import numpy as np

    from logpipe_ray.functions.dedup import (
        editdist_bytes,
        editdist_bytes_pairs,
    )

    n = len(strs)
    ia, ib = np.triu_indices(n, k=1)
    rng = np.random.default_rng(seed)
    sh = rng.permutation(len(ia))
    ia, ib = ia[sh], ib[sh]  # arbitrary pair order
    got = editdist_bytes_pairs(strs, ia, ib, chunk=7)
    want = [editdist_bytes(strs[i], strs[j]) for i, j in zip(ia, ib)]
    assert got.tolist() == want


@given(
    n=st.integers(min_value=0, max_value=300),
    wmax=st.integers(min_value=0, max_value=50),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=10, deadline=None)
def test_sweep_fold_property(ray_session, n, wmax, seed):
    """sweep_max_concurrent (BOTH routes) == a brute per-grain peak
    counter over random intervals with ties and zero lengths; the
    time integral likewise (both routes)."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.stages.aggregate import (
        sweep_max_concurrent,
        sweep_time_integral,
    )

    B, G = 8, 32  # bucket_us, out_grain_us (G % B == 0)
    rng = np.random.default_rng(seed)
    t0 = rng.integers(0, 200, size=n).astype(np.int64)
    t1 = t0 + rng.integers(0, wmax + 1, size=n).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"t0": pa.array(t0), "t1": pa.array(t1)})
    ).repartition(3)

    # brute: running count over (+1 at t0 before -1 at t1 ties),
    # per-grain max at boundary positions
    bt = np.concatenate([t0, t1])
    dl = np.concatenate([np.ones(n, np.int64), -np.ones(n, np.int64)])
    o = np.lexsort((-dl, bt))
    conc = np.cumsum(dl[o])
    g = bt[o] // G
    want = {}
    for gi, ci in zip(g.tolist(), conc.tolist()):
        want[gi] = max(want.get(gi, -1), ci)

    for extra in ({}, {"fold_task_rows": 0}):
        out = sweep_max_concurrent(
            ds, "t0", "t1", bucket_us=B, out_grain_us=G, **extra
        ).to_pandas()
        if n == 0:
            # the bucketed route's truly-empty output loses its column
            # layout inside Ray; the contract there is emptiness
            assert len(out) == 0
            continue
        got = dict(zip(out["grain"].astype(int), out.iloc[:, 1].astype(int)))
        assert got == want, extra

    integral = int(np.sum(conc[:-1] * np.diff(bt[o]))) if n else 0
    for extra in ({}, {"fold_task_rows": 0}):
        it = sweep_time_integral(ds, "t0", "t1", bucket_us=B, **extra)
        assert int(it["conc_us_integral"][0].as_py()) == integral, extra
        assert int(it["peak_concurrent"][0].as_py()) == (
            int(conc.max()) if n else 0
        ), extra


@given(
    nseq=st.integers(min_value=1, max_value=60),
    vocab=st.integers(min_value=2, max_value=8),
    k=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=10, deadline=None)
def test_bpe_fused_vs_driver_property(ray_session, nseq, vocab, k, seed):
    """The fused-task BPE loop == the bounded-driver loop on random
    low-vocab corpora (dense overlap runs, ties, empty sequences)."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.functions.bpe import learn_bpe_merges

    rng = np.random.default_rng(seed)
    seqs = [
        rng.integers(1, vocab + 1, size=int(rng.integers(0, 15))).tolist()
        for _ in range(nseq)
    ]
    tbl = pa.table({"tokens": pa.array(seqs, pa.list_(pa.int32()))})
    driver = learn_bpe_merges(rd.from_arrow(tbl).repartition(4), k_merges=k)
    fused = learn_bpe_merges(
        rd.from_arrow(tbl).repartition(4), k_merges=k, driver_rows=0
    )
    assert driver.equals(fused)
