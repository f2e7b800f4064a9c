import pyarrow as pa
import pytest

import ray.data as rd

from logpipe_ray.functions.decontaminate import (
    REDACTION_RULES,
    build_blocklist_ngrams,
    contamination_fraction,
    decontaminate,
    redact_batch,
)


def test_redaction_rules():
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "contact john.doe+x@example.com or admin@sub.host.org today",
                "server at 192.168.10.1 responded; card 12345678901234",
                "clean text with short 123 number",
            ],
        }
    )
    out = redact_batch(t)["text"].to_pylist()
    assert out[0] == "contact <EMAIL> or <EMAIL> today"
    assert out[1] == "server at <IP> responded; card <NUM>"
    assert out[2] == "clean text with short 123 number"


def test_contamination_fraction():
    bench = ["the quick brown fox jumps over the lazy dog"]
    bl = build_blocklist_ngrams(bench, n=3)
    texts = pa.array(
        [
            "the quick brown fox jumps over the lazy dog",  # full overlap
            "a completely different sentence with no overlap at all",
            "he said the quick brown fox appeared",  # partial
        ]
    )
    frac = contamination_fraction(texts, bl, n=3)
    assert frac[0] == 1.0
    assert frac[1] == 0.0
    assert 0.0 < frac[2] < 1.0


def test_decontaminate_filters(ray_session):
    bench = ["alpha beta gamma delta epsilon zeta eta theta"]
    docs = [
        "alpha beta gamma delta epsilon zeta eta theta",  # contaminated
        "iota kappa lambda mu nu xi omicron pi rho",
        "alpha beta gamma completely different after this point here",
    ]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": docs})
    kept = decontaminate(rd.from_arrow(t), bench, n=3, max_overlap=0.3).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 2]
    flagged = decontaminate(
        rd.from_arrow(t), bench, n=3, max_overlap=0.3, keep_contaminated=True
    ).to_pandas()
    assert sorted(flagged["doc_id"]) == [0]
    assert (flagged["contamination"] > 0.3).all()


def test_short_blocklist_entries_caught():
    bl = build_blocklist_ngrams(["answer fortytwo", "x"], n=3)
    texts = pa.array(["answer fortytwo", "x", "unrelated words here entirely"])
    frac = contamination_fraction(texts, bl, n=3)
    assert frac[0] == 1.0 and frac[1] == 1.0 and frac[2] == 0.0


def test_bloom_filter_no_false_negatives_and_low_fp():
    import numpy as np

    from logpipe_ray.functions.decontaminate import BloomFilter

    rng = np.random.default_rng(1)
    members = rng.integers(0, 1 << 63, 50_000, dtype=np.uint64)
    others = rng.integers(0, 1 << 63, 50_000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    bf = BloomFilter(len(members) * 10, 7)
    bf.add(members)
    assert bf.contains(members).all()  # no false negatives, ever
    fp = bf.contains(others).mean()
    assert fp < 0.02  # ~1% at 10 bits/elem, k=7


def test_decontaminate_bloom_matches_exact(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from logpipe_ray.functions.decontaminate import decontaminate

    docs = [
        "the quick brown fox jumps over the lazy dog",
        "completely unrelated words here about databases and rayon",
        "the quick brown fox jumps high",  # shares 3-grams with doc0
        "tiny doc",
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": docs})
    bl = [docs[0]]
    exact = decontaminate(
        rd.from_arrow(t), bl, n=3, max_overlap=0.3, use_bloom=False
    ).to_pandas()
    bloom = decontaminate(
        rd.from_arrow(t), bl, n=3, max_overlap=0.3, use_bloom=True
    ).to_pandas()
    # at this size the Bloom FP rate is ~0, so outputs are identical
    assert sorted(exact["doc_id"]) == sorted(bloom["doc_id"])
    assert list(exact.sort_values("doc_id")["contamination"]) == list(
        bloom.sort_values("doc_id")["contamination"]
    )


def test_short_doc_sql_oracle_branch_agrees():
    """The SQL oracle's short-doc branch (queries._sql_docs_
    decontaminate_audit) must agree with the engine's backstop when
    the corpus INCLUDES <3-word documents and blocklist entries
    (ADVICE r2: previously an oracle divergence)."""
    import duckdb
    import pandas as pd

    import pyarrow as pa

    from logpipe_ray.functions.decontaminate import (
        build_blocklist_ngrams,
        contamination_fraction,
    )
    from logpipe_ray.queries import _sql_docs_decontaminate_audit

    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "alpha beta",                      # blocklist (short)
                "one two three four five",         # blocklist
                "gamma",                           # blocklist (1 word)
                "x y z w",                         # blocklist
                "filler words here okay",          # blocklist
                "alpha beta",                      # dup of short entry -> 1.0
                "one two three four five six",     # mostly contaminated
                "alpha beta gamma json",           # 3-gram doc, no match
            ],
        }
    )
    # engine side
    bl = build_blocklist_ngrams(docs["text"].head(5).tolist(), n=3)
    fr = contamination_fraction(pa.array(docs["text"], pa.string()), bl, n=3)
    eng = {
        int(d): float(f)
        for d, f in zip(docs["doc_id"], fr)
        if f > 0.5
    }
    # oracle side (same SQL, documents view bound to this frame)
    con = duckdb.connect()
    con.register("documents", docs)
    sql = _sql_docs_decontaminate_audit("unused")
    ora = {
        int(r[0]): float(r[1]) for r in con.execute(sql).fetchall()
    }
    assert eng == ora
    assert 5 in eng  # the short dup was caught by BOTH sides
