"""Corpus-statistics operators: repetition signals, n-gram novelty,
TF-IDF partials (logpipe_ray/functions/corpusfns.py)."""

import numpy as np
import pyarrow as pa
import pytest

from logpipe_ray.functions.corpusfns import (
    df_partial,
    ngram_batch,
    repetition_batch,
    tf_partial,
)


def _docs(texts, langs=None):
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs or ["en"] * n, pa.string()),
        }
    )


def test_repetition_known_values():
    t = _docs(["a a a b", "x y z w", "q"])
    r = repetition_batch(t).to_pydict()
    # doc 0: 4 words, 2 distinct, max word cnt 3, bigrams: "a a" x2, "a b" x1
    assert r["n_words"] == [4, 4, 1]
    assert r["n_distinct_words"] == [2, 4, 1]
    assert r["dup_word_frac"][0] == (4 - 2) / 4
    assert r["top_word_frac"][0] == 3 / 4
    assert r["top_bigram_frac"][0] == 2 / 3
    # doc 1: all distinct
    assert r["dup_word_frac"][1] == 0.0
    assert r["top_bigram_frac"][1] == 1 / 3
    # doc 2: single word, no bigrams -> 0 over the guard divisor
    assert r["top_bigram_frac"][2] == 0.0


def test_ngram_batch_distinct_and_short_docs():
    t = _docs(["a b c d e f", "a b c d e", "too short"])
    g = ngram_batch(t, n=5).to_pydict()
    got = sorted(zip(g["doc_id"], g["gram"]))
    assert got == [
        (0, "a b c d e"),
        (0, "b c d e f"),
        (1, "a b c d e"),
    ]
    # repeated gram within one doc is emitted once
    t2 = _docs(["a b a b a b a b a b a b"])
    g2 = ngram_batch(t2, n=2).to_pydict()
    assert sorted(g2["gram"]) == ["a b", "b a"]


def test_ngram_batch_all_short_is_empty():
    g = ngram_batch(_docs(["a b", "c"]), n=5)
    assert g.num_rows == 0
    assert g.column_names == ["doc_id", "gram"]


def test_tf_df_partials():
    t = _docs(["a b a", "b c"], langs=["en", "de"])
    tf = tf_partial(t).to_pydict()
    tf_map = {(l, w): c for l, w, c in zip(tf["lang"], tf["term"], tf["p"])}
    assert tf_map == {("en", "a"): 2, ("en", "b"): 1, ("de", "b"): 1, ("de", "c"): 1}
    df = df_partial(t).to_pydict()
    df_map = dict(zip(df["term"], df["p"]))
    assert df_map == {"a": 1, "b": 2, "c": 1}


def test_c4_filter_reason_codes():
    from logpipe_ray.functions.corpusfns import c4_filter_batch

    docs = _docs(
        [
            "the cat sat on the mat with the hat and the bat now",  # keep
            "too short",  # too_few_words
            "xxxxxxxxxxxxxxxxxxxxxxxxxxxxx " * 12,  # bad_mean_word_len
            ("dup " * 11 + "the quick brown fox on it").strip(),  # repetitive
            "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",  # no_stopword
        ]
    )
    out = c4_filter_batch(docs).to_pydict()
    assert out["keep"] == [True, False, False, False, False]
    assert out["reason"] == [
        None,
        "too_few_words",
        "bad_mean_word_len",
        "repetitive",
        "no_stopword",
    ]


def test_c4_filter_first_rule_wins():
    from logpipe_ray.functions.corpusfns import c4_filter_batch

    # fails both too_few_words AND no_stopword -> first rule reported
    out = c4_filter_batch(_docs(["zz qq"])).to_pydict()
    assert out["reason"] == ["too_few_words"]


@pytest.mark.usefixtures("ray_session")
def test_ngram_novelty_end_to_end(tmp_path):
    """Planted overlap: doc 1 repeats doc 0's text verbatim (all grams
    seen before), doc 2 is fresh."""
    import pyarrow.parquet as pq

    base = "w0 w1 w2 w3 w4 w5 w6 w7"
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([base, base, "f0 f1 f2 f3 f4 f5"], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    from logpipe_ray.queries import docs_ngram_novelty

    out = docs_ngram_novelty(str(d)).to_pandas().sort_values("doc_id")
    assert out.n_grams.tolist() == [4, 4, 2]
    assert out.n_seen_before.tolist() == [0, 4, 0]
    assert out.novelty_frac.tolist() == [1.0, 0.0, 1.0]


@pytest.mark.usefixtures("ray_session")
def test_ngram_novelty_paths_equal(monkeypatch):
    """The broadcast-lookup fast path and the distributed
    groupby+join route produce identical results."""
    import logpipe_ray.queries as Q

    sf = "/root/testdata/sf0.001"
    fast = Q.docs_ngram_novelty(sf).to_pandas().sort_values("doc_id", ignore_index=True)
    monkeypatch.setattr(Q, "NOVELTY_BROADCAST_GRAMS", 0)
    dist = Q.docs_ngram_novelty(sf).to_pandas().sort_values("doc_id", ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(fast, dist[fast.columns])


def test_span_batch_known_values():
    from logpipe_ray.functions.corpusfns import SPAN_STRIDE, span_batch

    t = _docs(["a b c d e f g", "a b c x", "", "a b c x"])
    g = span_batch(t, k=3).to_pydict()
    assert g["span"] == ["a b c", "d e f", "g", "a b c", "x", "", "a b c", "x"]
    assert g["doc_id"] == [0, 0, 0, 1, 1, 2, 3, 3]
    assert g["span_idx"] == [0, 1, 2, 0, 1, 0, 0, 1]
    assert g["packed"][3] == 1 * SPAN_STRIDE + 0


@pytest.mark.usefixtures("ray_session")
def test_span_dedup_end_to_end(tmp_path):
    """Planted duplicate spans: doc 1 repeats doc 0's first span and
    adds fresh words; doc 3 repeats doc 0 verbatim (rewritten to "");
    the empty doc keeps its first-"" span."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["a b c d e f g", "a b c x", "", "a b c d e f g"], pa.string()
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    from logpipe_ray.queries import docs_span_dedup

    out = (
        docs_span_dedup(str(d), k=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # doc 0 spans: "a b c","d e f","g"; doc 1: "a b c"(dup),"x";
    # doc 2: ""(first); doc 3: all three dup
    assert out.text_dedup.tolist() == ["a b c d e f g", "x", "", ""]
    assert out.n_spans.tolist() == [3, 2, 1, 3]
    assert out.n_dropped.tolist() == [0, 1, 0, 3]


@pytest.mark.usefixtures("ray_session")
def test_span_dedup_paths_equal(monkeypatch):
    """Broadcast rewrite vs distributed groupby+join+regroup routes
    are identical over the fixture corpus."""
    import pandas as pd

    import logpipe_ray.queries as Q

    sf = "/root/testdata/sf0.001"
    fast = Q.docs_span_dedup(sf).to_pandas().sort_values("doc_id", ignore_index=True)
    assert fast.n_dropped.sum() > 0  # the operator actually bites
    import logpipe_ray.functions.dedup as D

    monkeypatch.setattr(D, "SPAN_DEDUP_BROADCAST_LIMIT", 0)
    dist = Q.docs_span_dedup(sf).to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(fast, dist[fast.columns])


def test_chunk_batch_matches_duckdb_and_reference_loop():
    """Vectorized chunking == a plain per-doc Python reference AND the
    SQL oracle's closed-form expansion, across short docs (< W), exact
    multiples, long docs, and the ''-> [''] edge."""
    import duckdb
    import pyarrow as pa

    from logpipe_ray.functions.corpusfns import chunk_batch

    W, OV = 8, 3
    step = W - OV
    texts = [
        "a b c",                              # n < W -> 1 chunk
        " ".join(f"w{i}" for i in range(8)),  # n == W -> 1 chunk
        " ".join(f"x{i}" for i in range(9)),  # n == W+1 -> 2 chunks
        " ".join(f"y{i}" for i in range(23)), # long, ragged tail
        " ".join(f"z{i}" for i in range(13)), # 8 + 5 = exactly 2
        "",                                   # '' -> [''] -> 1 chunk
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = chunk_batch(t, chunk_words=W, overlap=OV).to_pandas()

    # reference loop
    ref = []
    for d, txt in enumerate(texts):
        ws = txt.split(" ")
        s = 0
        i = 0
        while True:
            e = min(s + W, len(ws))
            ref.append((d, i, e - s, " ".join(ws[s:e])))
            if s + W >= len(ws):
                break
            s += step
            i += 1
    got = list(zip(out.doc_id, out.chunk_idx, out.n_words, out.chunk_text))
    assert got == ref

    # every word covered; consecutive chunks overlap by >= OV words
    for d, txt in enumerate(texts):
        ws = txt.split(" ")
        chunks = out[out.doc_id == d]
        assert sum(chunks.n_words) >= len(ws)
        joined_last = None
        for _, row in chunks.iterrows():
            if joined_last is not None:
                assert joined_last.split(" ")[-OV:] == row.chunk_text.split(" ")[:OV] or len(ws) <= W
            joined_last = row.chunk_text

    # SQL oracle parity on the same table (W=64/step=48 form scaled in
    # the registry; here replayed with the test's W/step)
    sql = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n FROM t_arrow),
k AS (
  SELECT doc_id, words, n,
         CASE WHEN n <= 8 THEN 1 ELSE 1 + (n - 8 + 4) // 5 END AS k FROM w),
c AS (SELECT doc_id, words, n, unnest(range(0, k)) AS chunk_idx FROM k)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(least(chunk_idx * 5 + 8, n) - chunk_idx * 5 AS BIGINT) AS n_words,
       array_to_string(words[chunk_idx * 5 + 1 : least(chunk_idx * 5 + 8, n)], ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_idx"""
    t_arrow = t
    oref = duckdb.sql(sql).df()
    assert list(zip(oref.doc_id, oref.chunk_idx, oref.n_words, oref.chunk_text)) == ref
