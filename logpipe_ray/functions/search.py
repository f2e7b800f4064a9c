"""Full-text relevance scoring (BM25-style) over a document table.

The reference repo has no search operator; this is beyond-reference
training-data surface (SURVEY.md §2.6): scoring every document against
a keyword query and pulling the top hits is the standard corpus
inspection / decontamination-debug tool at corpus scale.

Scale shape: pass 1 computes the global stats (doc count, total word
count, per-term document frequency) with integer-only mergeable
partials — one tiny row per block, summed on the driver (bounded by
block count) and broadcast by closure to pass 2. Pass 2 scores every
document vectorized (one lower+split, then per-term equality masks
over the flat word buffer with cumsum segment sums) and keeps a local
top-k per block, so the global merge moves only k rows per block.
Document text itself is never shuffled.

Determinism (oracle hash-parity): the score uses the Lucene-style
rational idf (N - df + 0.5)/(df + 0.5) WITHOUT the log wrapper —
every op in the scoring expression (add/sub/mul/div on float64) is
IEEE-754 correctly-rounded and therefore bitwise-identical between
numpy and the DuckDB oracle; a transcendental log is not guaranteed
correctly rounded across libm implementations. The SQL oracle spells
out the identical expression tree, term by term, in the same order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

WORD_SPLIT_RE = "[^a-z0-9]+"


def _word_features(
    text: pa.Array | pa.ChunkedArray, terms: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    """(dl, tf[n_terms x n_rows]): per-row non-empty word count and
    per-term occurrence counts, all vectorized (no per-row Python)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern_regex(pc.utf8_lower(text), WORD_SPLIT_RE)
    flat = words.flatten()
    lengths = np.asarray(pc.list_value_length(words).fill_null(0), dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)])

    def seg_sum(mask: np.ndarray) -> np.ndarray:
        csum = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
        return csum[starts[1:]] - csum[starts[:-1]]

    nonempty = np.asarray(pc.not_equal(flat, "").fill_null(False))
    dl = seg_sum(nonempty)
    tf = np.stack(
        [seg_sum(np.asarray(pc.equal(flat, t).fill_null(False))) for t in terms]
    ) if terms else np.zeros((0, len(text)), dtype=np.int64)
    return dl, tf


def corpus_term_stats(
    ds: Dataset, terms: list[str], text_col: str = "text"
) -> dict:
    """{n_docs, dl_sum, df: [per-term]} — integer mergeable partials,
    one row per block, driver sum bounded by block count."""

    def partial(t: pa.Table) -> pa.Table:
        dl, tf = _word_features(t[text_col], terms)
        row = {"n": [len(dl)], "dl_sum": [int(dl.sum())]}
        for i in range(len(terms)):
            row[f"df{i}"] = [int((tf[i] > 0).sum())]
        return pa.table(row)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sum()
    )
    return {
        "n_docs": int(merged["n"]),
        "dl_sum": int(merged["dl_sum"]),
        "df": [int(merged[f"df{i}"]) for i in range(len(terms))],
    }


def bm25_topk(
    ds: Dataset,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
    k1: float = 1.2,
    b: float = 0.75,
) -> Dataset:
    """Top-k documents by (log-free) BM25 against ``terms``.

    Two streaming passes over the text; the only data movement after
    scoring is k rows per block into the final top-k merge.
    """
    from ..stages.aggregate import top_k as _topk

    stats = corpus_term_stats(ds, terms, text_col)
    n = float(stats["n_docs"])
    # avgdl: one int/int division, exactly rounded — matches the
    # oracle's CAST(dl_sum AS DOUBLE) / n
    avgdl = float(stats["dl_sum"]) / n
    idf = [(n - df + 0.5) / (df + 0.5) for df in stats["df"]]

    def score(t: pa.Table) -> pa.Table:
        dl_i, tf = _word_features(t[text_col], terms)
        dl = dl_i.astype(np.float64)
        score = np.zeros(len(dl_i), dtype=np.float64)
        # fixed term order, left-associated sum — identical to the
        # oracle's s0 + s1 + ... expression tree
        for i in range(len(terms)):
            tfi = tf[i].astype(np.float64)
            denom = tfi + k1 * (1.0 - b + b * (dl / avgdl))
            score = score + (idf[i] * (tfi * (k1 + 1.0))) / denom
        return pa.table(
            {
                id_col: t[id_col],
                "dl": pa.array(dl_i),
                "score": pa.array(score),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return _topk(scored, [("score", "descending"), (id_col, "ascending")], k)


def bm25_sql(
    table: str, terms: list[str], k: int = 25, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB oracle for :func:`bm25_topk` — same expression tree."""
    tf_cols = ",\n    ".join(
        f"len(list_filter(words, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n    ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    # every numeric literal is ::DOUBLE — DuckDB parses a bare `1.2`
    # as DECIMAL(2,1) and decimal arithmetic rounds differently from
    # IEEE double (measured: 1-2 ulp drift), which breaks hash parity
    score_terms = " + ".join(
        f"(((s.n - s.df{i} + 0.5::DOUBLE) / (s.df{i} + 0.5::DOUBLE))"
        f" * (f.tf{i} * ({k1}::DOUBLE + 1.0::DOUBLE)))"
        f" / (f.tf{i} + {k1}::DOUBLE * (1.0::DOUBLE - {b}::DOUBLE"
        f" + {b}::DOUBLE * (f.dl / s.avgdl)))"
        for i in range(len(terms))
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{WORD_SPLIT_RE}'),
                     x -> x <> '') AS words
  FROM {table}
),
feat AS (
  SELECT doc_id, len(words) AS dl,
    {tf_cols}
  FROM w
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
    {df_cols}
  FROM feat
)
SELECT doc_id, dl, score FROM (
  SELECT f.doc_id, CAST(f.dl AS BIGINT) AS dl,
         {score_terms} AS score
  FROM feat f CROSS JOIN stats s
)
ORDER BY score DESC, doc_id LIMIT {k}"""
