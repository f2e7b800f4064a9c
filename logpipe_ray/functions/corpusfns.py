"""Corpus-statistics operators for training-data curation: Gopher-style
per-document repetition signals, corpus-level n-gram novelty (inter-
document overlap), and TF-IDF term scoring.

These complement textfns.py (language ID / quality / fingerprint): the
signals here are the repetition/overlap family used by large-scale
pretraining-data filters (duplicate-word fraction, top-n-gram fraction,
fraction of a document's n-grams already seen earlier in the corpus).
All per-document computations are single Arrow/numpy passes; the
corpus-level ones reduce to one groupby + one hash join (documented in
the queries that use them).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _combine(col):
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _ranges(counts: np.ndarray) -> np.ndarray:
    """concat([arange(c) for c in counts]) without the Python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _words_flat(text: pa.Array):
    """Split on single spaces; return (flat word values, per-row word
    counts, per-row start offsets into the flat array)."""
    words = _combine(pc.split_pattern(text, " "))
    flat = pc.list_flatten(words)
    lengths = np.asarray(pc.list_value_length(words).fill_null(0), dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    return flat, lengths, offsets


# ------------------------------------------------------- repetition stats


def repetition_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Per-document repetition signals (Gopher-style filters):
    duplicate-word fraction, top-unigram fraction, top-bigram fraction.

    Embarrassingly parallel (no cross-document state). Vectorized: one
    Arrow group_by over (row, word) and one over (row, bigram) per
    batch — no per-row Python.
    """
    text = _combine(batch[text_col])
    ids = _combine(batch[id_col])
    n = len(text)
    flat, lengths, offsets = _words_flat(text)

    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    wt = pa.table({"d": pa.array(doc_idx), "w": flat})
    g = wt.group_by(["d", "w"]).aggregate([([], "count_all")])
    s = g.group_by("d").aggregate(
        [("count_all", "sum"), ("count_all", "count"), ("count_all", "max")]
    )
    d = np.asarray(s["d"])
    n_words = np.zeros(n, dtype=np.int64)
    n_distinct = np.zeros(n, dtype=np.int64)
    max_word = np.zeros(n, dtype=np.int64)
    n_words[d] = np.asarray(s["count_all_sum"])
    n_distinct[d] = np.asarray(s["count_all_count"])
    max_word[d] = np.asarray(s["count_all_max"])

    # bigrams: adjacent word pairs within each row
    nb = np.maximum(lengths - 1, 0)
    if nb.sum():
        idx = np.repeat(offsets[:-1], nb) + _ranges(nb)
        w0 = flat.take(pa.array(idx))
        w1 = flat.take(pa.array(idx + 1))
        big = pc.binary_join_element_wise(w0, w1, " ")
        bt = pa.table(
            {"d": pa.array(np.repeat(np.arange(n, dtype=np.int64), nb)), "b": big}
        )
        bg = bt.group_by(["d", "b"]).aggregate([([], "count_all")])
        bs = bg.group_by("d").aggregate([("count_all", "max")])
        max_big = np.zeros(n, dtype=np.int64)
        max_big[np.asarray(bs["d"])] = np.asarray(bs["count_all_max"])
    else:
        max_big = np.zeros(n, dtype=np.int64)

    nw_safe = np.maximum(n_words, 1).astype(np.float64)
    dup_word_frac = (n_words - n_distinct) / nw_safe
    top_word_frac = max_word / nw_safe
    top_bigram_frac = max_big / np.maximum(n_words - 1, 1).astype(np.float64)

    return pa.table(
        {
            "doc_id": ids,
            "n_words": pa.array(n_words),
            "n_distinct_words": pa.array(n_distinct),
            "dup_word_frac": pa.array(dup_word_frac),
            "top_word_frac": pa.array(top_word_frac),
            "top_bigram_frac": pa.array(top_bigram_frac),
        }
    )


# ------------------------------------------------------------ n-grams


def ngram_batch(
    batch: pa.Table, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Explode each document into its DISTINCT word n-grams:
    (doc_id, gram) rows. Vectorized: the n shifted takes over the flat
    word buffer + one element-wise join build every gram in the batch
    at once; distinctness via one Arrow group_by.

    Documents shorter than ``n`` words emit no rows (same convention as
    the SQL oracles that replay this)."""
    text = _combine(batch[text_col])
    ids = np.asarray(_combine(batch[id_col]))
    flat, lengths, offsets = _words_flat(text)
    ng = np.maximum(lengths - (n - 1), 0)
    if ng.sum() == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "gram": pa.array([], pa.string())}
        )
    idx = np.repeat(offsets[:-1], ng) + _ranges(ng)
    parts = [flat.take(pa.array(idx + j)) for j in range(n)]
    gram = pc.binary_join_element_wise(*parts, " ")
    doc_rep = np.repeat(np.arange(len(lengths), dtype=np.int64), ng)
    t = pa.table({"doc_id": pa.array(ids[doc_rep]), "gram": gram})
    return t.group_by(["doc_id", "gram"]).aggregate([])


# ------------------------------------------------------- span explode

# span_idx must fit under this stride so (doc_id, span_idx) packs into
# one int64 global-first key: doc_id < 2^39 and spans/doc < 2^24
# (16.7M spans = a 134M-word document at k=8)
SPAN_STRIDE = 1 << 24


def span_batch(
    batch: pa.Table, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Explode each document into non-overlapping ``k``-word spans:
    (doc_id, span_idx, span, packed) rows — the C4 duplicate-span
    removal unit (Raffel et al. 2020 remove repeated three-sentence
    spans; the fixture corpus has no sentence boundaries, so the span
    unit is k words). ``packed = doc_id * SPAN_STRIDE + span_idx`` is
    the global first-occurrence order key.

    Vectorized: spans tile the flat word buffer contiguously, so the
    concatenated span starts ARE valid list offsets — one ListArray
    rebuild + one binary_join builds every span string in the batch.
    A document always emits >= 1 span (splitting "" yields one empty
    word, matching the SQL oracle's string_split)."""
    text = _combine(batch[text_col])
    ids = np.asarray(_combine(batch[id_col]), dtype=np.int64)
    flat, lengths, offsets = _words_flat(text)
    n_spans = (lengths + k - 1) // k
    total = int(n_spans.sum())
    if total == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_idx": pa.array([], pa.int64()),
                "span": pa.array([], pa.string()),
                "packed": pa.array([], pa.int64()),
            }
        )
    rep = np.repeat(np.arange(len(lengths), dtype=np.int64), n_spans)
    within = _ranges(n_spans)
    if within.size and int(within.max()) >= SPAN_STRIDE:
        raise ValueError("document exceeds SPAN_STRIDE spans; raise k")
    starts = offsets[:-1][rep] + k * within
    list_offsets = np.append(starts, offsets[-1])
    spans_words = pa.ListArray.from_arrays(
        pa.array(list_offsets, pa.int32()), flat
    )
    span = pc.binary_join(spans_words, " ")
    doc_rep = ids[rep]
    return pa.table(
        {
            "doc_id": pa.array(doc_rep),
            "span_idx": pa.array(within),
            "span": span,
            "packed": pa.array(doc_rep * SPAN_STRIDE + within),
        }
    )


# ------------------------------------------------------------ C4-style gate

# rule thresholds (C4-flavored, Raffel et al. 2020 §2.2 adapted to the
# space-separated fixtures — no sentence punctuation to test against)
C4_MIN_WORDS = 10
C4_MAX_WORDS = 1_000
C4_MIN_MEAN_WLEN = 2.0
C4_MAX_MEAN_WLEN = 12.0
C4_MAX_DUP_WORD_FRAC = 0.5

# first matching rule (in order) becomes the drop reason
_C4_RULES = [
    "too_few_words",
    "too_many_words",
    "bad_mean_word_len",
    "repetitive",
    "no_stopword",
]


def c4_filter_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """C4-style cleaning gate with reason codes: every document gets
    (keep, reason) where reason names the FIRST failing rule (word
    count bounds, mean word length, duplicate-word fraction, english
    stopword presence) or null when kept. One pass, no shuffle; all
    features are the same exact integer-derived expressions the
    repetition/quality oracles replay."""
    import pyarrow.compute as pc

    text = _combine(batch[text_col])
    ids = _combine(batch[id_col])
    n = len(text)
    flat, lengths, offsets = _words_flat(text)
    n_chars = np.asarray(pc.utf8_length(text), dtype=np.float64)
    n_words = lengths.astype(np.float64)
    nw_safe = np.maximum(n_words, 1)
    mean_wlen = (n_chars - (n_words - 1)) / nw_safe

    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    dist = (
        pa.table({"d": pa.array(doc_idx), "w": flat})
        .group_by(["d", "w"])
        .aggregate([])
        .group_by("d")
        .aggregate([([], "count_all")])
    )
    n_distinct = np.zeros(n, dtype=np.float64)
    n_distinct[np.asarray(dist["d"])] = np.asarray(dist["count_all"])
    dup_frac = (n_words - n_distinct) / nw_safe

    lower = pc.utf8_lower(text)
    stop_hits = np.zeros(n, dtype=np.float64)
    from .textfns import _STOPWORDS

    for w in _STOPWORDS:
        stop_hits += np.asarray(pc.count_substring(lower, f" {w} "), np.float64)

    conds = [
        n_words < C4_MIN_WORDS,
        n_words > C4_MAX_WORDS,
        (mean_wlen < C4_MIN_MEAN_WLEN) | (mean_wlen > C4_MAX_MEAN_WLEN),
        dup_frac > C4_MAX_DUP_WORD_FRAC,
        stop_hits == 0,
    ]
    reason = np.full(n, None, dtype=object)
    unset = np.ones(n, dtype=bool)
    for cond, name in zip(conds, _C4_RULES):
        hit = unset & cond
        reason[hit] = name
        unset &= ~cond
    return pa.table(
        {
            "doc_id": ids,
            "keep": pa.array(unset),
            "reason": pa.array(reason, pa.string()),
        }
    )


# ------------------------------------------------------------- tf partials


def tf_partial(batch: pa.Table, lang_col: str = "lang", text_col: str = "text"):
    """Per-batch (lang, term) occurrence counts — mergeable partial for
    the TF side of TF-IDF."""
    text = _combine(batch[text_col])
    langs = _combine(batch[lang_col])
    flat, lengths, _ = _words_flat(text)
    lang_rep = langs.take(
        pa.array(np.repeat(np.arange(len(lengths), dtype=np.int64), lengths))
    )
    t = pa.table({"lang": lang_rep, "term": flat})
    g = t.group_by(["lang", "term"]).aggregate([([], "count_all")])
    return g.rename_columns(["lang", "term", "p"])


def df_partial(batch: pa.Table, text_col: str = "text"):
    """Per-batch document-frequency partial: distinct (doc, term) within
    the batch collapsed to per-term doc counts. Rows are whole documents,
    so within-batch distinctness is globally exact."""
    text = _combine(batch[text_col])
    flat, lengths, _ = _words_flat(text)
    doc_idx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    t = pa.table({"d": pa.array(doc_idx), "term": flat})
    dist = t.group_by(["d", "term"]).aggregate([])
    g = dist.group_by("term").aggregate([([], "count_all")])
    return g.rename_columns(["term", "p"])


def chunk_batch(
    t: pa.Table,
    chunk_words: int = 64,
    overlap: int = 16,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Split each document into overlapping fixed-width word windows —
    the flat_map (1 row -> N rows) primitive of context-window corpus
    prep (long doc -> training-sized chunks; RAG passage splitting).

    Chunk i covers words [i*step, min(i*step + chunk_words, n)) with
    step = chunk_words - overlap; the last chunk is the first one that
    reaches the end of the document, so every word is covered and
    consecutive chunks share exactly ``overlap`` words (the tail chunk
    may share more). Every non-empty document yields >= 1 chunk; the
    chunk count is the closed form 1 + ceil((n - W)/step) for n > W,
    else 1 — which is what makes the whole expansion one vectorized
    gather (np.repeat + flat-buffer take + binary_join), no Python
    loop over rows or chunks.

    Columns out: doc_col, chunk_idx (int64), n_words (int64),
    chunk_text (words re-joined with single spaces — the corpus's own
    separator convention, see _words_flat).
    """
    if overlap >= chunk_words:
        raise ValueError("overlap must be < chunk_words")
    step = chunk_words - overlap
    text = _combine(t[text_col])
    flat, lengths, offsets = _words_flat(text)
    n = lengths
    k = np.where(
        n == 0,
        0,
        np.where(n <= chunk_words, 1, 1 + (n - chunk_words + step - 1) // step),
    ).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), k)
    chunk_idx = _ranges(k)
    start = chunk_idx * step
    end = np.minimum(start + chunk_words, n[doc_idx])
    cw = end - start
    widx = np.repeat(offsets[:-1][doc_idx] + start, cw) + _ranges(cw)
    chunk_vals = flat.take(pa.array(widx, pa.int64()))
    loff = np.concatenate([[0], np.cumsum(cw)])
    lists = pa.LargeListArray.from_arrays(
        pa.array(loff, pa.int64()), chunk_vals.cast(pa.large_string())
    )
    return pa.table(
        {
            doc_col: _combine(t[doc_col]).take(pa.array(doc_idx, pa.int64())),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_words": pa.array(cw, pa.int64()),
            "chunk_text": pc.binary_join(
                lists, pa.scalar(" ", pa.large_string())
            ).cast(pa.string()),
        }
    )
