"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting. All batch-vectorized.

These are the training-data-pipeline text primitives; each has a
queries() exposure (SQL oracle where expressible, rows-only otherwise)
and unit tests on synthetic multilingual text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------- language id

# Tiny built-in stopword/character profiles (public knowledge). The
# n-gram heuristic: score = stopword hits + diacritic/char-class hits.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "por", "para"},
}
_LANG_CHARS = {
    "de": "äöüß",
    "fr": "éèêàçôû",
    "es": "ñáíóú¿¡",
}
_LANGS = ["en", "de", "fr", "es", "zh"]


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append `lang_pred`: stopword + char-class heuristic; CJK
    codepoints dominate -> zh. Vectorized via per-language substring
    counts over the whole column."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lower = pc.utf8_lower(text)
    n = len(text)
    scores = np.zeros((n, len(_LANGS)), dtype=np.float64)
    for li, lang in enumerate(_LANGS[:4]):
        for w in _LANG_PROFILES[lang]:
            cnt = pc.count_substring(lower, f" {w} ")
            scores[:, li] += np.asarray(cnt, dtype=np.float64)
        for ch in _LANG_CHARS.get(lang, ""):
            cnt = pc.count_substring(lower, ch)
            scores[:, li] += 2.0 * np.asarray(cnt, dtype=np.float64)
    # zh: CJK ranges — count via regex
    cjk = pc.count_substring_regex(text, r"[\x{4E00}-\x{9FFF}]")
    scores[:, 4] = 3.0 * np.asarray(cjk, dtype=np.float64)
    best = np.argmax(scores, axis=1)
    nomatch = scores.max(axis=1) == 0
    pred = np.array(_LANGS, dtype=object)[best]
    pred[nomatch] = "unk"
    return batch.append_column("lang_pred", pa.array(pred, pa.string()))


# --------------------------------------------------------------- quality

_STOPWORDS = _LANG_PROFILES["en"]


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append quality features + a composite score in [0, 1]:
    word count, mean word length, stopword ratio, punctuation ratio,
    uppercase ratio. All Arrow-kernel vectorized."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = np.asarray(pc.utf8_length(text), dtype=np.float64)
    words = pc.split_pattern(text, " ")
    n_words = np.asarray(pc.list_value_length(words).fill_null(0), dtype=np.float64)
    n_words_safe = np.maximum(n_words, 1)
    stop_hits = np.zeros(len(text), dtype=np.float64)
    lower = pc.utf8_lower(text)
    for w in _STOPWORDS:
        stop_hits += np.asarray(pc.count_substring(lower, f" {w} "), np.float64)
    punct = np.asarray(pc.count_substring_regex(text, r"[^\w\s]"), np.float64)
    upper = np.asarray(pc.count_substring_regex(text, r"[A-Z]"), np.float64)
    mean_wlen = (n_chars - (n_words - 1)) / n_words_safe
    stop_ratio = stop_hits / n_words_safe
    punct_ratio = punct / np.maximum(n_chars, 1)
    upper_ratio = upper / np.maximum(n_chars, 1)
    # composite: reasonable doc = enough words, sane word length,
    # not all punctuation/caps
    score = (
        np.clip(n_words / 50.0, 0, 1) * 0.4
        + np.clip(1.0 - np.abs(mean_wlen - 5.0) / 5.0, 0, 1) * 0.3
        + np.clip(1.0 - punct_ratio * 5, 0, 1) * 0.2
        + np.clip(1.0 - upper_ratio * 5, 0, 1) * 0.1
    )
    out = batch
    for name, arr in [
        ("n_words", n_words.astype(np.int64)),
        ("mean_word_len", mean_wlen),
        ("stopword_ratio", stop_ratio),
        ("punct_ratio", punct_ratio),
        ("quality_score", score),
    ]:
        out = out.append_column(name, pa.array(arr))
    return out


# ----------------------------------------------------------- token counting

# BPE-ish pre-tokenization regex (GPT-2-style split, RE2-compatible):
# contractions | words | numbers | other non-space | whitespace runs
BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def token_count_batch(
    batch: pa.Table, text_col: str = "text", pattern: str = BPE_SPLIT_PATTERN
) -> pa.Table:
    """Append `n_ws_tokens` (whitespace) and `n_bpe_tokens` (regex
    pre-tokenizer match count) — both single Arrow kernel calls."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    ws = pc.list_value_length(pc.split_pattern(text, " ")).cast(pa.int64())
    bpe = pc.count_substring_regex(text, pattern).cast(pa.int64())
    out = batch.append_column("n_ws_tokens", ws)
    return out.append_column("n_bpe_tokens", bpe)


# ------------------------------------------------------------- fingerprint

_FP_BASE = np.uint64(1099511628211)


def fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 8
) -> pa.Table:
    """Append `fingerprint`: winnowing-style document fingerprint — the
    minimum of rolling Karp-Rabin hashes over byte windows. Equal docs
    always share it; near-equal docs share it with high probability.
    Vectorized over the flat utf8 buffer (no per-row loop; the rolling
    combine is `window` shifted multiply-adds over the whole buffer)."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    offsets = np.frombuffer(
        text.buffers()[1], dtype=np.int32, count=n + 1, offset=text.offset * 4
    ).astype(np.int64)
    data = np.frombuffer(text.buffers()[2], dtype=np.uint8)
    lengths = offsets[1:] - offsets[:-1]
    out = np.zeros(n, dtype=np.uint64)
    if data.size:
        with np.errstate(over="ignore"):
            h = np.zeros(len(data), dtype=np.uint64)
            for j in range(window):
                shifted = data[j:].astype(np.uint64)
                h = h[: len(shifted)] * _FP_BASE + shifted
            # h[i] hashes bytes i..i+window-1 (crossing row borders at
            # the tail of each row; masked below). min per row via ONE
            # interleaved reduceat: boundaries [s0,e0,s1,e1,...] give
            # mins over [s_i,e_i) at even positions (gap segments at
            # odd positions are discarded).
            win_lengths = np.maximum(lengths - (window - 1), 0)
            rows = (win_lengths > 0).nonzero()[0]
            if len(rows):
                starts = offsets[rows]
                ends = starts + win_lengths[rows]
                bounds = np.empty(2 * len(rows), dtype=np.int64)
                bounds[0::2] = starts
                bounds[1::2] = ends
                if bounds[-1] >= len(h):
                    bounds = bounds[:-1]  # last segment runs to array end
                mins = np.minimum.reduceat(h, bounds)[0::2]
                out[rows] = mins
            # short docs (< window bytes): hash the whole content with
            # the same rolling scheme — vectorized by re-using h-style
            # accumulation over each short row's full span
            short = ((lengths > 0) & (win_lengths == 0)).nonzero()[0]
            for r in short:  # rows shorter than `window` bytes are rare
                acc = np.uint64(0)
                for b in data[offsets[r] : offsets[r + 1]]:
                    acc = acc * _FP_BASE + np.uint64(b)
                out[r] = acc
    return batch.append_column("fingerprint", pa.array(out.astype(np.int64)))
