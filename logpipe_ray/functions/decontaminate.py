"""Training-set decontamination + PII redaction.

Decontamination: remove documents sharing too many word n-grams with a
benchmark/eval blocklist — the standard pretraining hygiene op. The
blocklist compiles to a set of n-gram hashes broadcast via ray.put
(a Bloom filter at very large blocklist scale); each batch computes
its docs' n-gram hashes vectorized and the overlap fraction against
the set. No shuffle.

Redaction: regex scrubbing of emails / IPs / long digit runs via
pyarrow's RE2 replace kernels — fully vectorized, and expressible in
SQL for oracle checking.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .dedup import _shingle_hashes, _word_hashes

REDACTION_RULES: list[tuple[str, str]] = [
    # (pattern, replacement) — applied in order; RE2-compatible so the
    # DuckDB oracle can replay them with regexp_replace(..., 'g')
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    (r"\d{8,}", "<NUM>"),
]


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    for pattern, repl in REDACTION_RULES:
        text = pc.replace_substring_regex(text, pattern, repl)
    idx = batch.column_names.index(text_col)
    return batch.set_column(idx, text_col, text)


def build_blocklist_ngrams(texts: list[str], n: int = 3) -> np.ndarray:
    """Hash every word n-gram of the blocklist texts (sorted unique).
    Blocklist entries with fewer than n words contribute their full
    word sequence as a single shingle, so short eval answers are still
    catchable (see contamination_fraction's short-doc backstop)."""
    arr = pa.array(texts, pa.string())
    h, lengths = _word_hashes(arr)
    sh, _ = _shingle_hashes(h, lengths, n)
    shorts = []
    for text in texts:
        words = text.split(" ")
        if 0 < len(words) < n:
            sub = pa.array([text], pa.string())
            hh, ll = _word_hashes(sub)
            s2, _ = _shingle_hashes(hh, ll, len(words))
            shorts.append(s2)
    if shorts:
        sh = np.concatenate([sh, *shorts])
    return np.unique(sh)


def contamination_fraction(
    texts: pa.Array, blocklist_hashes: np.ndarray, n: int = 3
) -> np.ndarray:
    """Per-row fraction of the doc's n-grams present in the blocklist."""
    h, lengths = _word_hashes(texts)
    sh, sl = _shingle_hashes(h, lengths, n)
    hits = np.isin(sh, blocklist_hashes)
    out = np.zeros(len(sl))
    starts = np.zeros(len(sl), dtype=np.int64)
    np.cumsum(sl[:-1], out=starts[1:])
    nz = sl > 0
    if hits.size:
        sums = np.add.reduceat(hits.astype(np.int64), starts[nz.nonzero()[0]])
        out[nz] = sums / sl[nz]
    # short-doc backstop: docs with < n words have zero n-grams; score
    # them by their full word sequence as one shingle (exact short
    # blocklist entries then hit contamination 1.0 instead of 0.0)
    short_rows = ((lengths > 0) & (lengths < n)).nonzero()[0]
    for r in short_rows:
        sub = texts.slice(r, 1)
        hh, ll = _word_hashes(sub)
        s2, _ = _shingle_hashes(hh, ll, int(lengths[r]))
        if s2.size and np.isin(s2, blocklist_hashes).all():
            out[r] = 1.0
    return out


# above this many distinct blocklist n-grams, decontaminate() switches
# the broadcast representation to a Bloom filter automatically
BLOOM_THRESHOLD_NGRAMS = 5_000_000


class BloomFilter:
    """Vectorized Bloom filter over uint64 hashes (numpy bitset).

    For blocklists too large to broadcast as an exact hash set: m bits
    + k probes, all membership tests vectorized (no per-item Python).
    No false negatives — a contaminated doc can never slip through;
    false positives over-flag at rate ~(1 - e^{-kn/m})^k, so size m
    for the target rate (~10 bits/element => ~1% at k=7)."""

    def __init__(self, m_bits: int, k: int = 7):
        self.m = int(m_bits)
        self.k = k
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        # double hashing: pos_i = (h1 + i*h2) mod m, derived from the
        # 64-bit input hash — standard Kirsch-Mitzenmacher
        from .dedup import _splitmix

        h1 = h.astype(np.uint64)
        h2 = _splitmix(h1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(
                np.int64
            )

    def add(self, h: np.ndarray) -> None:
        pos = self._positions(h).reshape(-1)
        np.bitwise_or.at(
            self.bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
        )

    def contains(self, h: np.ndarray) -> np.ndarray:
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        word = self.bits[pos >> 6]
        bit = (word >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return bit.all(axis=0).astype(bool)


def build_blocklist_bloom(
    texts: list[str], n: int = 3, bits_per_elem: int = 10, k: int = 7
) -> BloomFilter:
    """Bloom-filter form of build_blocklist_ngrams for blocklists too
    large to broadcast exactly (~1.25 bytes/element vs 8)."""
    hashes = build_blocklist_ngrams(texts, n)
    bf = BloomFilter(max(64, len(hashes) * bits_per_elem), k)
    bf.add(hashes)
    return bf


def contamination_fraction_bloom(
    texts: pa.Array, bloom: BloomFilter, n: int = 3
) -> np.ndarray:
    """contamination_fraction against a Bloom filter — identical shape,
    membership via vectorized bitset probes. Never under-reports."""
    h, lengths = _word_hashes(texts)
    sh, sl = _shingle_hashes(h, lengths, n)
    hits = bloom.contains(sh)
    out = np.zeros(len(sl))
    starts = np.zeros(len(sl), dtype=np.int64)
    np.cumsum(sl[:-1], out=starts[1:])
    nz = sl > 0
    if hits.size:
        sums = np.add.reduceat(hits.astype(np.int64), starts[nz.nonzero()[0]])
        out[nz] = sums / sl[nz]
    # same short-doc backstop as contamination_fraction
    short_rows = ((lengths > 0) & (lengths < n)).nonzero()[0]
    for r in short_rows:
        sub = texts.slice(r, 1)
        hh, ll = _word_hashes(sub)
        s2, _ = _shingle_hashes(hh, ll, int(lengths[r]))
        if s2.size and bloom.contains(s2).all():
            out[r] = 1.0
    return out


def decontaminate(
    ds: Dataset,
    blocklist_texts: list[str],
    text_col: str = "text",
    n: int = 3,
    max_overlap: float = 0.2,
    keep_contaminated: bool = False,
    use_bloom: bool | None = None,
) -> Dataset:
    """Filter out documents whose n-gram overlap with the blocklist
    exceeds ``max_overlap`` (or keep ONLY those, for auditing).

    ``use_bloom=None`` (default) switches to the Bloom-filter
    representation automatically above BLOOM_THRESHOLD_NGRAMS distinct
    blocklist n-grams (~1.25 bytes/element broadcast instead of 8;
    false positives only over-flag — never under-report)."""
    hashes = build_blocklist_ngrams(blocklist_texts, n)
    if use_bloom is None:
        use_bloom = len(hashes) > BLOOM_THRESHOLD_NGRAMS
    if use_bloom:
        bf = BloomFilter(max(64, len(hashes) * 10), 7)
        bf.add(hashes)
        bl_ref = ray.put(bf)
    else:
        bl_ref = ray.put(hashes)

    def fn(batch: pa.Table) -> pa.Table:
        bl = ray.get(bl_ref)
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if isinstance(bl, BloomFilter):
            frac = contamination_fraction_bloom(text, bl, n)
        else:
            frac = contamination_fraction(text, bl, n)
        out = batch.append_column("contamination", pa.array(frac))
        mask = frac > max_overlap if keep_contaminated else frac <= max_overlap
        return out.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")
