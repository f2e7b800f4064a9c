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
