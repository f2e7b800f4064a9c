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
