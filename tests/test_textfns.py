import re

import numpy as np
import pyarrow as pa

from logpipe_ray.functions.textfns import (
    BPE_SPLIT_PATTERN,
    fingerprint_batch,
    langid_batch,
    quality_batch,
    token_count_batch,
)


def _t(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_langid_heuristic():
    out = langid_batch(
        _t(
            [
                "the cat sat on the mat and it was happy in the sun",
                "der Hund und die Katze sind nicht in das Haus gegangen",
                "le chat est dans la maison et il est pour le moment",
                "el perro es un animal que vive en la casa por ahora",
                "你好世界这是一个测试",
                "zzzz qqqq xxxx",
            ]
        )
    )
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "es", "zh", "unk"]


def test_quality_features():
    out = quality_batch(
        _t(
            [
                "the quick brown fox jumps over the lazy dog and runs far away today",
                "!!! ??? ### $$$ %%%",
                "word " * 60,
            ]
        )
    )
    scores = out["quality_score"].to_pylist()
    assert scores[0] > scores[1]  # prose beats punctuation soup
    assert out["n_words"].to_pylist()[0] == 14
    assert out["punct_ratio"].to_pylist()[1] > 0.5


def test_token_counts_match_python_re():
    texts = [
        "hello world it's a test-case with 123 numbers!",
        "one",
        "a b c d",
    ]
    out = token_count_batch(_t(texts))
    pat = re.compile(BPE_SPLIT_PATTERN)
    for i, s in enumerate(texts):
        assert out["n_ws_tokens"][i].as_py() == len(s.split(" "))
        assert out["n_bpe_tokens"][i].as_py() == len(pat.findall(s))


def test_fingerprint_deterministic_and_shift_tolerant():
    base = "the quick brown fox jumps over the lazy dog " * 5
    t1 = fingerprint_batch(_t([base, base, "prefix " + base, "xy", ""]))
    fp = t1["fingerprint"].to_pylist()
    assert fp[0] == fp[1]  # identical docs -> identical fingerprint
    assert fp[0] == fp[2]  # min-of-rolling-hash survives a prefix insert
    t2 = fingerprint_batch(_t([base]))
    assert t2["fingerprint"][0].as_py() == fp[0]  # batch-independent
