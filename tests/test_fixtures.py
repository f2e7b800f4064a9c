import glob
import json
import os
import re

import pyarrow.parquet as pq

from logpipe_ray.fixtures.generator import SEQUENCES_SCHEMA, generate_shard
from logpipe_ray.tokenizer import detokenize

MASTER = re.compile(
    r'^\{"timestamp":"[^"]+","level":"(?:INFO|WARN|ERROR)","service":"[a-z-]+",.*[^,]\}$'
)


def test_deterministic():
    a = generate_shard(0, 500, 0, 100)
    b = generate_shard(0, 500, 0, 100)
    assert a.equals(b)
    c = generate_shard(1, 500, 500, 100)
    assert not a.equals(c)


def test_schema_and_consistency():
    t = generate_shard(0, 1000, 0, 100)
    assert t.schema.equals(SEQUENCES_SCHEMA)
    n_tok = t["n_tok"].to_pylist()
    toks = t["tokens"].to_pylist()
    assert all(len(tk) == n for tk, n in zip(toks, n_tok))
    assert all(d == f"doc-{i:012d}" for i, d in enumerate(t["doc_id"].to_pylist()))


def test_lines_ascii_and_validity_matches_regex():
    t = generate_shard(0, 3000, 0, 100)
    lines = detokenize(t["tokens"]).to_pylist()
    n_bad = 0
    for line in lines:
        line.encode("ascii")  # raises if non-ascii
        try:
            rec = json.loads(line) if line else None
            ok_json = isinstance(rec, dict)
        except Exception:
            ok_json = False
        ok_re = bool(MASTER.match(line))
        assert ok_json == ok_re, repr(line[:100])
        n_bad += not ok_json
    # ~2% malformed + ~2% blank
    assert 0.02 < n_bad / len(lines) < 0.07


def test_source_skew_and_service_matches_source():
    t = generate_shard(0, 5000, 0, 100)
    lines = detokenize(t["tokens"]).to_pylist()
    sources = t["source"].to_pylist()
    frac_auth = sources.count("auth") / len(sources)
    assert 0.65 < frac_auth < 0.75
    for line, src in zip(lines, sources):
        if MASTER.match(line):
            assert json.loads(line)["service"] == src


def test_ensure_sequences_atomic(tiny_sequences):
    files = sorted(glob.glob(os.path.join(tiny_sequences, "shard_*.parquet")))
    assert len(files) == 4
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == 2000
    assert os.path.exists(os.path.join(tiny_sequences, "_SUCCESS"))
