"""Training-shard writer (`pipelines/shards.py`): per-input-shard
packing, atomic resumable output, read-back.

Reference parity note: the reference has no training-shard stage (it is
a log pipeline); this is builder-brief surface for the 100-TB training
corpus, reusing the byte-equal-tested `pack_batch` greedy packer.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

from logpipe_ray.functions.tokens import pack_batch
from logpipe_ray.pipelines.shards import (
    read_training_shards,
    write_training_shards,
)


@pytest.fixture()
def packed_out(ray_session, tiny_sequences, tmp_path):
    out = str(tmp_path / "packed")
    stats = write_training_shards(tiny_sequences, out, context_len=256)
    return out, stats


def test_write_matches_per_shard_pack(ray_session, tiny_sequences, packed_out):
    """Each output file is byte-equal to pack_batch over its own input
    shard — context boundaries never depend on block splitting."""
    out, stats = packed_out
    in_files = sorted(glob.glob(os.path.join(tiny_sequences, "*.parquet")))
    assert stats["shards"] == len(in_files) and stats["skipped"] == 0
    total = 0
    for path in in_files:
        expect = pack_batch(
            pq.read_table(path, columns=["doc_id", "tokens"]), context_len=256
        )
        got = pq.read_table(
            os.path.join(out, f"packed_{os.path.basename(path)}")
        )
        assert got.equals(expect)
        total += expect.num_rows
    assert stats["contexts"] == total
    assert 0.0 < stats["fill_ratio_mean"] <= 1.0


def test_resume_skips_and_repairs(ray_session, tiny_sequences, packed_out):
    out, stats = packed_out
    files = sorted(glob.glob(os.path.join(out, "packed_*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in files}

    # full rerun: everything committed, nothing re-packed
    again = write_training_shards(tiny_sequences, out, context_len=256)
    assert again["skipped"] == len(files)
    assert again["contexts"] == stats["contexts"]
    assert {f: os.path.getmtime(f) for f in files} == mtimes

    # simulate a lost output file (crash between rename and a later
    # wipe): only that shard is re-packed
    victim = files[0]
    os.remove(victim)
    repaired = write_training_shards(tiny_sequences, out, context_len=256)
    assert repaired["skipped"] == len(files) - 1
    assert os.path.exists(victim)
    assert repaired["contexts"] == stats["contexts"]


def test_read_back_round_trip(ray_session, tiny_sequences, packed_out):
    out, stats = packed_out
    ds = read_training_shards(out)
    assert ds.count() == stats["contexts"]
    cols = set(ds.schema().names)
    assert {"context_tokens", "doc_ids", "n_seqs", "fill_ratio"} <= cols
    # every packed context is exactly context_len tokens
    import pyarrow.compute as pc

    for batch in ds.iter_batches(batch_format="pyarrow"):
        lens = pc.list_value_length(batch["context_tokens"])
        assert pc.min(lens).as_py() == pc.max(lens).as_py() == 256

    # no tmp turds, manifest covers every file
    assert not glob.glob(os.path.join(out, ".*tmp"))
