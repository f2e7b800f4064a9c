"""End-to-end training-corpus build: curate -> tokenize -> pack ->
resumable training shards.

The full LLM-data path the individual operators compose into:

    documents --c4 gate--> --span dedup (rewrite)--> --decontaminate-->
    --exact dedup--> --byte-tokenize--> curated sequences parquet
    --greedy pack--> fixed-length context shards (write_training_shards)

Stage choices mirror the published pipelines the operators came from
(C4 cleaning gate + duplicate-span removal, Raffel et al. 2020;
benchmark decontamination, Brown et al. 2020; exact dedup, Lee et al.
2021) — see the per-operator modules for the 100-TB scale shape of
each stage. The curate phase is one streaming Dataset chain whose only
exchanges are the span-dedup first-occurrence reduce and the exact-
dedup keyed aggregate; the pack phase is per-shard-independent
(pipelines/shards.py) so a 256-node cluster writes all output shards
concurrently.

Resume: the curated parquet directory commits atomically (tmp dir +
_SUCCESS + rename) and is skipped when present; the shard phase reuses
write_training_shards' per-shard manifest. A killed run never
reprocesses finished work and never observes partial output.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from ..sources.factory import read_parquet_clean

_SEQ_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int64()),
    ]
)


def curate_documents(
    docs: Dataset,
    blocklist_texts: list[str],
    span_k: int = 8,
    decont_n: int = 3,
    max_overlap: float = 0.5,
    materialize_stages: bool = False,
) -> dict[str, Dataset]:
    """The curate chain as named intermediate Datasets:
    ``c4_kept`` -> ``span_nonempty`` -> ``decontaminated`` ->
    ``deduped`` -> ``sequences`` (doc_id, tokens, n_tok).

    With ``materialize_stages=False`` (default) everything is lazy and
    fuses into one streaming pass; with True each stage materializes
    and the next chains off the materialized blocks, so per-stage
    ``count()`` is metadata-only (no re-execution of the prefix)."""
    from ..functions.corpusfns import c4_filter_batch
    from ..functions.decontaminate import decontaminate
    from ..functions.dedup import span_dedup_corpus
    from ..stages.transform import hash_column
    from ..tokenizer import encode_array

    def m(ds: Dataset) -> Dataset:
        return ds.materialize() if materialize_stages else ds

    def c4_gate(t: pa.Table) -> pa.Table:
        r = c4_filter_batch(t)
        keep = r["keep"]
        if isinstance(keep, pa.ChunkedArray):
            keep = keep.combine_chunks()
        return t.filter(keep)

    gated = m(docs.map_batches(c4_gate, batch_format="pyarrow"))
    sd = span_dedup_corpus(gated, k=span_k)

    def nonempty(t: pa.Table) -> pa.Table:
        t = pa.table({"doc_id": t["doc_id"], "text": t["text_dedup"]})
        return t.filter(pc.not_equal(t["text"], ""))

    sdn = m(sd.map_batches(nonempty, batch_format="pyarrow"))
    clean = m(
        decontaminate(
            sdn, blocklist_texts, n=decont_n, max_overlap=max_overlap
        ).map_batches(lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")
    )

    # exact dedup: keep the min doc_id per text (hash-keyed shuffle,
    # local partial collapse first — same shape as docs_exact_dedup)
    hashed = clean.map_batches(hash_column("text", "text_hash"), batch_format="pyarrow")

    def local_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["text_hash", "text", "doc_id"])
            .group_by(["text_hash", "text"])
            .aggregate([("doc_id", "min")])
        )
        return g.rename_columns(["text_hash", "text", "min_id"])

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string())]
            ).empty_table()
        return pa.table({"doc_id": t["min(min_id)"], "text": t["text"]})

    deduped = m(
        hashed.map_batches(local_partial, batch_format="pyarrow")
        .groupby(["text_hash", "text"])
        .aggregate(Min("min_id"))
        .map_batches(finalize, batch_format="pyarrow")
    )

    def tokenize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SEQ_SCHEMA.empty_table()
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tokens = encode_array(text)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "tokens": tokens,
                "n_tok": pc.list_value_length(tokens).cast(pa.int64()),
            }
        )

    seqs = deduped.map_batches(tokenize, batch_format="pyarrow")
    return {
        "c4_kept": gated,
        "span_nonempty": sdn,
        "decontaminated": clean,
        "deduped": deduped,
        "sequences": seqs,
    }


def build_corpus(
    sf_dir: str,
    out_dir: str,
    context_len: int = 1024,
    span_k: int = 8,
    decont_n: int = 3,
    max_overlap: float = 0.5,
    bench_docs: int = 5,
    resume: bool = True,
    collect_stats: bool = True,
    shuffle_seed: int | None = None,
) -> dict:
    """Run the full corpus build over ``{sf_dir}/documents.parquet``
    into ``out_dir/curated`` (sequences parquet) and ``out_dir/shards``
    (packed fixed-length contexts).

    ``collect_stats=False`` skips the per-stage counts so the curate
    phase runs as ONE fused streaming pass (stats each add a bounded
    aggregate over the already-materialized stage).

    ``shuffle_seed`` (epoch shuffle): when set, the curated corpus is
    globally ordered by the deterministic shuffle hash (see
    functions/sampling.py:shuffle_hash) before packing, so training
    shards read out in the seed's permutation — one distributed sort,
    same permutation at any CPU count. Returns
    {input, c4_kept, span_nonempty, decontaminated, deduped,
    tokens_total, contexts, fill_ratio_mean, shards, skipped_shards,
    curate_skipped}.
    """
    from .shards import write_training_shards

    doc_path = f"{sf_dir}/documents.parquet"
    curated = os.path.join(out_dir, "curated")
    os.makedirs(out_dir, exist_ok=True)
    stats: dict = {"input": pq.ParquetFile(doc_path).metadata.num_rows}

    curate_done = resume and os.path.exists(os.path.join(curated, "_SUCCESS"))
    stats["curate_skipped"] = curate_done
    if not curate_done:
        docs = read_parquet_clean(doc_path, columns=["doc_id", "text"])
        # blocklist = the benchmark stand-in: first `bench_docs`
        # ORIGINAL documents (same convention as docs_prep_corpus)
        bench = (
            pq.read_table(doc_path, columns=["text"])
            .slice(0, bench_docs)["text"]
            .to_pylist()
        )
        stages = curate_documents(
            docs,
            bench,
            span_k=span_k,
            decont_n=decont_n,
            max_overlap=max_overlap,
            materialize_stages=collect_stats,
        )
        seqs = stages["sequences"]
        if collect_stats:
            # stages are materialized — counts are metadata-only
            for name in ("c4_kept", "span_nonempty", "decontaminated", "deduped"):
                stats[name] = stages[name].count()
            seqs = seqs.materialize()
            tot = seqs.aggregate(Sum("n_tok", alias_name="tokens_total"))
            stats["tokens_total"] = int(tot["tokens_total"] or 0)
        if shuffle_seed is not None:
            from ..functions.sampling import shuffle_hash

            def add_h(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "h", pa.array(shuffle_hash(t["doc_id"], shuffle_seed))
                )

            seqs = (
                seqs.map_batches(add_h, batch_format="pyarrow")
                .sort(["h", "doc_id"])
                .drop_columns(["h"])
            )
        tmp = curated + f".tmp.{os.getpid()}"
        seqs.write_parquet(tmp)
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass
        import shutil

        if os.path.isdir(curated):
            shutil.rmtree(curated)
        os.replace(tmp, curated)
    elif collect_stats:
        t = pq.read_table(curated, columns=["n_tok"])
        stats["deduped"] = t.num_rows
        stats["tokens_total"] = int(pc.sum(t["n_tok"]).as_py() or 0)

    shard_stats = write_training_shards(
        curated, os.path.join(out_dir, "shards"), context_len=context_len,
        resume=resume,
    )
    stats.update(
        {
            "contexts": shard_stats["contexts"],
            "fill_ratio_mean": shard_stats["fill_ratio_mean"],
            "shards": shard_stats["shards"],
            "skipped_shards": shard_stats["skipped"],
        }
    )
    return stats
