"""Per-record transform operators — filters, projections, field ops.

Vectorized Ray Data equivalents of the reference transformer library
(SURVEY.md §2.2):

  T2 FilterTransformer  -> make_filter / apply_filter
     (/root/reference/src/transformers/filterTransformer.js:7-111)
     criteria = CONJUNCTION of per-field tests: exact equality, regex
     test on the stringified value, or a custom vectorized predicate;
     dot-paths reach into struct columns; includeMatches=False inverts
     (anti-filter).
  T4 createFieldSelector -> select_fields (dot-paths flatten structs)
     (/root/reference/src/transformers/mapTransformer.js:81-118)
  T5 createFieldAdder    -> add_fields
     (/root/reference/src/transformers/transformerFactory.js:86-107)
  T6 createNormalizer    -> rename_fields
     (/root/reference/src/transformers/transformerFactory.js:115-135)
  T11 hash task          -> hash_column (vectorized xxhash-style mix,
     used for salting / partitioning, not 10k-iteration sha256 —
     the reference's worker hash payload is a latent bug, SURVEY §2.3)

All operate on pyarrow batches; attach to a Dataset with
``ds.map_batches(fn, batch_format="pyarrow")``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def get_path(batch: pa.Table, path: str) -> pa.Array | pa.ChunkedArray:
    """Dot-path field access: 'meta.env' -> struct_field(meta, 'env')."""
    parts = path.split(".")
    if parts[0] not in batch.column_names:
        return pa.nulls(batch.num_rows, pa.string())
    col = batch[parts[0]]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for p in parts[1:]:
        if not pa.types.is_struct(col.type) or col.type.get_field_index(p) < 0:
            # missing nested field => null column (reference
            # filterTransformer.js:83-85 returns undefined)
            return pa.nulls(batch.num_rows, pa.string())
        col = pc.struct_field(col, p)
    return col


def _mask_for(batch: pa.Table, path: str, test) -> pa.Array:
    col = get_path(batch, path)
    if callable(test):
        mask = test(col)
    elif isinstance(test, dict) and "re" in test:
        # structured regex criteria: {'re': pattern} — the unambiguous
        # analog of the reference's RegExp-object branch
        # (filterTransformer.js:57-63)
        as_str = col if pa.types.is_string(col.type) else pc.cast(col, pa.string())
        mask = pc.match_substring_regex(as_str, test["re"])
    elif isinstance(test, str) and test.startswith("~"):
        # '~pattern' => regex test on the stringified value (reference
        # RegExp.test branch, filterTransformer.js:57-63)
        as_str = col if pa.types.is_string(col.type) else pc.cast(col, pa.string())
        mask = pc.match_substring_regex(as_str, test[1:])
    elif isinstance(test, str) and test.startswith("\\~"):
        # escape hatch: '\~literal' matches a value that literally
        # starts with '~' (which the bare-string form can't express)
        mask = pc.equal(col, test[1:])
    else:
        try:
            mask = pc.equal(col, test)
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid, pa.ArrowTypeError):
            # incomparable types (e.g. numeric test against a missing
            # path materialized as string nulls): reference semantics
            # are undefined != value => no match
            mask = pa.array(np.zeros(len(col), bool))
    return pc.fill_null(mask, False)


def make_filter(criteria: dict | Callable, include_matches: bool = True):
    """Compile a criteria dict into a vectorized batch filter.

    criteria: {path: value | '~regex' | callable(col)->bool mask};
    all entries must match (conjunction). A callable criteria gets the
    whole batch and returns a boolean mask.
    """

    def fn(batch: pa.Table) -> pa.Table:
        if callable(criteria):
            mask = pc.fill_null(criteria(batch), False)
        else:
            mask = None
            for path, test in criteria.items():
                m = _mask_for(batch, path, test)
                mask = m if mask is None else pc.and_(mask, m)
            if mask is None:
                mask = pa.array(np.ones(batch.num_rows, bool))
        if not include_matches:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return fn


def select_fields(paths: list[str]):
    """Projection keeping listed fields; dot-paths are flattened to
    underscore-joined column names ('meta.env' -> 'meta_env'); missing
    fields are silently omitted (reference semantics)."""

    def fn(batch: pa.Table) -> pa.Table:
        cols, names = [], []
        for p in paths:
            if "." not in p:
                if p in batch.column_names:
                    cols.append(batch[p])
                    names.append(p)
            else:
                root = p.split(".")[0]
                if root in batch.column_names:
                    cols.append(get_path(batch, p))
                    names.append(p.replace(".", "_"))
        return pa.table(dict(zip(names, cols)))

    return fn


def rename_fields(mapping: dict[str, str], remove_original: bool = True):
    def fn(batch: pa.Table) -> pa.Table:
        if remove_original:
            new_names = [mapping.get(n, n) for n in batch.column_names]
            return batch.rename_columns(new_names)
        out = batch
        for old, new in mapping.items():
            if old in batch.column_names:
                out = out.append_column(new, batch[old])
        return out

    return fn


def add_fields(adders: dict[str, Callable[[pa.Table], pa.Array]]):
    """Computed columns: {name: fn(batch)->Array}. Per-field errors are
    logged and skipped — the batch still passes (reference T5
    semantics, transformerFactory.js:98-103)."""

    def fn(batch: pa.Table) -> pa.Table:
        out = batch
        for name, f in adders.items():
            try:
                out = out.append_column(name, f(batch))
            except Exception as exc:  # noqa: BLE001 — reference skips bad fields
                import logging

                logging.getLogger(__name__).warning(
                    "add_fields: skipping field %s: %s", name, exc
                )
        return out

    return fn


def add_constant_fields(values: dict[str, object]):
    """Static metadata columns (the reference --enrich path,
    bin/logpipe.js:229-254: processedAt/processedBy/version/hostname)."""

    def fn(batch: pa.Table) -> pa.Table:
        out = batch
        for name, v in values.items():
            out = out.append_column(name, pa.nulls(batch.num_rows, pa.string()).fill_null(str(v)))
        return out

    return fn


def map_preserving(fn: Callable[[pa.Table], pa.Table]):
    """Reference T3 preserveOnError semantics
    (/root/reference/src/transformers/mapTransformer.js:34-48): if the
    mapper raises, pass the ORIGINAL batch through instead of failing
    the pipeline. Batch-level (the reference is record-level; our
    failure unit is the batch — on error we retry row-by-row slices so
    only genuinely poisoned rows fall back)."""

    def wrapped(batch: pa.Table) -> pa.Table:
        try:
            return fn(batch)
        except Exception:  # noqa: BLE001 — reference passes original through
            out_parts = []
            for i in range(batch.num_rows):
                row = batch.slice(i, 1)
                try:
                    out_parts.append(fn(row))
                except Exception:  # noqa: BLE001
                    out_parts.append(row)
            if not out_parts:
                return batch
            try:
                return pa.concat_tables(out_parts, promote_options="permissive")
            except Exception:  # noqa: BLE001 — incompatible schemas: originals
                return batch

    return wrapped


def sha256_iterated(field: str, iterations: int = 10_000, result_field: str | None = None):
    """Reference T11 hasher (/root/reference/src/workers/worker.js:182-202):
    CPU-intensive iterated sha256 of a field value into `${field}Hash`.
    (The reference's own CLI wiring of this op is broken — worker
    payload mismatch, SURVEY.md §2.3 — we implement the intended
    semantics.) The per-row loop is inherent to chained cryptographic
    hashing; the work is in hashlib's C core. Run it as tasks with
    small batches so it parallelizes."""
    import hashlib

    res = result_field or f"{field}_hash"

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = []
        for v in col.to_pylist():
            h = str(v).encode()
            for _ in range(iterations):
                h = hashlib.sha256(h).digest()
            out.append(h.hex())
        return batch.append_column(res, pa.array(out, pa.string()))

    return fn


_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def hash64_strings(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized 64-bit hash of a string column (fnv-1a base + splitmix
    finalizer). Deterministic across processes — used for salting,
    doc_id partitioning and exact-dedup keys."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # fnv-1a over bytes, vectorized via cumulative numpy ops is awkward;
    # use arrow's crc-free path: reinterpret utf8 buffers per row.
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int32, count=len(col) + 1,
                            offset=col.offset * 4)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    h = np.full(len(col), np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    maxlen = int(lengths.max()) if len(lengths) else 0
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            active = lengths > i
            idx = offsets[:-1][active] + i
            h[active] = (h[active] ^ data[idx].astype(np.uint64)) * prime
        h ^= h >> np.uint64(30)
        h *= _MIX1
        h ^= h >> np.uint64(27)
        h *= _MIX2
        h ^= h >> np.uint64(31)
    return h


def hash_column(field: str, result_field: str | None = None, buckets: int | None = None):
    """Append a deterministic hash (or hash-bucket) column of `field`."""
    res = result_field or f"{field}_hash"

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        h = hash64_strings(col)
        if buckets is not None:
            return batch.append_column(res, pa.array((h % np.uint64(buckets)).astype(np.int32)))
        return batch.append_column(res, pa.array(h.astype(np.int64)))

    return fn


def melt_batch(
    t: pa.Table,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
    value_type: pa.DataType | None = None,
) -> pa.Table:
    """UNPIVOT (wide -> long): one output row per (input row, value
    column) — the reshape inverse of the pivot partials. Vectorized:
    id columns repeat via a single take, the value block is a concat
    of casts (``value_type`` defaults to float64 to unify mixed
    numeric inputs, like SQL UNPIVOT's common supertype)."""
    import numpy as np
    import pyarrow.compute as pc

    vt = value_type or pa.float64()
    n = t.num_rows
    k = len(value_cols)
    idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
    out = {c: t[c].take(idx) for c in id_cols}
    names = pa.array(value_cols * n, pa.string()) if n else pa.array([], pa.string())
    # interleave: row-major (row0 col0, row0 col1, ...) to match the
    # repeat layout of the id columns
    cols = []
    for c in value_cols:
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols.append(col.cast(vt).to_numpy(zero_copy_only=False))
    stacked = (
        np.stack(cols, axis=1).reshape(-1) if n else np.empty(0, np.float64)
    )
    out[var_name] = names
    out[value_name] = pa.array(stacked, vt)
    return pa.table(out)
