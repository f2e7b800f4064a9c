"""Source readers + format dispatch.

Parity with the reference's parser factory (SURVEY.md §2.1 S4-S5,
/root/reference/src/parsers/parserFactory.js:12-96): extension
sniffing including double extensions (.ndjson.gz), default ndjson
with a warning, ndjson/csv/parquet readers. Gzip is handled natively
by Arrow (the reference gunzips in its file reader,
fileReader.js:23-39).

CSV reader parity (/root/reference/src/parsers/csvParser.js and the
reference CSV fixture format, generate-csv.js): `;` separator,
pipe-joined tags, empty string for null. ``typed=False`` reproduces
the reference csv-parser semantics exactly — every value a string —
while ``typed=True`` gives the engine's typed schema (ints cast, tags
split to list<string>, '' -> null).
"""

from __future__ import annotations

import logging
import os
from contextlib import contextmanager

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

import ray.data as rd
from ray.data import Dataset

logger = logging.getLogger(__name__)

@contextmanager
def _plain_list_columns():
    """Scope `enable_tensor_extension_casting=False` to one dataset
    creation (ragged list<string> columns like `tags` must stay plain
    Arrow lists). Ray Data seals a copy of the DataContext into the
    dataset at creation, so flipping it around the read_* call is
    enough — and restoring it afterwards keeps the session-global
    context untouched for unrelated datasets."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.enable_tensor_extension_casting
    ctx.enable_tensor_extension_casting = False
    try:
        yield
    finally:
        ctx.enable_tensor_extension_casting = prev


CSV_HEADER = [
    "timestamp", "level", "service", "method", "path", "status",
    "responseTime", "userId", "sessionId", "ip", "message",
    "payloadSize", "tags", "env", "host", "errorCode",
]

_INT_COLS = {"status", "responseTime", "payloadSize"}


def detect_format_from_filename(path: str) -> str:
    """ndjson | csv | parquet, tolerating a trailing .gz; defaults to
    ndjson with a warning (reference parserFactory.js:61-66)."""
    name = os.path.basename(path).lower()
    if name.endswith(".gz"):
        name = name[: -len(".gz")]
    ext = os.path.splitext(name)[1]
    if ext in (".ndjson", ".json", ".jsonl"):
        return "ndjson"
    if ext == ".csv":
        return "csv"
    if ext == ".parquet":
        return "parquet"
    if ext == ".orc":
        return "orc"
    if ext in (".feather", ".arrow", ".ipc"):
        return "feather"
    logger.warning("unknown extension %r; defaulting to ndjson", ext)
    return "ndjson"


def read_logs_ndjson(path: str | list[str]) -> Dataset:
    # ray's read_json default extension filter excludes .ndjson
    with _plain_list_columns():
        return rd.read_json(path, file_extensions=None)


def read_logs_ndjson_lenient(path: str | list[str]) -> Dataset:
    """NDJSON reader with the reference parser's malformed-line
    tolerance (/root/reference/src/parsers/ndjsonParser.js:99-115):
    blank lines skipped, malformed lines skipped and counted (emitted
    as a `_skipped` side-count column per batch is overkill — we log).
    Arrow's strict JSON reader would abort on the first bad line, so
    this reads text lines and batch-parses only the valid ones.
    Intended for fixture/sidecar ingestion, not the 100 TB hot path
    (the tokenized-parquet pipeline handles malformed rows vectorized
    via the grok master pattern instead)."""
    import io
    import json as _json

    import pyarrow.json as pajson

    ds = rd.read_text(path)

    def parse_lines(t: pa.Table) -> pa.Table:
        lines = t["text"].to_pylist()
        good = []
        skipped = 0
        for line in lines:
            if not line.strip():
                continue
            try:
                rec = _json.loads(line)
                if isinstance(rec, dict):
                    good.append(line)
                else:
                    skipped += 1
            except Exception:  # noqa: BLE001 — reference skips + counts
                skipped += 1
        if skipped:
            logger.warning("skipped %d malformed lines in batch", skipped)
        if not good:
            return pajson.read_json(io.BytesIO(b"{}\n")).slice(0, 0)
        buf = ("\n".join(good)).encode()
        return pajson.read_json(io.BytesIO(buf))

    return ds.map_batches(parse_lines, batch_format="pyarrow")


def read_logs_csv(
    path: str | list[str],
    typed: bool = True,
    separator: str = ";",
    quote: str = '"',
    escape: str = '"',
    header: bool = True,
    skip_lines: int = 0,
) -> Dataset:
    """Read the reference's CSV log format (default `;`-separated).

    Option parity with /root/reference/src/parsers/csvParser.js:20-27
    (separator / quote / escape / header / skipLines): `escape == quote`
    maps to Arrow's RFC-4180 double-quote mode (the csv-parser lib's
    default, and how generate-csv.js:82-92 escapes); a distinct escape
    char maps to Arrow's escape_char backslash-style mode.
    `header=False` names columns by the canonical log header, like the
    reference caller passing explicit `headers`. `skip_lines` drops
    leading lines before the (optional) header row.
    """
    double_quote = escape == quote
    parse_opts = pacsv.ParseOptions(
        delimiter=separator,
        quote_char=quote,
        double_quote=double_quote,
        escape_char=False if double_quote else escape,
    )
    read_opts = {}
    if skip_lines or not header:
        read_opts["skip_rows"] = skip_lines
        if not header:
            read_opts["column_names"] = CSV_HEADER
    if not typed:
        # reference csv-parser semantics: every value is a string
        convert = pacsv.ConvertOptions(
            column_types={c: pa.string() for c in CSV_HEADER}
        )
        return rd.read_csv(
            path,
            parse_options=parse_opts,
            convert_options=convert,
            **(
                {"read_options": pacsv.ReadOptions(**read_opts)}
                if read_opts
                else {}
            ),
        )

    convert = pacsv.ConvertOptions(
        column_types={
            **{c: pa.string() for c in CSV_HEADER if c not in _INT_COLS},
            **{c: pa.int32() for c in _INT_COLS},
        },
        strings_can_be_null=True,  # '' -> null
    )
    with _plain_list_columns():
        ds = rd.read_csv(
            path,
            parse_options=parse_opts,
            convert_options=convert,
            **(
                {"read_options": pacsv.ReadOptions(**read_opts)}
                if read_opts
                else {}
            ),
        )

    def split_tags(t: pa.Table) -> pa.Table:
        tags = t["tags"]
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        split = pc.split_pattern(tags, "|")
        idx = t.column_names.index("tags")
        return t.set_column(idx, "tags", split)

    return ds.map_batches(split_tags, batch_format="pyarrow")


def read_logs_orc(path: str | list[str]) -> Dataset:
    """ORC reader. Ray Data has no native ORC source, so files stream
    as binary blobs (one row per file via read_binary_files — each
    read task holds at most its own files) and decode to Arrow inside
    the map with pyarrow.orc. Split granularity is the FILE (ORC
    stripes are not split further); size files ~ one block at write
    time, which ``write_files(fmt='orc')`` does by construction."""

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.orc as paorc

        tbls = [
            strip_pandas_metadata(paorc.ORCFile(pa.BufferReader(b.as_py())).read())
            for b in t["bytes"]
        ]
        return pa.concat_tables(tbls) if tbls else t.select([])

    return rd.read_binary_files(path, file_extensions=None).map_batches(
        decode, batch_format="pyarrow"
    )


def read_logs_feather(path: str | list[str]) -> Dataset:
    """Feather / Arrow-IPC reader, same binary-blob + in-map decode
    shape as read_logs_orc (zero-copy IPC decode per file)."""

    def decode(t: pa.Table) -> pa.Table:
        tbls = [
            strip_pandas_metadata(
                pa.ipc.open_file(pa.BufferReader(b.as_py())).read_all()
            )
            for b in t["bytes"]
        ]
        return pa.concat_tables(tbls) if tbls else t.select([])

    return rd.read_binary_files(path, file_extensions=None).map_batches(
        decode, batch_format="pyarrow"
    )


def write_files(
    ds: Dataset, out_dir: str, fmt: str = "orc", prefix: str = "part"
) -> Dataset:
    """Distributed ORC / Feather sink: each block writes ONE file via
    atomic tmp+rename (the shards.py directory contract) and emits a
    manifest row (file, rows) — consume the returned Dataset to drive
    the writes. File names are content-addressed off the block's first
    rows, so a re-run overwrites the same names idempotently instead
    of duplicating output."""
    import hashlib

    if fmt not in ("orc", "feather"):
        raise ValueError(f"write_files: unsupported fmt {fmt!r}")
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table(
                {"file": pa.array([], pa.string()), "rows": pa.array([], pa.int64())}
            )
        head = t.slice(0, min(64, t.num_rows))
        sig = hashlib.sha256(
            b"|".join(str(c).encode() for c in head.to_pydict().values())
            + str(t.num_rows).encode()
        ).hexdigest()[:16]
        name = f"{prefix}-{sig}.{fmt}"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        if fmt == "orc":
            import pyarrow.orc as paorc

            paorc.write_table(t, tmp)
        else:
            import pyarrow.feather as fe

            fe.write_feather(t, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {"file": pa.array([name]), "rows": pa.array([t.num_rows], pa.int64())}
        )

    return ds.map_batches(write_block, batch_size=None, batch_format="pyarrow")


def read_any(path: str | list[str], fmt: str | None = None, **kw) -> Dataset:
    """Dispatch by explicit format or filename sniffing."""
    first = path if isinstance(path, str) else path[0]
    if fmt is None and os.path.isdir(first):
        # sniff the first regular file inside the directory
        names = sorted(
            n for n in os.listdir(first)
            if os.path.isfile(os.path.join(first, n)) and not n.startswith("_")
        )
        first = os.path.join(first, names[0]) if names else first
    fmt = fmt or detect_format_from_filename(first)
    if fmt == "parquet":
        return rd.read_parquet(path, **kw)
    if fmt == "csv":
        return read_logs_csv(path, **kw)
    if fmt == "ndjson":
        return read_logs_ndjson(path)
    if fmt == "orc":
        return read_logs_orc(path)
    if fmt == "feather":
        return read_logs_feather(path)
    raise ValueError(f"unsupported format: {fmt}")


def strip_pandas_metadata(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (pandas round-trip info). A schema
    carrying the b'pandas' metadata dict is unhashable, which defeats
    Ray's schema-dedup fast path and makes every sort/reduce task log
    'Failed to hash the schemas'. Zero-copy."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(path, **kw) -> Dataset:
    """ray.data.read_parquet + strip_pandas_metadata, fused into the
    read task (no extra pass)."""
    return rd.read_parquet(path, **kw).map_batches(
        strip_pandas_metadata, batch_format="pyarrow", zero_copy_batch=True
    )


def read_parquet_harmonized(
    paths: list[str] | str,
    target_schema: pa.Schema,
    strict_casts: bool = False,
) -> Dataset:
    """Read parquet shards whose schemas have DRIFTED (columns added,
    dropped or re-typed over the corpus's life — the normal state of a
    100 TB lake) and harmonize every batch to ``target_schema``:
    missing columns become typed nulls, extra columns are dropped,
    mismatched types are cast (``strict_casts=False`` uses safe=False
    casts, e.g. int64 -> int32 truncates like a relational CAST).

    The harmonization is fused into the read task — one vectorized
    pass, no extra pipeline stage, so the cost is a per-batch schema
    touch-up, not a second scan.
    """

    def harmonize(t: pa.Table) -> pa.Table:
        cols = []
        for field in target_schema:
            if field.name in t.column_names:
                col = t[field.name]
                if col.type != field.type:
                    col = pc.cast(col, field.type, safe=strict_casts)
                cols.append(col)
            else:
                cols.append(pa.nulls(t.num_rows, field.type))
        return pa.table(dict(zip(target_schema.names, cols)))

    with _plain_list_columns():
        ds = rd.read_parquet(paths)
    return ds.map_batches(harmonize, batch_format="pyarrow", zero_copy_batch=True)


def compact_shards(
    in_dir: str,
    out_dir: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Small-file compaction — the lake-maintenance pass that turns
    thousands of tiny shards (streaming ingest, per-key partitioned
    writes) into size-targeted files. One streaming repartition, no
    driver materialization; atomic tmp+rename commit so readers never
    observe a half-compacted directory. Returns {files_in, files_out,
    rows}."""
    import glob as _glob
    import shutil as _shutil

    files_in = len(_glob.glob(os.path.join(in_dir, "*.parquet")))
    ds = read_parquet_clean(in_dir)
    rows = ds.count()
    n_files = max(1, -(-rows // target_rows_per_file))  # ceil
    tmp = out_dir + ".tmp"
    _shutil.rmtree(tmp, ignore_errors=True)
    ds.repartition(n_files).write_parquet(tmp)
    _shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    files_out = len(_glob.glob(os.path.join(out_dir, "*.parquet")))
    return {"files_in": files_in, "files_out": files_out, "rows": rows}
