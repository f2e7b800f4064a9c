"""Vectorized grok/regex parse stage.

Reconstructs the serialized log line from the ``tokens`` column
(zero-ish-copy detokenize) and extracts the reference log-record
fields with RE2 regexes via ``pyarrow.compute`` kernels — no Python
per-row loop anywhere.

Reference semantics reproduced (see SURVEY.md §2.1 S3,
/root/reference/src/parsers/ndjsonParser.js:99-115): malformed or
blank lines are not errors — they get ``parse_ok = false`` and all
extracted columns null, and are later routed to the dead-letter sink
with their token arrays intact. Validity here is defined by the
master grok pattern (a structural regex over the line), which on the
fixture corpus agrees exactly with JSON validity (asserted in tests).

Input columns are passed through untouched — in particular ``tokens``
(token-array-equality invariant, SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..tokenizer import detokenize

# Structural validity: all 5 corruption kinds + blank lines fail this;
# valid lines (incl. field omissions / extra fields) pass.
PARSE_MASTER_PATTERN = (
    r'^\{"timestamp":"[^"]+","level":"(?:INFO|WARN|ERROR)","service":"[a-z-]+",'
    r".*[^,]\}$"
)

# Single combined extraction regex (one RE2 scan for all fields —
# 2.4x faster than per-field passes). Optional fields use optional
# non-capturing groups; a non-participating group captures '' — safe
# to map ''->null for fields whose legit values are never empty
# (session_id / payload_size / error_code / user_id), while tags gets
# an explicit marker group ('[') to distinguish omitted (null) from
# present-but-empty ([]).
_BIG = (
    r'^\{"timestamp":"(?P<timestamp>[^"]+)","level":"(?P<level>[A-Z]+)",'
    r'"service":"(?P<service>[a-z-]+)","method":"(?P<method>[A-Z]+)",'
    r'"path":"(?P<path>[^"]+)","status":(?P<status>\d+),'
    r'"responseTime":(?P<response_time>\d+),'
    r'"userId":(?:"(?P<user_id>[^"]+)"|null),'
    r'(?:"sessionId":(?:"(?P<session_id>[^"]+)"|null),)?'
    r'"ip":"(?P<ip>[^"]+)","message":"(?P<message>[^"]+)",'
    r'(?:"payloadSize":(?P<payload_size>\d+),)?'
    r'(?:"tags":(?P<tags_mark>\[)(?P<tags_raw>[^\]]*)\],)?'
    r'"meta":\{"env":"(?P<meta_env>[^"]+)","host":"(?P<meta_host>[^"]+)"\}'
    r'(?:,"errorCode":"(?P<error_code>[^"]+)")?'
    r'(?:,"debug":true|,"traceId":"[^"]+")?\}$'
)

_INT32_FIELDS = {"status", "response_time", "payload_size"}
# optional fields where '' means "group did not participate" => null
_EMPTY_IS_NULL = {"user_id", "session_id", "payload_size", "error_code"}


def _extract_all(lines: pa.StringArray) -> dict[str, pa.Array]:
    """One extract_regex pass -> dict of named-group columns (null when
    the whole pattern does not match)."""
    struct = pc.extract_regex(lines, _BIG)
    out = {}
    for field in struct.type:
        col = pc.struct_field(struct, field.name)
        if field.name in _EMPTY_IS_NULL:
            col = pc.if_else(pc.equal(col, ""), pa.scalar(None, pa.string()), col)
        if field.name in _INT32_FIELDS:
            col = pc.cast(col, pa.int32())
        out[field.name] = col
    # tags omitted (marker '' => group absent) -> null raw
    out["tags_raw"] = pc.if_else(
        pc.equal(out.pop("tags_mark"), ""),
        pa.scalar(None, pa.string()),
        out["tags_raw"],
    )
    return out


def _tags_from_raw(raw: pa.StringArray) -> pa.ListArray:
    """'"a","b"' -> ["a","b"]; '' -> []; null -> null. Fully vectorized."""
    stripped = pc.replace_substring(raw, '"', "")
    split = pc.split_pattern(stripped, ",")  # '' -> ['']
    lengths = np.asarray(pc.list_value_length(split).fill_null(0), dtype=np.int64)
    flat = split.flatten()
    flat_np = np.asarray(flat, dtype=object) if len(flat) else np.empty(0, object)
    # rows whose raw was '' contributed one '' element; drop it
    empty_row = np.asarray(pc.equal(stripped, "").fill_null(False), dtype=bool)
    lengths[empty_row] = 0
    keep = np.ones(len(flat), dtype=bool)
    starts = np.zeros(len(raw) + 1, dtype=np.int64)
    np.cumsum(
        np.asarray(pc.list_value_length(split).fill_null(0), dtype=np.int64),
        out=starts[1:],
    )
    keep[starts[:-1][empty_row]] = False
    offsets = np.zeros(len(raw) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    values = pa.array(flat_np[keep], type=pa.string())
    mask = pa.array(np.asarray(raw.is_null()), type=pa.bool_())
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), values, mask=mask
    )


def parse_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: sequences table in, parsed table out."""
    lines = detokenize(batch["tokens"])
    # dead-letter criterion: the structural master pattern (loose);
    # the strict extraction pattern agrees with it on any line the
    # generator's grammar produces (asserted in tests) and yields
    # all-null fields for anything else.
    loose_ok = pc.match_substring_regex(lines, PARSE_MASTER_PATTERN)

    cols = _extract_all(lines)
    tags_raw = cols.pop("tags_raw")
    # strict participation: the full extraction pattern matched
    # (timestamp is mandatory in it and never empty). On generator
    # grammar the two predicates are identical (asserted in tests);
    # on foreign input this prevents half-parsed rows slipping past
    # the dead-letter sink.
    strict_ok = pc.is_valid(cols["timestamp"])
    parse_ok = pc.and_(loose_ok, strict_ok)

    # rows failing the master pattern contribute no fields at all
    for name, col in cols.items():
        cols[name] = pc.if_else(parse_ok, col, pa.scalar(None, col.type))
    tags_raw = pc.if_else(parse_ok, tags_raw, pa.scalar(None, pa.string()))
    tags = _tags_from_raw(tags_raw)
    meta = pa.StructArray.from_arrays(
        [cols["meta_env"], cols["meta_host"]],
        names=["env", "host"],
        mask=pa.array(np.asarray(cols["meta_env"].is_null()), pa.bool_()),
    )

    out = batch
    out = out.append_column("parse_ok", parse_ok)
    order = [
        "timestamp", "level", "service", "method", "path", "status",
        "response_time", "user_id", "session_id", "ip", "message",
        "payload_size", "meta_env", "meta_host", "error_code",
    ]
    for name in order:
        out = out.append_column(name, cols[name])
    out = out.append_column("tags", tags)
    out = out.append_column("meta", meta)
    return out
