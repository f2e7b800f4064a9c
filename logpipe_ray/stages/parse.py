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

# Field extraction, grouped into runs of always-adjacent fields (the
# omittable fields sessionId/tags/payloadSize get their own regexes).
_CORE = (
    r'"timestamp":"(?P<timestamp>[^"]+)","level":"(?P<level>[A-Z]+)",'
    r'"service":"(?P<service>[^"]+)","method":"(?P<method>[A-Z]+)",'
    r'"path":"(?P<path>[^"]+)","status":(?P<status>\d+),'
    r'"responseTime":(?P<response_time>\d+)'
)
_USER = r'"userId":"(?P<user_id>[^"]+)"'
_SESSION = r'"sessionId":"(?P<session_id>[^"]+)"'
_IP_MSG = r'"ip":"(?P<ip>[^"]+)","message":"(?P<message>[^"]+)"'
_PAYLOAD = r'"payloadSize":(?P<payload_size>\d+)'
_TAGS = r'"tags":\[(?P<tags_raw>[^\]]*)\]'
_META = r'"meta":\{"env":"(?P<meta_env>[^"]+)","host":"(?P<meta_host>[^"]+)"\}'
_ERRCODE = r'"errorCode":"(?P<error_code>[^"]+)"'

_INT32_FIELDS = {"status", "response_time", "payload_size"}


def _extract(lines: pa.StringArray, pattern: str) -> dict[str, pa.Array]:
    """extract_regex -> dict of named-group columns (null when no match)."""
    struct = pc.extract_regex(lines, pattern)
    out = {}
    for field in struct.type:
        col = pc.struct_field(struct, field.name)
        if field.name in _INT32_FIELDS:
            col = pc.cast(col, pa.int32())
        out[field.name] = col
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
    parse_ok = pc.match_substring_regex(lines, PARSE_MASTER_PATTERN)

    cols: dict[str, pa.Array] = {}
    for pattern in (_CORE, _USER, _SESSION, _IP_MSG, _PAYLOAD, _META, _ERRCODE):
        cols.update(_extract(lines, pattern))
    tags_raw = _extract(lines, _TAGS)["tags_raw"]

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
