"""Deterministic synthetic `sequences` fixture (FIXTURES.md §1-§2).

Generates the engine's primary input table — Parquet shards of
pre-tokenized log lines with columns exactly per BASELINE.json
input_hint:

    doc_id: string      "doc-%012d", globally unique
    tokens: list<int32> byte-level encoding (byte+3) of one serialized
                        NDJSON log line (compact JSON, ascii only)
    n_tok:  int32       len(tokens)
    source: string      skewed: auth 70% / payments 15% / orders 10% /
                        api-gateway 5%

The encoded log-record schema and distributions mirror the reference's
fixture generator (/root/reference/scripts/generate-ndjson.js:10-20,
211-227 and generate-ndjson-errors.js:146-153): level 70/20/10,
status coherent with level (~75/15/10 overall), exponential
responseTime mean 250 clamped [0,2000], pooled user/session ids with
null fractions, 0-3 tags, meta {env, host}, errorCode only on ERROR,
~5%% field omissions, ~2%% extra fields, 2%% malformed lines of 5
corruption kinds + 2%% blank lines.

Everything is seeded (seed 42 + scale) and self-contained — no wall
clock, no external data. Regeneration is idempotent and atomic
(write to tmp dir, rename).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..tokenizer import encode_lines

FIXTURE_ROOT = os.environ.get("LOGPIPE_FIXTURE_ROOT", "/tmp/logpipe_ray_fixtures")

SEQUENCES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

SOURCES = ["auth", "payments", "orders", "api-gateway"]
SOURCE_P = [0.70, 0.15, 0.10, 0.05]
LEVELS = ["INFO", "WARN", "ERROR"]
LEVEL_P = [0.70, 0.20, 0.10]
METHODS = ["GET", "POST", "PUT", "DELETE"]
PATHS = ["/api/login", "/api/orders", "/api/payments", "/health"]
STATUS_2XX = [200, 201, 204]
STATUS_4XX = [400, 401, 403, 404]
STATUS_5XX = [500, 502, 503]
ENVS = ["dev", "staging", "prod"]
ENV_P = [0.25, 0.25, 0.50]
TAG_POOL = ["auth", "cache", "db", "payment", "retry", "network"]
ERROR_CODES = ["E_AUTH", "E_TIMEOUT", "E_DB", "E_DOWNSTREAM"]
PHRASES = {
    "INFO": ["request completed", "ok", "served from cache", "user authenticated"],
    "WARN": ["slow upstream", "retrying request", "deprecated endpoint", "high latency"],
    "ERROR": ["upstream timeout", "database unavailable", "auth rejected", "downstream failure"],
}
EPOCH_MS = 1_705_276_800_000  # 2024-01-15T00:00:00Z — fixed anchor, no wall clock
WINDOW_MS = 4 * 3600 * 1000

MALFORMED_FRAC = 0.02
BLANK_FRAC = 0.02
OMIT_FRAC = 0.05
EXTRA_FRAC = 0.02

_ISO_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z$")


def _iso(ms: int) -> str:
    # deterministic ISO-8601 with millis, like Date.toISOString()
    import datetime

    dt = datetime.datetime.fromtimestamp(ms / 1000.0, tz=datetime.timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ms % 1000:03d}Z"


def _pools(sf_key: int):
    """User/session id pools (realistic group cardinality), seeded."""
    rng = np.random.default_rng(np.random.SeedSequence([42, sf_key, 7]))
    users = [str(uuid.UUID(bytes=rng.bytes(16), version=4)) for _ in range(200)]
    sessions = [bytes(rng.bytes(8)).hex() for _ in range(300)]
    return users, sessions


def generate_shard(shard: int, n_rows: int, start_idx: int, sf_key: int) -> pa.Table:
    """Generate one shard deterministically (pure function of args)."""
    rng = np.random.default_rng(np.random.SeedSequence([42, sf_key, shard]))
    users, sessions = _pools(sf_key)

    src_idx = rng.choice(len(SOURCES), n_rows, p=SOURCE_P)
    lvl_idx = rng.choice(len(LEVELS), n_rows, p=LEVEL_P)
    mth_idx = rng.choice(len(METHODS), n_rows)
    ts_ms = EPOCH_MS + rng.integers(0, WINDOW_MS, n_rows)
    rt = np.clip(rng.exponential(250.0, n_rows), 0, 2000).astype(np.int64)
    payload = rng.integers(0, 200_001, n_rows)
    uid_idx = rng.integers(0, len(users), n_rows)
    uid_null = rng.random(n_rows) < 0.15
    sid_idx = rng.integers(0, len(sessions), n_rows)
    sid_null = rng.random(n_rows) < 0.10
    ip_oct = rng.integers(1, 256, (n_rows, 4))
    env_idx = rng.choice(len(ENVS), n_rows, p=ENV_P)
    host_n = rng.integers(1, 51, n_rows)
    # status coherent with level (generate-ndjson.js-style coherence)
    u = rng.random(n_rows)
    status_cls = np.empty(n_rows, dtype=np.int8)  # 0=2xx 1=4xx 2=5xx
    err = lvl_idx == 2
    warn = lvl_idx == 1
    info = lvl_idx == 0
    status_cls[err] = np.select([u[err] < 0.80, u[err] < 0.90], [2, 1], 0)
    status_cls[warn] = np.select([u[warn] < 0.60, u[warn] < 0.85], [0, 1], 2)
    status_cls[info] = np.select([u[info] < 0.90, u[info] < 0.97], [0, 1], 2)
    status_pick = rng.integers(0, 4, n_rows)  # modded per class pool below
    path_idx = rng.integers(0, len(PATHS) + 1, n_rows)  # == len -> /api/users/<k>
    user_path_k = rng.integers(1, 5001, n_rows)
    qsuffix = rng.random(n_rows) < 0.25
    qpage = rng.integers(1, 10, n_rows)
    n_tags = rng.integers(0, 4, n_rows)
    phrase_idx = rng.integers(0, 4, n_rows)
    ecode_idx = rng.integers(0, len(ERROR_CODES), n_rows)
    omit_u = rng.random(n_rows)
    omit_which = rng.integers(0, 3, n_rows)
    extra_u = rng.random(n_rows)
    extra_which = rng.integers(0, 2, n_rows)
    trace_ids = rng.integers(0, 1 << 62, n_rows)
    corrupt_u = rng.random(n_rows)
    corrupt_kind = rng.integers(0, 5, n_rows)
    # per-row distinct tag subsets
    tag_perm = np.argsort(rng.random((n_rows, len(TAG_POOL))), axis=1)

    lines: list[bytes] = []
    for i in range(n_rows):
        cu = corrupt_u[i]
        if MALFORMED_FRAC <= cu < MALFORMED_FRAC + BLANK_FRAC:
            lines.append(b"")
            continue
        lvl = LEVELS[lvl_idx[i]]
        mth = METHODS[mth_idx[i]]
        if path_idx[i] == len(PATHS):
            path = f"/api/users/{user_path_k[i]}"
        else:
            path = PATHS[path_idx[i]]
        if mth == "GET" and qsuffix[i]:
            path = f"{path}?page={qpage[i]}"
        cls = status_cls[i]
        pool = (STATUS_2XX, STATUS_4XX, STATUS_5XX)[cls]
        status = pool[status_pick[i] % len(pool)]
        env = ENVS[env_idx[i]]
        rec = {
            "timestamp": _iso(int(ts_ms[i])),
            "level": lvl,
            "service": SOURCES[src_idx[i]],
            "method": mth,
            "path": path,
            "status": int(status),
            "responseTime": int(rt[i]),
            "userId": None if uid_null[i] else users[uid_idx[i]],
            "sessionId": None if sid_null[i] else sessions[sid_idx[i]],
            "ip": f"{ip_oct[i, 0]}.{ip_oct[i, 1]}.{ip_oct[i, 2]}.{ip_oct[i, 3]}",
            "message": f"{mth} {path} -> {status}: {PHRASES[lvl][phrase_idx[i]]}",
            "payloadSize": int(payload[i]),
            "tags": sorted(TAG_POOL[j] for j in tag_perm[i, : n_tags[i]]),
            "meta": {"env": env, "host": f"{env}-host-{host_n[i]}"},
        }
        if lvl == "ERROR":
            rec["errorCode"] = ERROR_CODES[ecode_idx[i]]
        if omit_u[i] < OMIT_FRAC:
            for k in (("sessionId", "tags"), ("tags", "payloadSize"), ("payloadSize",))[
                omit_which[i]
            ]:
                rec.pop(k, None)
        if extra_u[i] < EXTRA_FRAC:
            if extra_which[i] == 0:
                rec["debug"] = True
            else:
                rec["traceId"] = f"{trace_ids[i]:016x}"[:16]
        line = json.dumps(rec, separators=(",", ":"))
        if cu < MALFORMED_FRAC:
            k = corrupt_kind[i]
            if k == 0:  # truncated JSON
                line = line[: max(1, len(line) - 15)]
            elif k == 1:  # unquoted key
                line = line.replace('"timestamp"', "timestamp", 1)
            elif k == 2:  # trailing comma before closing brace
                line = line[:-1] + ",}"
            elif k == 3:  # plain text, not JSON
                line = f"plain text log message {start_idx + i} not json"
            else:  # missing comma between fields
                line = line.replace(',"level"', '"level"', 1)
        lines.append(line.encode("ascii"))

    tokens = encode_lines(lines)
    doc_id = pa.array([f"doc-{start_idx + i:012d}" for i in range(n_rows)], pa.string())
    n_tok = pa.compute.list_value_length(tokens).cast(pa.int32())
    source = pa.array([SOURCES[j] for j in src_idx], pa.string())
    return pa.Table.from_arrays([doc_id, tokens, n_tok, source], schema=SEQUENCES_SCHEMA)


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.01


def rows_for_sf(sf: float) -> int:
    return max(1000, int(round(6_000_000 * sf)))


FIXTURE_VERSION = 2  # v2: finer shards (~9.4k rows) — better balance at 32 cpus


def shards_for_sf(sf: float) -> int:
    n = rows_for_sf(sf)
    return int(max(4, min(64, n // 9_375 or 4)))


def sequences_dir_for(sf_dir: str) -> str:
    sf = _sf_from_dir(sf_dir)
    return os.path.join(FIXTURE_ROOT, f"sf{sf:g}", f"sequences_v{FIXTURE_VERSION}")


def _write_shard(job: tuple) -> None:
    s, rows, start, sf_key, path = job
    tbl = generate_shard(s, rows, start, sf_key)
    pq.write_table(tbl, path, row_group_size=max(2048, rows // 4))


def ensure_sequences(
    sf_dir: str,
    n_rows: int | None = None,
    n_shards: int | None = None,
    label: str | None = None,
) -> str:
    """Idempotently materialize the sequences table for a scale factor.

    Returns the directory containing shard_####.parquet files. Atomic:
    generates into a tmp dir and renames, so concurrent/interrupted
    callers never observe a partial fixture.
    """
    sf = _sf_from_dir(sf_dir)
    if label is not None:
        out_dir = os.path.join(FIXTURE_ROOT, label, "sequences")
        import zlib

        sf_key = zlib.crc32(label.encode())  # stable across processes
    else:
        out_dir = sequences_dir_for(sf_dir)
        sf_key = int(round(sf * 100_000))
    if os.path.isdir(out_dir) and os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    n = n_rows if n_rows is not None else rows_for_sf(sf)
    k = n_shards if n_shards is not None else shards_for_sf(sf)
    tmp = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    per = (n + k - 1) // k
    jobs = []
    start = 0
    for s in range(k):
        rows = min(per, n - start)
        if rows <= 0:
            break
        jobs.append((s, rows, start, sf_key, os.path.join(tmp, f"shard_{s:04d}.parquet")))
        start += rows
    if n >= 100_000 and len(jobs) > 1:
        import concurrent.futures as cf

        with cf.ProcessPoolExecutor(max_workers=min(len(jobs), 16)) as ex:
            list(ex.map(_write_shard, jobs))
    else:
        for job in jobs:
            _write_shard(job)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # concurrent generator won the race; ours is redundant
        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir
