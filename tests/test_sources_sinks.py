import glob
import gzip
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pyarrow.parquet as pq
import pytest

import ray.data as rd

from logpipe_ray.fixtures.generator import generate_shard
from logpipe_ray.sinks.factory import create_sink
from logpipe_ray.sinks.http_sink import HttpSink, http_send
from logpipe_ray.sources.factory import (
    CSV_HEADER,
    detect_format_from_filename,
    read_any,
    read_logs_csv,
)
from logpipe_ray.tokenizer import detokenize


@pytest.fixture(scope="module")
def log_records():
    t = generate_shard(0, 300, 0, 55)
    lines = detokenize(t["tokens"]).to_pylist()
    recs = []
    for line in lines:
        try:
            r = json.loads(line)
            if isinstance(r, dict):
                recs.append(r)
        except Exception:
            pass
    return recs


@pytest.fixture(scope="module")
def ndjson_files(log_records, tmp_path_factory):
    d = tmp_path_factory.mktemp("ndjson")
    plain = d / "logs.ndjson"
    text = "\n".join(json.dumps(r) for r in log_records) + "\n"
    plain.write_text(text)
    gz = d / "logs.ndjson.gz"
    gz.write_bytes(gzip.compress(text.encode()))
    return str(plain), str(gz)


@pytest.fixture(scope="module")
def csv_file(log_records, tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    path = d / "logs.csv"

    def cell(r, c):
        if c == "tags":
            return "|".join(r.get("tags") or [])
        if c in ("env", "host"):
            return r.get("meta", {}).get(c, "")
        v = r.get(c)
        return "" if v is None else str(v)

    with open(path, "w") as f:
        f.write(";".join(CSV_HEADER) + "\n")
        for r in log_records:
            f.write(";".join(cell(r, c) for c in CSV_HEADER) + "\n")
    return str(path)


def test_detect_format():
    assert detect_format_from_filename("a/logs.ndjson") == "ndjson"
    assert detect_format_from_filename("logs.ndjson.gz") == "ndjson"
    assert detect_format_from_filename("x.CSV") == "csv"
    assert detect_format_from_filename("x.csv.gz") == "csv"
    assert detect_format_from_filename("x.parquet") == "parquet"
    assert detect_format_from_filename("mystery.log") == "ndjson"  # default


def test_read_ndjson_plain_and_gz(ray_session, ndjson_files, log_records):
    plain, gz = ndjson_files
    for path in (plain, gz):
        df = read_any(path).to_pandas()
        assert len(df) == len(log_records)
        assert sorted(df["level"]) == sorted(r["level"] for r in log_records)
        assert sorted(df["message"]) == sorted(r["message"] for r in log_records)


def test_read_csv_typed(ray_session, csv_file, log_records):
    df = read_logs_csv(csv_file).to_pandas()
    assert len(df) == len(log_records)
    # block order is not guaranteed across read tasks — key rows by
    # (timestamp, ip, message) which is unique in this fixture
    def key(ts, ip, msg):
        return (ts, ip, msg)

    by_key = {
        key(r["timestamp"], r["ip"], r["message"]): r for r in log_records
    }
    assert len(by_key) == len(log_records)
    for _, row in df.iterrows():
        import pandas as pd

        r = by_key[key(row["timestamp"], row["ip"], row["message"])]
        assert row["status"] == r["status"]
        assert pd.isna(row["userId"]) == (r.get("userId") is None)
        want = r.get("tags") or []
        if not want:
            # empty string means null in the reference CSV convention
            assert row["tags"] is None
        else:
            assert list(row["tags"]) == want


def test_read_csv_untyped_reference_semantics(ray_session, csv_file):
    df = read_logs_csv(csv_file, typed=False).to_pandas()
    assert df["status"].dtype == object  # all values strings (csv-parser)


class _Recorder(BaseHTTPRequestHandler):
    fail_first = 0
    bodies: list = []

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        if _Recorder.fail_first > 0:
            _Recorder.fail_first -= 1
            self.send_response(500)
            self.end_headers()
            return
        _Recorder.bodies.append(json.loads(body))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_server():
    _Recorder.bodies = []
    _Recorder.fail_first = 0
    srv = HTTPServer(("127.0.0.1", 0), _Recorder)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_port}/ingest"
    srv.shutdown()


def test_http_sink_batches(ray_session, http_server):
    ds = rd.range(250).map_batches(
        lambda t: t.rename_columns(["v"]), batch_format="pyarrow"
    )
    stats = http_send(ds, http_server, concurrency=1, batch_size=100)
    assert stats["records_sent"] == 250
    got = sorted(r["v"] for body in _Recorder.bodies for r in body)
    assert got == list(range(250))
    assert all(len(b) <= 100 for b in _Recorder.bodies)


def test_http_sink_retry_backoff(http_server):
    import pyarrow as pa

    _Recorder.fail_first = 2
    sink = HttpSink(http_server, retries=3, retry_delay=0.01)
    out = sink(pa.table({"v": [1, 2, 3]}))
    assert out["retries"][0].as_py() == 2  # two 500s then success
    assert out["records_sent"][0].as_py() == 3


def test_http_sink_exhausts_retries(http_server):
    import pyarrow as pa

    _Recorder.fail_first = 10
    sink = HttpSink(http_server, retries=3, retry_delay=0.01)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        sink(pa.table({"v": [1]}))


def test_flagship_heterogeneous_http_sink(
    ray_session, tiny_sequences, http_server, tmp_path
):
    """errors -> HTTP endpoint, everything else -> parquet; routed-row
    and token-array equality hold across the HTTP boundary."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from logpipe_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "hetero")
    summary = run_flagship(
        tiny_sequences, out, checkpoint_groups=1,
        http_sinks={"errors": http_server},
    )
    sent = [r for body in _Recorder.bodies for r in body]
    n_errors = sum(
        v for k, v in summary["sink_counts"].items() if k.endswith("/errors")
    )
    assert n_errors > 0 and len(sent) == n_errors
    # no parquet files for the http sink
    assert not _glob.glob(out + "/data/**/sink=errors/*.parquet", recursive=True)
    # token-array equality through the HTTP boundary
    orig = {}
    for f in sorted(_glob.glob(tiny_sequences + "/*.parquet")):
        t = _pq.read_table(f, columns=["doc_id", "tokens"])
        orig.update(zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()))
    for rec in sent[:50]:
        assert rec["tokens"] == orig[rec["doc_id"]]
        assert rec["level"] == "ERROR"


def test_sink_factory(ray_session, tmp_path, capsys):
    ds = rd.range(10).map_batches(
        lambda t: t.rename_columns(["v"]), batch_format="pyarrow"
    )
    out = create_sink("null")(ds)
    assert out["records"] == 10
    pdir = str(tmp_path / "p")
    create_sink("parquet", path=pdir)(ds)
    assert sum(pq.read_metadata(f).num_rows for f in glob.glob(pdir + "/*.parquet")) == 10
    create_sink("console", limit=3)(ds)
    assert len(capsys.readouterr().out.strip().splitlines()) == 3
    with pytest.raises(ValueError, match="unknown sink"):
        create_sink("kafka")


def test_sink_append_mode(ray_session, tmp_path):
    """senderFactory.js:29-41 append parity: two appended runs read
    back as the union; a non-append write replaces everything."""
    import pyarrow as pa

    def mk(lo, hi):
        return rd.from_arrow(pa.table({"v": list(range(lo, hi))}))

    jdir = str(tmp_path / "j")
    out1 = create_sink("json", path=jdir, append=True)(mk(0, 5))
    out2 = create_sink("json", path=jdir, append=True)(mk(5, 8))
    assert (out1["run"], out2["run"]) == (0, 1)
    got = sorted(rd.read_json(jdir).to_pandas()["v"].tolist())
    assert got == list(range(8))
    # non-append write REPLACES prior runs ('w' mode)
    create_sink("json", path=jdir)(mk(100, 103))
    got = sorted(rd.read_json(jdir).to_pandas()["v"].tolist())
    assert got == [100, 101, 102]
    # parquet append: base (non-append) write + one appended run union
    pdir = str(tmp_path / "pq")
    create_sink("parquet", path=pdir)(mk(0, 4))
    out3 = create_sink("parquet", path=pdir, append=True)(mk(4, 6))
    assert out3["run"] == 0
    got = sorted(rd.read_parquet(pdir).to_pandas()["v"].tolist())
    assert got == list(range(6))


def test_read_csv_option_parity(ray_session, tmp_path):
    """csvParser.js option surface (separator/quote/escape/header/
    skipLines) with generate-csv.js quoting rules: cells containing the
    separator or quotes are wrapped in double quotes, inner quotes
    doubled (generate-csv.js:82-92)."""
    p = tmp_path / "opt.csv"
    row = (
        '2025-01-01T00:00:00.000Z,INFO,svc,GET,/a,200,5,u1,s1,1.2.3.4,'
        '"hello, ""world""",10,auth|retry,prod,h1,'
    )
    p.write_text("junk to skip\n" + row + "\n")
    df = read_logs_csv(
        str(p), typed=False, separator=",", header=False, skip_lines=1
    ).to_pandas()
    assert len(df) == 1
    assert df.loc[0, "message"] == 'hello, "world"'
    assert df.loc[0, "level"] == "INFO"
    # typed mode through the same option path: ints cast, tags split
    dft = read_logs_csv(
        str(p), typed=True, separator=",", header=False, skip_lines=1
    ).to_pandas()
    assert dft.loc[0, "status"] == 200
    assert list(dft.loc[0, "tags"]) == ["auth", "retry"]


def test_read_csv_distinct_escape_char(ray_session, tmp_path):
    p = tmp_path / "esc.csv"
    p.write_text(
        "a;b\n" + '"x\\"y";2\n'  # backslash-escaped quote inside quotes
    )
    ds = read_logs_csv(str(p), typed=False, escape="\\")
    assert ds.to_pandas().loc[0, "a"] == 'x"y'


def test_reader_context_not_globally_mutated(ray_session, ndjson_files):
    from ray.data import DataContext

    from logpipe_ray.sources.factory import read_logs_ndjson

    ctx = DataContext.get_current()
    before = ctx.enable_tensor_extension_casting
    ds = read_logs_ndjson(ndjson_files[0])
    assert ctx.enable_tensor_extension_casting == before
    # the dataset still reads ragged tags as plain lists
    t = ds.to_pandas()
    assert "tags" in t.columns


def test_http_sink_effectively_once_on_resume(
    ray_session, tiny_sequences, http_server, tmp_path
):
    """A crashed run re-executes its in-flight group; the per-shard
    send markers must prevent re-POSTing already-sent shards, so the
    receiver sees every errors-row exactly once."""
    from logpipe_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "once")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_flagship(
            tiny_sequences, out, checkpoint_groups=4,
            http_sinks={"errors": http_server}, fail_after_groups=2,
        )
    summary = run_flagship(
        tiny_sequences, out, checkpoint_groups=4,
        http_sinks={"errors": http_server},
    )
    sent = [r["doc_id"] for body in _Recorder.bodies for r in body]
    n_errors = sum(
        v for k, v in summary["sink_counts"].items() if k.endswith("/errors")
    )
    assert len(sent) == n_errors  # no duplicates from the re-run
    assert len(set(sent)) == len(sent)
