import json
import os
import time

from logpipe_ray.config import get_config
from logpipe_ray.utils.profiler import Profiler


def test_config_defaults_and_env_override(monkeypatch):
    cfg = get_config()
    assert cfg["processing"]["batch_size"] == 8192
    assert cfg["http"]["retries"] == 3
    monkeypatch.setenv("LOGPIPE_BATCH_SIZE", "512")
    monkeypatch.setenv("HTTP_RETRIES", "7")
    cfg2 = get_config()
    assert cfg2["processing"]["batch_size"] == 512
    assert cfg2["http"]["retries"] == 7


def test_profiler_marks_and_report(tmp_path):
    prof = Profiler()
    with prof.mark("work"):
        time.sleep(0.05)
    with prof.mark("work"):
        time.sleep(0.05)
    prof.add_stats("ds1", "Operator 1 ...")
    path = str(tmp_path / "rep.json")
    rep = prof.write_report(path)
    assert rep["marks"]["work"]["calls"] == 2
    assert rep["marks"]["work"]["wall_s"] >= 0.1
    assert rep["max_rss_mb"] > 0
    assert os.path.exists(path)
    on_disk = json.load(open(path))
    assert on_disk["datasets"]["ds1"].startswith("Operator")


def test_cli_flagship_profile(ray_session, tiny_sequences, tmp_path, capsys):
    from logpipe_ray.cli import main

    report = str(tmp_path / "prof.json")
    rc = main(
        [
            "flagship",
            tiny_sequences,
            str(tmp_path / "out"),
            "--checkpoint-groups",
            "1",
            "--profile",
            report,
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["profile"]["wall_s"] > 0
    assert json.load(open(report))["marks"]["flagship"]["calls"] == 1


def test_progress_tracker_formatting_and_cadence():
    from logpipe_ray.utils.progress import ProgressTracker

    now = [100.0]
    lines = []
    tr = ProgressTracker(
        total=1000, interval=5.0, emit=lines.append, clock=lambda: now[0]
    )
    tr.add(100)          # t=100: below cadence, no report
    assert lines == []
    now[0] = 104.0
    tr.add(100)          # 4s elapsed: still below 5s cadence
    assert lines == []
    now[0] = 105.0
    tr.add(50)           # 5s elapsed: report fires
    assert len(lines) == 1
    # 250 rows in 5s = 50 rows/s; 750 left -> ETA 15s
    assert lines[0] == "processed 250 rows (25.0%) | 50 rows/s | ETA 15.0s"
    now[0] = 109.0
    tr.add(750)          # within cadence window: buffered, no report
    assert len(lines) == 1
    now[0] = 110.0
    tr.finish()
    assert lines[-1] == "done: 1,000 rows in 10.0s (100 rows/s)"


def test_progress_tracker_no_total():
    from logpipe_ray.utils.progress import ProgressTracker

    now = [0.0]
    lines = []
    tr = ProgressTracker(interval=1.0, emit=lines.append, clock=lambda: now[0])
    now[0] = 2.0
    tr.add(12345)
    assert lines == ["processed 12,345 rows | 6,172 rows/s"]


def test_flagship_progress_reports(ray_session, tmp_path):
    from logpipe_ray.fixtures.generator import ensure_sequences
    from logpipe_ray.pipelines.flagship import run_flagship

    seq = ensure_sequences("/root/testdata/sf0.001")
    import logging

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    plog = logging.getLogger("logpipe_ray.utils.progress")
    h = Capture()
    plog.addHandler(h)
    plog.setLevel(logging.INFO)
    try:
        out = run_flagship(
            seq, str(tmp_path / "o"), write_sinks=False,
            progress=True, progress_interval=0.0,  # report every add
        )
    finally:
        plog.removeHandler(h)
    assert out["rows_in"] > 0
    assert any(m.startswith("done:") for m in records)
    assert any("rows/s" in m and "processed" in m for m in records)
