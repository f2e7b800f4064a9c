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
