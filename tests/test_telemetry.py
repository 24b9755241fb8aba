"""Tests for the JSONL/plots observability layer (wandb-role substitute)."""
import json
import os

from hpslam_tpu.utils.telemetry import Telemetry, summarize_run


def test_telemetry_degrades_without_wandb(tmp_path):
    t = Telemetry({"wandb": True}, str(tmp_path))  # wandb not installed
    t.log({"event": "track", "idx": 1, "loss": 2.0})  # must not raise
    t.finish()


def test_summarize_run_renders_plots(tmp_path):
    out = str(tmp_path)
    with open(os.path.join(out, "metrics.jsonl"), "w") as f:
        for i in range(10):
            f.write(json.dumps({"event": "track", "idx": i,
                                "loss": 100.0 - i, "pos_err": 0.01 * i}) + "\n")
            if i % 5 == 0:
                f.write(json.dumps({"event": "map", "idx": i,
                                    "geo_loss": 50.0 - i, "color_loss": 70.0,
                                    "pts": {"fine": 100 * i, "mid": 60 * i}})
                        + "\n")
    p = summarize_run(out)
    assert p is not None and os.path.exists(p)
    assert os.path.getsize(p) > 10_000  # a real rendered figure


def test_summarize_run_empty(tmp_path):
    assert summarize_run(str(tmp_path)) is None
