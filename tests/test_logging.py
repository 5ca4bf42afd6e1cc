"""MetricWriter: E### numbering + resume-by-run-id tracking
(reference utils/wandb_manager.py:96-183)."""

import json

from vdn.utils.logging import MetricWriter


def test_metric_writer_numbering_and_resume(tmp_path):
    d = str(tmp_path)
    w1 = MetricWriter(d)
    assert w1.run_name == "E001"
    w1.add_metrics({"loss": 1.0})
    w1.send_log(1)
    w1.finish()

    w2 = MetricWriter(d)
    assert w2.run_name == "E002"
    w2.finish()

    # resume by name: re-attaches to E001, no new E### entry, appends
    w3 = MetricWriter(d, run_name="E001", resume=True)
    assert w3.run_name == "E001"
    w3.add_metrics({"loss": 0.5})
    w3.send_log(2)
    w3.finish()
    lines = (tmp_path / "E001.metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2 and json.loads(lines[1])["step"] == 2
    runs = json.loads((tmp_path / "runs.json").read_text())
    assert [r["name"] for r in runs] == ["E001", "E002"]

    # resume with no name: latest tracked run
    w4 = MetricWriter(d, resume=True)
    assert w4.run_name == "E002"
    w4.finish()

    # resume of an unknown name starts fresh under that name
    w5 = MetricWriter(d, run_name="E099", resume=True)
    assert w5.run_name == "E099"
    w5.finish()


def test_metric_writer_records_wandb_id(tmp_path):
    """The tracking file keeps a per-run wandb id for later resume
    (reference wandb_manager.py:172-180); simulate the sink's write."""
    d = str(tmp_path)
    w = MetricWriter(d)
    w._record_wandb_id("abc123")
    w.finish()
    runs = json.loads((tmp_path / "runs.json").read_text())
    assert runs[0]["wandb_id"] == "abc123"

    w2 = MetricWriter(d, run_name="E001", resume=True)
    assert w2._resume_id == "abc123"
    w2.finish()
