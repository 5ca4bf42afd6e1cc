"""Experiment metric logging.

Re-design of the reference WandbManager (reference utils/wandb_manager.py:12-255):
buffered metric/image logging behind one interface with pluggable sinks —
console, JSON-lines file, and wandb/TensorBoard when available.  Keeps the
E### run-numbering and resume-by-id concepts via a local JSON tracking file.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

__all__ = ["MetricWriter"]


class MetricWriter:
    def __init__(self, log_dir: str = "./logs", project: str = "vdn",
                 run_name: Optional[str] = None, use_wandb: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.project = project
        self._pending_metrics: Dict[str, float] = {}
        self._pending_images: Dict[str, List[str]] = {}
        self._tracking_path = os.path.join(log_dir, "runs.json")
        self.run_name = run_name or self._next_run_name()
        self._jsonl = open(os.path.join(
            log_dir, f"{self.run_name}.metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project,
                                         name=self.run_name)
            except Exception as exc:  # wandb genuinely optional
                print(f"[MetricWriter] wandb unavailable: {exc}")

    def _next_run_name(self) -> str:
        """E### numbering (reference wandb_manager.py:96-139)."""
        runs = []
        if os.path.exists(self._tracking_path):
            with open(self._tracking_path) as f:
                runs = json.load(f)
        num = 1 + max([r.get("num", 0) for r in runs], default=0)
        name = f"E{num:03d}"
        runs.append({"num": num, "name": name, "time": time.time()})
        with open(self._tracking_path, "w") as f:
            json.dump(runs, f)
        return name

    def add_metrics(self, metrics: Dict[str, float]):
        self._pending_metrics.update(
            {k: float(v) for k, v in metrics.items()})

    def add_images(self, images: Dict[str, List[str]]):
        for k, paths in images.items():
            self._pending_images.setdefault(k, []).extend(paths or [])

    def send_log(self, step: int):
        record = {"step": step, **self._pending_metrics}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        printable = {k: round(v, 5) for k, v in
                     self._pending_metrics.items()}
        print(f"[{self.run_name} step {step}] {printable}")
        if self._wandb is not None:
            payload = dict(self._pending_metrics)
            try:
                import wandb
                for key, paths in self._pending_images.items():
                    payload[key] = [wandb.Image(p) for p in paths]
            except Exception:
                pass
            self._wandb.log(payload, step=step)
        self._pending_metrics.clear()
        self._pending_images.clear()

    def finish(self):
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
