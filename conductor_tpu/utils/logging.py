"""Training observability: console + JSONL metric logging (TensorBoard if present).

The reference logs stage 1 to TensorBoard (`M2SNet_train.py:106-111`) and
stage 2 only to stdout via `print_current_loss`
(`Diffusion_Stage/utils/utils.py:36-58`).  Here one `MetricLogger` serves all
trainers: every scalar goes to an append-only `metrics.jsonl` (machine
readable, crash safe) and a rate-limited console line; TensorBoard event
files are written too when a writer implementation is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping


def format_time(seconds: float) -> str:
    """hh:mm:ss (the reference's `as_minutes`/`time_since`, `utils.py:19-33`)."""
    s = int(seconds)
    return f"{s // 3600:02d}:{(s % 3600) // 60:02d}:{s % 60:02d}"


class MetricLogger:
    def __init__(self, log_dir: str, *, console_every: int = 5, name: str = "train"):
        self.log_dir = log_dir
        self.console_every = console_every
        self.name = name
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._start = time.time()
        self._tb = self._try_tensorboard(log_dir)
        self._accum: dict[str, float] = {}
        self._accum_n = 0

    @staticmethod
    def _try_tensorboard(log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            return SummaryWriter(log_dir=log_dir)
        except Exception:
            return None

    def log(self, step: int, metrics: Mapping[str, float], *, epoch: int | None = None):
        record = {"step": int(step), "t": round(time.time() - self._start, 3)}
        if epoch is not None:
            record["epoch"] = int(epoch)
        for k, v in metrics.items():
            v = float(v)
            record[k] = v
            self._accum[k] = self._accum.get(k, 0.0) + v
            if self._tb is not None:
                self._tb.add_scalar(f"{self.name}/{k}", v, step)
        self._jsonl.write(json.dumps(record) + "\n")
        self._accum_n += 1

        if step % self.console_every == 0 and self._accum_n:
            means = {k: v / self._accum_n for k, v in self._accum.items()}
            parts = " | ".join(f"{k}: {v:.5f}" for k, v in means.items())
            ep = f"epoch: {epoch} | " if epoch is not None else ""
            print(f"[{format_time(time.time() - self._start)}] {ep}step: {step} | {parts}")
            self._accum, self._accum_n = {}, 0

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
