"""Structured scalar logging (reference: tensorboardX.SummaryWriter in
main.py; SURVEY.md §5.5).

Every scalar goes to a JSONL file (machine-readable without any viewer)
and, when tensorboardX is importable, to a TensorBoard event file too —
so ``tensorboard --logdir`` works exactly like it does for the reference.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class ScalarWriter:
    """Append-only scalar sink: JSONL always, TensorBoard when available."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, **scalars: float) -> None:
        now = time.time()
        for tag, value in scalars.items():
            if value is None:
                continue
            v = float(value)
            self._jsonl.write(json.dumps(
                {"step": int(step), "tag": tag, "value": v,
                 "wall_time": now}) + "\n")
            if self._tb is not None:
                self._tb.add_scalar(tag, v, int(step))
        self._jsonl.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def read_scalars(log_dir: str, tag: Optional[str] = None):
    """Read back the JSONL scalars (for tests / quick analysis)."""
    path = os.path.join(log_dir, "scalars.jsonl")
    out = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if tag is None or rec["tag"] == tag:
                out.append(rec)
    return out
