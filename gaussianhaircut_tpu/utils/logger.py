"""Training observability: JSONL metrics log + optional TensorBoard.

The reference logs scalars/images to TensorBoard (train_gaussians.py:232-293).
Here the always-on sink is a JSONL file (machine-readable, no deps); if
torch.utils.tensorboard imports, scalars are mirrored there too.
"""
from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, model_path: str, filename: str = "metrics.jsonl"):
        os.makedirs(model_path, exist_ok=True)
        self._f = open(os.path.join(model_path, filename), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(model_path)
        except Exception:
            pass

    def scalars(self, step: int, **kv) -> None:
        rec = {"step": step, "t": time.time()}
        rec.update({k: float(v) for k, v in kv.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in kv.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
