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
        self._dir = model_path
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

    def images(self, step: int, **kv) -> None:
        """Image grids (train_gaussians.py:264-272): [C<=3, H, W] float in
        [0, 1] per key.  Mirrored to TensorBoard when available and always
        written as PNGs under <model_path>/images/ (so the debugging surface
        exists without TB)."""
        import numpy as np

        os.makedirs(os.path.join(self._dir, "images"), exist_ok=True)
        for k, v in kv.items():
            arr = np.asarray(v, dtype=np.float32)
            if arr.ndim == 2:
                arr = arr[None]
            if arr.shape[0] < 3:
                arr = np.concatenate(
                    [arr, np.zeros((3 - arr.shape[0],) + arr.shape[1:],
                                   arr.dtype)])
            arr = np.clip(arr[:3], 0.0, 1.0)
            if self._tb is not None:
                self._tb.add_images(k, arr[None], global_step=step)
            try:
                from PIL import Image
                img8 = (arr.transpose(1, 2, 0) * 255).astype(np.uint8)
                safe = k.replace("/", "_")
                Image.fromarray(img8).save(
                    os.path.join(self._dir, "images", f"{safe}_{step:06d}.png"))
            except Exception:
                pass

    def histogram(self, step: int, name: str, values) -> None:
        """Distribution logging (train_gaussians.py:290-291): full histogram
        to TensorBoard when available, percentile summary to the JSONL."""
        import numpy as np

        arr = np.asarray(values, dtype=np.float32).reshape(-1)
        if self._tb is not None:
            self._tb.add_histogram(name, arr, step)
        qs = np.percentile(arr, [0, 5, 25, 50, 75, 95, 100]) if arr.size else []
        rec = {"step": step, "t": time.time(), "histogram": name,
               "count": int(arr.size),
               "quantiles": [float(q) for q in qs]}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
