"""Offline metrics CLI: SSIM / PSNR / LPIPS over exported render dirs
(the src/metrics.py equivalent, reference :36-93).

Walks <model_path>/test/<method>/{renders,gt} (same directory contract),
writes results.json and per_view.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import jax.numpy as jnp
from PIL import Image

from gaussianhaircut_tpu.ops.losses import psnr
from gaussianhaircut_tpu.ops.lpips import lpips_or_none
from gaussianhaircut_tpu.ops.ssim import ssim


def _load(path):
    arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return jnp.asarray(arr.transpose(2, 0, 1))


def evaluate_dir(renders_dir: str, gt_dir: str, lpips_weights=None,
                 allow_untrained_lpips: bool = True):
    lp = lpips_or_none(lpips_weights, allow_untrained=allow_untrained_lpips)
    # An uncalibrated LPIPS must never print under the bare "LPIPS" name:
    # the metric KEY itself carries the backbone kind unless the weights are
    # the calibrated torchvision-VGG16 + linear heads the reference uses
    # (src/lpipsPyTorch/modules/networks.py:49-51).  See BASELINE.md's
    # "LPIPS calibration status" note.
    lpips_key = None
    if lp is not None:
        lpips_key = "LPIPS" if lp.kind == "pretrained" else f"LPIPS[{lp.kind}]"
        if lp.kind != "pretrained":
            print(f"  [metrics] LPIPS backbone is '{lp.kind}' (no pretrained "
                  "weights found) — values are NOT comparable to published "
                  "LPIPS numbers and are keyed as "
                  f"'{lpips_key}' in results.json; convert real weights with "
                  "tools/convert_lpips.py")
    per_view = {"SSIM": {}, "PSNR": {}}
    if lpips_key is not None:
        per_view[lpips_key] = {}
    names = sorted(os.listdir(renders_dir))
    for name in names:
        r = _load(os.path.join(renders_dir, name))
        g = _load(os.path.join(gt_dir, name))
        per_view["SSIM"][name] = float(ssim(r, g))
        per_view["PSNR"][name] = float(psnr(r, g))
        if lp is not None:
            per_view[lpips_key][name] = float(lp(r, g))
    means = {k: float(np.mean(list(v.values()))) for k, v in per_view.items() if v}
    if lp is not None:
        means["LPIPS_kind"] = lp.kind
    return means, per_view


def evaluate(model_paths, lpips_weights=None):
    full = {}
    per = {}
    for model_path in model_paths:
        full[model_path] = {}
        per[model_path] = {}
        test_dir = os.path.join(model_path, "test")
        if not os.path.isdir(test_dir):
            print(f"no test dir under {model_path}")
            continue
        for method in sorted(os.listdir(test_dir)):
            renders = os.path.join(test_dir, method, "renders")
            gt = os.path.join(test_dir, method, "gt")
            if not (os.path.isdir(renders) and os.path.isdir(gt)):
                continue
            means, views = evaluate_dir(renders, gt, lpips_weights)
            full[model_path][method] = means
            per[model_path][method] = views
            print(f"  {method}: " + "  ".join(
                f"{k} {v:.7f}" if isinstance(v, float) else f"{k} {v}"
                for k, v in means.items()))
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full[model_path], f, indent=True)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per[model_path], f, indent=True)
    return full


def main(argv=None):
    parser = argparse.ArgumentParser("metrics")
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    parser.add_argument("--lpips_weights", default=None)
    args = parser.parse_args(argv)
    evaluate(args.model_paths, args.lpips_weights)


if __name__ == "__main__":
    main()
