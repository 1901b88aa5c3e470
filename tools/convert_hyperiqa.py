"""Offline converter: distill hyperIQA into the small CnnScorer convnet.

The reference's frame selection scores with hyperIQA (ResNet50 + hypernet,
cloned at install time — src/preprocessing/preprocess_raw_images.py:70-122).
That topology is impractical to re-derive weight-for-weight, so — like
tools/convert_neuralhaircut_ckpt.py — transfer is by DISTILLATION: run
hyperIQA over a frame corpus, fit preprocessing/iqa.CnnScorer's 4-conv net
to reproduce its scores, save npz.  Run on any machine with the hyperIQA
clone + a directory of video frames; this container has neither.

Usage:
  python tools/convert_hyperiqa.py --hyperiqa_dir ext/hyperIQA \
      --frames_dir $DATA/images --out weights/hyperiqa_distilled.npz
      [--steps 3000] [--batch 32]
"""
from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def init_params(key, channels=(16, 32, 64, 128)):
    import jax

    params = {}
    cin = 3
    keys = jax.random.split(key, len(channels) + 1)
    for i, cout in enumerate(channels):
        fan = 3 * 3 * cin
        params[f"conv{i}_w"] = (np.asarray(
            jax.random.normal(keys[i], (3, 3, cin, cout)))
            * np.sqrt(2.0 / fan)).astype(np.float32)
        params[f"conv{i}_b"] = np.zeros(cout, np.float32)
        cin = cout
    params["head_w"] = (np.asarray(jax.random.normal(keys[-1], (cin,)))
                        * 0.01).astype(np.float32)
    params["head_b"] = np.zeros((), np.float32)
    return params


def selftest() -> int:
    """Egress-free tool check (CI / pre-flight on the conversion machine):
    the distillation loop must fit a KNOWN sharpness teacher (Laplacian
    variance — the quality axis hyperIQA scores) on a synthetic blur corpus,
    generalize its RANKING to held-out textures, and round-trip through
    preprocessing.iqa.CnnScorer.  Mirrors tests/test_iqa_converter.py."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile

    import cv2
    import jax.numpy as jnp

    def lap_var(batch):
        g = batch.mean(-1)
        lap = (-4 * g[:, 1:-1, 1:-1] + g[:, :-2, 1:-1] + g[:, 2:, 1:-1]
               + g[:, 1:-1, :-2] + g[:, 1:-1, 2:])
        return 100.0 * lap.reshape(len(batch), -1).var(axis=1)

    rng = np.random.default_rng(11)
    bases = [rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
             for _ in range(6)]
    sigmas = [0.0, 0.7, 1.4, 2.2, 3.0]

    def blur(img, s):
        if s <= 0:
            return img
        k = 2 * int(3 * s) + 1
        return cv2.GaussianBlur(img, (k, k), s)

    imgs = np.stack([blur(b, s) for b in bases for s in sigmas])
    n_sigma = len(sigmas)
    train, held = imgs[:4 * n_sigma], imgs[4 * n_sigma:]

    params = distill(train, lap_var, steps=260, batch=8, seed=0,
                     channels=(8, 16, 32), log_every=0)
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "iqa.npz")
        save_npz(params, out)
        from gaussianhaircut_tpu.preprocessing.iqa import CnnScorer
        scorer = CnnScorer(out)
        s = np.asarray(scorer._fn(scorer.params, jnp.asarray(held)))
    teach = lap_var(held)
    # rank agreement (Spearman) on held-out textures
    r_s = np.argsort(np.argsort(s)).astype(np.float64)
    r_t = np.argsort(np.argsort(teach)).astype(np.float64)
    rho = float(np.corrcoef(r_s, r_t)[0, 1])
    ok = rho > 0.7 and all(
        s[t * n_sigma] > s[t * n_sigma + n_sigma - 1] for t in range(2))
    print(f"selftest: rho={rho:.3f} kind={scorer.kind} ->",
          "OK" if ok else "FAILED")
    return 0 if ok else 1


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    if "--selftest" in argv:
        return selftest()
    ap = argparse.ArgumentParser("convert_hyperiqa")
    ap.add_argument("--hyperiqa_dir", required=True)
    ap.add_argument("--hyperiqa_ckpt", default="pretrained/koniq_pretrained.pkl")
    ap.add_argument("--frames_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--selftest", action="store_true",
                    help="egress-free tool check (handled before parsing)")
    args = ap.parse_args(argv)

    import cv2
    import torch

    sys.path.insert(0, args.hyperiqa_dir)
    import models as hyperiqa_models  # upstream hyperIQA repo

    model_hyper = hyperiqa_models.HyperNet(
        16, 112, 224, 112, 56, 28, 14, 7).eval()
    model_hyper.load_state_dict(torch.load(
        os.path.join(args.hyperiqa_dir, args.hyperiqa_ckpt),
        map_location="cpu"))

    @torch.no_grad()
    def teacher_score(batch_rgb01):  # [N, 224, 224, 3] float
        x = torch.from_numpy(batch_rgb01.transpose(0, 3, 1, 2))
        mean = torch.tensor([0.485, 0.456, 0.406])[None, :, None, None]
        std = torch.tensor([0.229, 0.224, 0.225])[None, :, None, None]
        paras = model_hyper((x - mean) / std)
        model_target = hyperiqa_models.TargetNet(paras).eval()
        return model_target(paras["target_in_vec"]).numpy()

    paths = sorted(glob(os.path.join(args.frames_dir, "*")))
    imgs = []
    for p in paths:
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        imgs.append(cv2.resize(img, (224, 224)).astype(np.float32) / 255.0)
    imgs = np.stack(imgs)

    def augment_blur(x, rng):
        k = int(rng.integers(1, 4)) * 2 + 1
        return np.stack([cv2.GaussianBlur(v, (k, k), 0) for v in x])

    params = distill(imgs, teacher_score, steps=args.steps, batch=args.batch,
                     augment=augment_blur)
    save_npz(params, args.out)
    print(f"wrote {args.out}")


def distill(imgs, teacher_score, *, steps, batch, seed=0,
            channels=(16, 32, 64, 128), augment=None, log_every=200):
    """Fit CnnScorer's convnet to reproduce ``teacher_score`` on ``imgs``.

    ``imgs``: [N, H, W, 3] float32 in [0, 1]; ``teacher_score``: callable
    [B, H, W, 3] -> [B] (any framework — called outside jit); ``augment``:
    optional (x, np_rng) -> x applied every other step so the student learns
    the quality axis rather than the content axis.  Same schema as
    preprocessing/iqa.CnnScorer (tested in tests/test_iqa_converter.py the
    way tools/convert_neuralhaircut_ckpt.py's _distill is)."""
    import jax
    import jax.numpy as jnp
    import optax

    params = {k: jnp.asarray(v)
              for k, v in init_params(jax.random.PRNGKey(seed),
                                      channels=channels).items()}
    n_conv = len(channels)

    def forward(params, x):
        for i in range(n_conv):
            x = jax.lax.conv_general_dilated(
                x, params[f"conv{i}_w"], (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + params[f"conv{i}_b"])
        return jnp.mean(x, axis=(1, 2)) @ params["head_w"] + params["head_b"]

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.mean((forward(p, x) - y) ** 2))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for i in range(steps):
        idx = rng.integers(0, len(imgs), batch)
        x = imgs[idx]
        if augment is not None and i % 2:
            x = augment(x, rng)
        y = np.asarray(teacher_score(x), np.float32)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x),
                                       jnp.asarray(y))
        if log_every and i % log_every == 0:
            print(f"step {i}: mse={float(loss):.4f}", flush=True)
    return params


def save_npz(params, out_path):
    blob = {k: np.asarray(v) for k, v in params.items()}
    blob["kind"] = np.asarray("distilled-hyperiqa")
    np.savez(out_path, **blob)


if __name__ == "__main__":
    raise SystemExit(main())
