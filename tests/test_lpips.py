"""LPIPS loads a weights npz (shape-synthesized here; real weights come from
ops/lpips.convert_torch_weights on a machine with torchvision) and returns
finite, sane distances."""
import numpy as np
import pytest

from gaussianhaircut_tpu.ops import lpips as lpips_mod


def _synth_weights(path, seed=0):
    rng = np.random.default_rng(seed)
    blob = {}
    cin = 3
    i = 0
    for cout, layers in lpips_mod._VGG_BLOCKS:
        for _ in range(layers):
            blob[f"conv{i}_w"] = rng.normal(
                scale=0.05, size=(3, 3, cin, cout)).astype(np.float32)
            blob[f"conv{i}_b"] = np.zeros(cout, np.float32)
            cin = cout
            i += 1
    for k, (cout, _) in enumerate(lpips_mod._VGG_BLOCKS):
        blob[f"lin{k}_w"] = rng.uniform(0, 0.1, cout).astype(np.float32)
    np.savez(path, **blob)


def test_lpips_loads_and_returns_finite(tmp_path):
    path = str(tmp_path / "lpips_vgg.npz")
    _synth_weights(path)
    lp = lpips_mod.LPIPS(weights_path=path)
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(3, 64, 64)).astype(np.float32)
    b = rng.uniform(size=(3, 64, 64)).astype(np.float32)
    d_ab = float(lp(a, b))
    d_aa = float(lp(a, a))
    assert np.isfinite(d_ab)
    assert d_ab > d_aa >= 0.0 - 1e-6
    # batched form
    d_batch = np.asarray(lp(a[None], b[None]))
    assert d_batch.shape == (1,)
    np.testing.assert_allclose(d_batch[0], d_ab, rtol=1e-5)


def test_lpips_or_none_degrades(tmp_path):
    assert lpips_mod.lpips_or_none(str(tmp_path / "missing.npz")) is None
    path = str(tmp_path / "ok.npz")
    _synth_weights(path)
    assert lpips_mod.lpips_or_none(path) is not None


def test_metrics_cli_reports_lpips_with_weights(tmp_path, monkeypatch):
    """cli/metrics.py emits LPIPS when a weights npz exists (src/metrics.py
    contract: results.json with SSIM/PSNR/LPIPS)."""
    import json

    from PIL import Image

    from gaussianhaircut_tpu.cli import metrics as metrics_cli

    wpath = str(tmp_path / "lpips_vgg.npz")
    _synth_weights(wpath)

    method = tmp_path / "model" / "test" / "ours_1"
    (method / "renders").mkdir(parents=True)
    (method / "gt").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(method / "renders" / f"{i:05d}.png")
        img2 = np.clip(img + rng.normal(0, 8, img.shape), 0, 255).astype(np.uint8)
        Image.fromarray(img2).save(method / "gt" / f"{i:05d}.png")

    metrics_cli.main(["--model_paths", str(tmp_path / "model"),
                      "--lpips_weights", wpath])
    results = json.loads((tmp_path / "model" / "results.json").read_text())
    lp = list(results.values())[0]["LPIPS"]
    assert np.isfinite(lp) and lp > 0
