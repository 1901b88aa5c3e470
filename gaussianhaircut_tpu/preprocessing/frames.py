"""Frame extraction + image-quality filtering from raw video.

Behavioral ports of src/preprocessing/preprocess_raw_images.py:70-136 and
filter_extra_images.py: extract ~``target_frames`` frames from raw.mp4 at an
adaptive stride, score each frame's quality, keep the best frame per time
bin; then (filter stage) re-score on the hair crop and histogram-select the
best ``max_imgs`` frames, dropping frames where the hair overlaps the face by
more than 10% of the body.

Quality scorer: the reference uses hyperIQA (an external pretrained network
cloned at install time).  This port accepts any callable scorer; the built-in
default is a no-reference sharpness/contrast score (variance of Laplacian x
tonal spread) — a documented stand-in with the same interface, replaceable by
a converted hyperIQA when weights are provided.
"""
from __future__ import annotations

import os

import numpy as np


def sharpness_iqa(img_rgb: np.ndarray) -> float:
    """Legacy no-reference quality score (higher is better); see
    preprocessing/iqa.py for the better default tiers."""
    import cv2
    gray = cv2.cvtColor(img_rgb, cv2.COLOR_RGB2GRAY)
    lap = cv2.Laplacian(gray.astype(np.float32), cv2.CV_32F)
    spread = np.percentile(gray, 95) - np.percentile(gray, 5)
    return float(lap.var() * (spread / 255.0 + 1e-3))


def extract_frames(video_path: str, out_dir: str, target_frames: int = 256,
                   scorer=None, bin_keep: int = 1) -> list[str]:
    """Extract frames, keep the best-scoring frame per time bin
    (preprocess_raw_images.py:70-122).  Writes %06d.png; returns paths.
    scorer=None picks the best available tier (preprocessing/iqa.py)."""
    import cv2

    if scorer is None:
        from gaussianhaircut_tpu.preprocessing.iqa import default_scorer
        scorer = default_scorer()
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(video_path)
    n_total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    stride = max(1, n_total // max(target_frames * 2, 1))
    os.makedirs(out_dir, exist_ok=True)

    frames = []
    scores = []
    idx = 0
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        if idx % stride == 0:
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            frames.append((idx, rgb))
            scores.append(scorer(rgb))
        idx += 1
    cap.release()

    # best frame per bin of consecutive candidates
    n_bins = max(1, target_frames)
    per_bin = max(1, len(frames) // n_bins)
    out_paths = []
    for b in range(0, len(frames), per_bin):
        chunk = list(range(b, min(b + per_bin, len(frames))))
        best = max(chunk, key=lambda i: scores[i])
        fi, rgb = frames[best]
        path = os.path.join(out_dir, f"{fi:06d}.png")
        cv2.imwrite(path, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        out_paths.append(path)
    return out_paths


def filter_extra_images(scene_path: str, max_imgs: int = 128,
                        scorer=None, images_dir: str = "images",
                        masks_dir: str = "masks") -> list[str]:
    """Keep the best max_imgs frames by hair-crop quality; drop frames with
    hair/face overlap > 10% of body (filter_extra_images.py:44-46).  Removes
    rejected images (and their masks) from disk like the reference."""
    import cv2

    if scorer is None:
        from gaussianhaircut_tpu.preprocessing.iqa import default_scorer
        scorer = default_scorer()
    img_root = os.path.join(scene_path, images_dir)
    names = sorted(os.listdir(img_root))
    kept = []
    scored = []
    for name in names:
        img = cv2.cvtColor(cv2.imread(os.path.join(img_root, name)),
                           cv2.COLOR_BGR2RGB)
        hair_p = os.path.join(scene_path, masks_dir, "hair", name)
        face_p = os.path.join(scene_path, masks_dir, "face", name)
        body_p = os.path.join(scene_path, masks_dir, "body", name)
        crop = img
        if os.path.exists(hair_p):
            hair = cv2.imread(hair_p, 0) > 127
            if os.path.exists(face_p) and os.path.exists(body_p):
                face = cv2.imread(face_p, 0) > 127
                body = cv2.imread(body_p, 0) > 127
                if body.sum() > 0 and (hair & face).sum() > 0.1 * body.sum():
                    scored.append((name, -np.inf))
                    continue
            ys, xs = np.nonzero(hair)
            if len(ys) > 16:
                crop = img[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
        scored.append((name, scorer(crop)))

    # histogram binning over time: best frame per bin
    n_bins = min(max_imgs, len(scored))
    per_bin = max(1, len(scored) // n_bins)
    keep = set()
    for b in range(0, len(scored), per_bin):
        chunk = scored[b:b + per_bin]
        name, sc = max(chunk, key=lambda t: t[1])
        if sc > -np.inf and len(keep) < max_imgs:
            keep.add(name)

    for name in names:
        if name not in keep:
            for p in (os.path.join(img_root, name),
                      os.path.join(scene_path, masks_dir, "hair", name),
                      os.path.join(scene_path, masks_dir, "face", name),
                      os.path.join(scene_path, masks_dir, "body", name)):
                if os.path.exists(p):
                    os.remove(p)
        else:
            kept.append(name)
    return kept
