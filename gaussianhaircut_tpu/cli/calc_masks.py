"""Hair/face/body mask computation (contract of
src/preprocessing/calc_masks.py: writes masks/{hair,face,body}/<frame>.png).

The reference runs Matte-Anything (GroundingDINO text-prompted boxes -> SAM
-> trimap -> ViTMatte alpha) in its own conda env — external pretrained
networks this zero-egress environment cannot host.  This CLI therefore:

1. shells out to ``--external_cmd`` when provided (the run.sh-style
   cross-environment hand-off), else
2. falls back to a classical luma/grabcut segmentation good enough for
   smoke-testing the downstream pipeline on controlled captures (documented
   stand-in, NOT a quality replacement for Matte-Anything).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np


def grabcut_masks(img_bgr):
    """(hair, face, body) uint8 masks via cv2 grabcut + skin/darkness priors."""
    import cv2
    h, w = img_bgr.shape[:2]
    mask = np.zeros((h, w), np.uint8)
    rect = (w // 8, h // 12, w * 3 // 4, h * 9 // 10)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv2.grabCut(img_bgr, mask, rect, bgd, fgd, 3, cv2.GC_INIT_WITH_RECT)
    body = np.where((mask == 2) | (mask == 0), 0, 255).astype(np.uint8)

    ycrcb = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2YCrCb)
    skin = cv2.inRange(ycrcb, (0, 135, 85), (255, 180, 135))
    face = cv2.bitwise_and(skin, body)
    gray = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2GRAY)
    dark = (gray < np.percentile(gray[body > 0], 45)
            if (body > 0).any() else gray < 64)
    hair = cv2.bitwise_and((dark * 255).astype(np.uint8),
                           cv2.bitwise_and(body, cv2.bitwise_not(face)))
    hair = cv2.morphologyEx(hair, cv2.MORPH_CLOSE, np.ones((7, 7), np.uint8))
    return hair, face, body


def main(argv=None):
    import cv2

    parser = argparse.ArgumentParser("calc_masks")
    parser.add_argument("--scene_path", required=True)
    parser.add_argument("--images_dir", default="input")
    parser.add_argument("--external_cmd", default="",
                        help="command to run instead (Matte-Anything env); "
                             "receives the scene path via {scene}")
    args = parser.parse_args(argv)

    if args.external_cmd:
        cmd = args.external_cmd.format(scene=args.scene_path)
        print("+", cmd)
        sys.exit(subprocess.call(cmd, shell=True))

    print("[warn] running classical fallback segmentation — for production "
          "quality provide --external_cmd running Matte-Anything")
    src = os.path.join(args.scene_path, args.images_dir)
    for sub in ("hair", "face", "body"):
        os.makedirs(os.path.join(args.scene_path, "masks", sub), exist_ok=True)
    for name in sorted(os.listdir(src)):
        img = cv2.imread(os.path.join(src, name))
        if img is None:
            continue
        hair, face, body = grabcut_masks(img)
        for sub, m in (("hair", hair), ("face", face), ("body", body)):
            cv2.imwrite(os.path.join(args.scene_path, "masks", sub, name), m)


if __name__ == "__main__":
    main()
