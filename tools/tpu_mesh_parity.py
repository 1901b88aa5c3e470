"""Pallas-under-mesh parity artifact (VERDICT r2 weak #7): on the single
real TPU, run the dp_tp (camera x tile-row) mesh train step with
backend='pallas' over a 1x1 mesh and record agreement vs the unsharded
train_step into a checked-in JSON.  The CPU-mesh tests pin backend='jnp';
this closes the kernel-under-shard_map gap with a committed artifact.

Usage: python tools/tpu_mesh_parity.py [--out PARITY_MESH_r03.json]
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--p", type=int, default=20000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussianhaircut_tpu.config import OptimizationConfig
    from gaussianhaircut_tpu.models import gaussian_model as gm
    from gaussianhaircut_tpu.ops.rasterize import RasterConfig
    from gaussianhaircut_tpu.parallel import dp_tp_train_step, make_mesh2d
    from gaussianhaircut_tpu.scene.cameras import CameraBatch, CameraStatic
    from gaussianhaircut_tpu.train import stage1

    res = args.res
    rng = np.random.default_rng(0)
    p = args.p
    pts = rng.normal(scale=0.3, size=(p, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, size=(p, 3)).astype(np.float32)
    state = gm.create_from_pcd(pts, cols, p, 3, 1.0)

    fov = math.radians(50)
    cams = []
    for i in range(2):
        a = 2 * math.pi * i / 2
        center = np.array([2.5 * math.sin(a), 0.3, 2.5 * math.cos(a)])
        fwd = -center / np.linalg.norm(center)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], axis=0)
        w2c[:3, 3] = -w2c[:3, :3] @ center
        c = CameraStatic(uid=i, colmap_id=i, image_name=f"{i:04d}", width=res,
                         height=res, colmap_transform=w2c, fovx=fov, fovy=fov)
        c.image = rng.uniform(size=(3, res, res)).astype(np.float32)
        c.mask_hair = np.full((1, res, res), 0.5, np.float32)
        c.mask_body = np.ones((1, res, res), np.float32)
        c.orient_angle = rng.uniform(size=(1, res, res)).astype(np.float32)
        c.orient_conf = np.ones((1, res, res), np.float32)
        cams.append(c)
    cam_batch = CameraBatch.from_cameras(cams)
    gt = stage1.GtBatch.from_cameras(cams)

    raster_cfg = RasterConfig(backend="pallas", capacity_mult=10)
    opt_cfg = OptimizationConfig(lambda_dorient=0.1)
    common = dict(active_sh_degree=3, width=res, height=res,
                  raster_cfg=raster_cfg, opt_cfg=opt_cfg,
                  trainable_cameras=True, trainable_intrinsics=True,
                  use_barf=True, white_background=False)

    # unsharded reference steps
    ref = stage1.init_train_state(state, 2, use_barf=True)
    for i in range(args.steps):
        ref, ref_m = stage1.train_step(ref, cam_batch, gt,
                                       jnp.asarray(i % 2), **common)
    jax.block_until_ready(ref.model.params.xyz)

    # 1x1 mesh (the real-TPU shard_map path, kernels under the mesh)
    mesh = make_mesh2d(1, 1)
    step = dp_tp_train_step(mesh, **common)
    ts = stage1.init_train_state(state, 2, use_barf=True)
    t0 = time.time()
    for i in range(args.steps):
        ts, tp_m = step(ts, cam_batch, gt, jnp.asarray([i % 2], jnp.int32))
    jax.block_until_ready(ts.model.params.xyz)
    dt = time.time() - t0

    def rel(a, b):
        a, b = np.asarray(a), np.asarray(b)
        s = np.abs(b).max() + 1e-12
        return float(np.abs(a - b).max() / s)

    diffs = {
        "xyz": rel(ts.model.params.xyz, ref.model.params.xyz),
        "opacity": rel(ts.model.params.opacity, ref.model.params.opacity),
        "scaling": rel(ts.model.params.scaling, ref.model.params.scaling),
        "features_dc": rel(ts.model.params.features_dc,
                           ref.model.params.features_dc),
        "xyz_grad_accum": rel(ts.model.aux.xyz_grad_accum,
                              ref.model.aux.xyz_grad_accum),
        "denom": rel(ts.model.aux.denom, ref.model.aux.denom),
        "cam_translation": rel(ts.cam_res.translation, ref.cam_res.translation),
        "loss_total": abs(float(tp_m["total"]) - float(ref_m["total"])),
    }
    tol = 2e-3
    ok = all(v <= tol for v in diffs.values())
    result = {
        "config": {"p": p, "res": res, "steps": args.steps,
                   "backend": "pallas", "mesh": "1x1",
                   "sort_mode": raster_cfg.sort_mode,
                   "platform": jax.default_backend()},
        "max_rel_diffs": {k: round(v, 9) for k, v in diffs.items()},
        "tolerance": tol,
        "parity_ok": ok,
        "mesh_seconds_per_step": round(dt / args.steps, 4),
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
