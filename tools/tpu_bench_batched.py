"""Measure train_step_batched camera-throughput vs batch size on the TPU.

Usage: python tools/tpu_bench_batched.py [B ...]   (default 1 2 4 8)
Env: BENCH_P / BENCH_W / BENCH_H / BENCH_ITERS / BENCH_CAP_MULT as in bench.py.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_scene(p, width, height, n_views):
    from gaussianhaircut_tpu.models import gaussian_model as gm
    from gaussianhaircut_tpu.scene.cameras import CameraBatch, CameraStatic
    from gaussianhaircut_tpu.train.stage1 import GtBatch, init_train_state

    rng = np.random.default_rng(0)
    pts = rng.normal(scale=0.3, size=(p, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, size=(p, 3)).astype(np.float32)
    state = gm.create_from_pcd(pts, cols, p, 3, 1.0)
    cams = []
    fov = math.radians(50)
    for i in range(n_views):
        a = 2 * math.pi * i / n_views
        center = np.array([2.5 * math.sin(a), 0.3, 2.5 * math.cos(a)])
        fwd = -center / np.linalg.norm(center)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], axis=0)
        w2c[:3, 3] = -w2c[:3, :3] @ center
        c = CameraStatic(uid=i, colmap_id=i, image_name=f"{i:04d}",
                         width=width, height=height, colmap_transform=w2c,
                         fovx=fov, fovy=fov)
        c.image = rng.uniform(size=(3, height, width)).astype(np.float32)
        c.mask_hair = np.full((1, height, width), 0.5, np.float32)
        c.mask_body = np.ones((1, height, width), np.float32)
        c.orient_angle = rng.uniform(size=(1, height, width)).astype(np.float32)
        c.orient_conf = np.ones((1, height, width), np.float32)
        cams.append(c)
    return state, CameraBatch.from_cameras(cams), GtBatch.from_cameras(cams)


def main():
    import jax
    import jax.numpy as jnp
    from gaussianhaircut_tpu.config import OptimizationConfig
    from gaussianhaircut_tpu.ops.rasterize import RasterConfig
    from gaussianhaircut_tpu.train import stage1
    from gaussianhaircut_tpu.train.stage1 import init_train_state

    bs = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    p = int(os.environ.get("BENCH_P", 100_000))
    width = int(os.environ.get("BENCH_W", 960))
    height = int(os.environ.get("BENCH_H", 544))
    iters = int(os.environ.get("BENCH_ITERS", 12))
    n_views = max(bs)

    state, cam_batch, gt = make_scene(p, width, height, n_views)
    opt_cfg = OptimizationConfig(lambda_dorient=0.1)
    mult = int(os.environ.get("BENCH_CAP_MULT", 8))
    raster_cfg = RasterConfig(backend="auto", tile_w=32, tile_h=32, chunk=128,
                              capacity_mult=mult, segment_chunks=4096)

    for b in bs:
        tstate = init_train_state(state, n_views, use_barf=True)
        if b == 1:
            def step(ts, i):
                return stage1.train_step(
                    ts, cam_batch, gt, jnp.asarray(i % n_views),
                    active_sh_degree=3, width=width, height=height,
                    raster_cfg=raster_cfg, opt_cfg=opt_cfg,
                    trainable_cameras=True, trainable_intrinsics=True,
                    use_barf=True, white_background=False)
        else:
            def step(ts, i):
                idxs = jnp.asarray([(i + j) % n_views for j in range(b)],
                                   jnp.int32)
                return stage1.train_step_batched(
                    ts, cam_batch, gt, idxs, active_sh_degree=3,
                    width=width, height=height, raster_cfg=raster_cfg,
                    opt_cfg=opt_cfg, trainable_cameras=True,
                    trainable_intrinsics=True, use_barf=True,
                    white_background=False, n_batch=b)
        t_c0 = time.time()
        tstate, m = step(tstate, 0)
        jax.block_until_ready(tstate.model.params.xyz)
        compile_s = time.time() - t_c0
        t0 = time.time()
        for i in range(iters):
            tstate, m = step(tstate, i)
        jax.block_until_ready(tstate.model.params.xyz)
        dt = (time.time() - t0) / iters
        nr = int(m["num_rendered"])
        cap = raster_cfg.instance_capacity(p * b)
        print(f"B={b}: {dt*1e3:8.2f} ms/step  {b/dt:6.2f} cam/s  "
              f"loss={float(m['total']):.4f} ok={bool(m['grads_ok'])} "
              f"nr={nr} cap={cap} occ={nr/cap:.2f} compile={compile_s:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
