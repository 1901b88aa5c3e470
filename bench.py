"""Benchmark: stage-1 train iterations/sec on a synthetic head-scale scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context: the reference publishes no numbers (BASELINE.md); vanilla
3DGS-class trainers run stage-1 (30k iters, ~half-res video frames) at roughly
15 it/s on the reference's RTX-4090 class hardware, which we use as the
denominator for vs_baseline until a measured reference run exists.
"""
import json
import math
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_ITERS_PER_SEC = 15.0
# 1M@1080p headline bar (VERDICT r2 target: >= 2 it/s; the reference
# publishes no numbers at this scale)
REFERENCE_ITERS_PER_SEC_1M = 2.0


def run_config(p, width, height, iters, *, is_headline=False):
    import jax
    import jax.numpy as jnp
    from gaussianhaircut_tpu.config import OptimizationConfig
    from gaussianhaircut_tpu.ops.rasterize import RasterConfig
    from gaussianhaircut_tpu.train import stage1
    from gaussianhaircut_tpu.models import gaussian_model as gm
    from gaussianhaircut_tpu.scene.cameras import CameraBatch, CameraStatic
    from gaussianhaircut_tpu.train.stage1 import GtBatch, init_train_state

    rng = np.random.default_rng(0)
    pts = rng.normal(scale=0.3, size=(p, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, size=(p, 3)).astype(np.float32)
    state = gm.create_from_pcd(pts, cols, p, 3, 1.0)

    n_views = 4
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
    cam_batch = CameraBatch.from_cameras(cams)
    gt = GtBatch.from_cameras(cams)

    opt_cfg = OptimizationConfig(lambda_dorient=0.1)
    tile = int(os.environ.get("BENCH_TILE", 32))
    tile_h = int(os.environ.get("BENCH_TILE_H", tile))
    mult_env = os.environ.get("BENCH_CAP_MULT")

    def make_cfg(mult):
        return RasterConfig(
            backend="auto", tile_w=tile, tile_h=tile_h,
            chunk=int(os.environ.get("BENCH_CHUNK", 256)),
            capacity_mult=mult,
            segment_chunks=int(os.environ.get("BENCH_SEG", 4096)),
            power_mode=os.environ.get("BENCH_POWER", "split3"),
            fwd_acc=os.environ.get("BENCH_FWD_ACC", "bf16x2"),
            bwd_matmul=os.environ.get("BENCH_BWD_MATMUL", "bf16x2"),
            reduce_mode=os.environ.get("BENCH_REDUCE", "rowmajor"),
            reduce_cumsum=os.environ.get("BENCH_REDUCE_CUMSUM", "trimm"),
            pair_cull=bool(int(os.environ.get("BENCH_PAIR_CULL", "0"))),
            io_mode=os.environ.get("BENCH_IO", "auto"),
            step_chunks=int(os.environ.get("BENCH_STEP_CHUNKS", "1")),
            pay_gather=os.environ.get("BENCH_PAY", "rows"))

    # probe at a generous capacity, then right-size to the measured instance
    # count + headroom (the bench analog of the trainer's auto-grow: capacity
    # is pure padding overhead as long as nothing is truncated; the r1 bench
    # ran mult=4 and silently truncated ~half the instances)
    raster_cfg = make_cfg(int(mult_env) if mult_env else 9)
    tstate = init_train_state(state, n_views, use_barf=True)

    def step(tstate, idx):
        return stage1.train_step(
            tstate, cam_batch, gt, idx, active_sh_degree=3,
            width=width, height=height, raster_cfg=raster_cfg,
            opt_cfg=opt_cfg, trainable_cameras=True,
            trainable_intrinsics=True, use_barf=True, white_background=False)

    tstate, m0 = step(tstate, jnp.asarray(0))
    jax.block_until_ready(tstate.model.params.xyz)
    if mult_env is None:
        nr = int(m0["num_rendered"])
        mult = min(max(2, -(-int(1.12 * nr) // p)), 64)
        if mult != raster_cfg.capacity_mult:
            print(f"# right-sizing capacity_mult 9 -> {mult} "
                  f"(num_rendered {nr})", file=sys.stderr)
            raster_cfg = make_cfg(mult)
            tstate, _ = step(tstate, jnp.asarray(0))
            jax.block_until_ready(tstate.model.params.xyz)

    t0 = time.time()
    for i in range(iters):
        tstate, metrics = step(tstate, jnp.asarray(i % n_views))
    jax.block_until_ready(tstate.model.params.xyz)
    dt = (time.time() - t0) / iters
    its = 1.0 / dt

    # sanity: a frozen/NaN state would invalidate the timing (repeated
    # identical executions can be served from a relay cache)
    ok = bool(metrics["grads_ok"])
    loss = float(metrics["total"])
    num_rendered = int(metrics["num_rendered"])
    cap = raster_cfg.instance_capacity(p)
    # occupancy re-check AFTER the timed loop: num_rendered can grow over the
    # timed iterations even densification-free (params move), silently
    # reintroducing truncation (ADVICE r2) — flag it in the JSON
    overflow = num_rendered > cap
    print(f"# final loss={loss:.5g} grads_ok={ok} num_rendered={num_rendered} "
          f"capacity={cap} occupancy={num_rendered / cap:.2f}", file=sys.stderr)
    if overflow:
        print(f"# WARNING: final num_rendered exceeded capacity — timed run "
              f"truncated instances, treat value as invalid", file=sys.stderr)
    if not ok or not np.isfinite(loss):
        print(json.dumps({"metric": "stage1 train iters/sec (INVALID: "
                          "non-finite gradients)", "value": 0.0,
                          "unit": "iters/sec", "vs_baseline": 0.0}))
        return

    # pick the proxy denominator by SCALE, not call site: an env-pinned
    # BENCH_P=1000000 A/B run is the same headline config and must not be
    # divided by the 100k proxy (r4f queue emitted vs_baseline 0.159 for a
    # 2.392 it/s 1M run before this fix)
    headline_scale = p >= 1_000_000 or width * height >= 1920 * 1080
    ref = (REFERENCE_ITERS_PER_SEC_1M if (is_headline or headline_scale)
           else REFERENCE_ITERS_PER_SEC)
    print(json.dumps({
        "metric": f"stage1 train iters/sec ({p} gaussians, {width}x{height})",
        "value": round(its, 3),
        "unit": "iters/sec",
        "vs_baseline": round(its / ref, 3),
        # the denominator is a GUESSED single-GPU proxy, not a measured
        # reference run (BASELINE.md "Reference speed"): treat vs_baseline
        # as indicative only
        "baseline_kind": "proxy-4090-class-15its",
        "mpix_per_sec": round(its * width * height / 1e6, 3),
        "num_rendered": num_rendered,
        "instance_capacity": cap,
        "overflow": overflow,
    }), flush=True)


def main():
    import jax

    p = int(os.environ.get("BENCH_P", 100_000))
    width = int(os.environ.get("BENCH_W", 960))
    height = int(os.environ.get("BENCH_H", 544))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    # the BASELINE.json headline config (1M-Gaussian strand-scale fit at
    # 1080p) runs FIRST as its own JSON line on real accelerators; the 100k
    # line stays LAST (the driver's primary metric, comparable across
    # rounds).  Skipped on CPU and when the caller pins a custom config.
    custom = any(k in os.environ for k in ("BENCH_P", "BENCH_W", "BENCH_H"))
    on_accel = jax.default_backend() not in ("cpu",)
    if on_accel and not custom and not os.environ.get("BENCH_SKIP_1M"):
        run_config(1_000_000, 1920, 1080,
                   int(os.environ.get("BENCH_ITERS_1M", 8)), is_headline=True)
    run_config(p, width, height, iters)


if __name__ == "__main__":
    main()
