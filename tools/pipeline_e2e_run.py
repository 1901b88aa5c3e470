"""PIPELINE_rNN wall-clock record: the full run.sh-shaped reconstruction
(stage 1 30k -> stage 2 20k -> stage 3 10k @ images_2=512px, 10k strands,
L=100 — the reference operating point, run.sh:110-195) driven END-TO-END
through cli/run_pipeline.py on an on-disk scene, timing every stage.

The scene is fabricated at 1024px from a strand+head teacher (the external
neural preprocessing — Matte-Anything masks — is synthesized from the
teacher's own alpha, exactly the pluggable-contract posture of run.sh), so
the record measures what a run.sh user experiences: preprocessing (filter,
resize, orientation maps), three training stages, exports.

Usage: python tools/pipeline_e2e_run.py --out PIPELINE_r05.json
       [--scene /root/repo/runs/r5/pipeline_scene] [--views 24] [--res 1024]
"""
import argparse
import json
import math
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def build_scene(scene, views, res, n_strands, length, seed=0):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from quality_strands import (make_cameras, make_head_model,
                                 teacher_fields, teacher_strands)

    from gaussianhaircut_tpu.models.textured_strands import (
        synthetic_scalp_pool)
    from gaussianhaircut_tpu.ops.rasterize import RasterConfig
    from gaussianhaircut_tpu.render.renderer import (default_background,
                                                     render_fields)
    from gaussianhaircut_tpu.scene import colmap as colmap_io
    from gaussianhaircut_tpu.scene.cameras import camera_geom
    from gaussianhaircut_tpu.train import stage2
    from gaussianhaircut_tpu.models import gaussian_model as gm

    rng = np.random.default_rng(seed)
    pool = synthetic_scalp_pool(20000)
    t_pts, t_rgb, t_uvs, t_l2w = teacher_strands(pool, n_strands, length, rng)
    radius_scale = jnp.asarray(6e-4, jnp.float32)
    hair_t = teacher_fields(t_pts, t_rgb, radius_scale, 1)
    head_model = make_head_model(rng)
    head = stage2.make_head_fields(head_model)
    fields_gt = stage2.concat_fields(head, hair_t)

    raster_cfg = RasterConfig(backend="auto", capacity_mult=10)
    bg = default_background(False)
    cams = make_cameras(views, res, res)

    @jax.jit
    def render_gt(colmap_t, fovx, fovy):
        cam = camera_geom(colmap_t, fovx, fovy, res, res, None)
        out = render_fields(fields_gt, 1, cam, bg, raster_cfg)
        return (jnp.clip(out["render"], 0, 1), jnp.clip(out["mask"], 0, 1),
                jnp.clip(out["orient_angle"], 0, 1), out["num_rendered"])

    os.makedirs(f"{scene}/sparse/0", exist_ok=True)
    for sub in ("images", "masks/hair", "masks/face", "masks/body"):
        os.makedirs(f"{scene}/{sub}", exist_ok=True)

    fov = float(cams[0].fovx)
    focal = res / (2 * math.tan(fov / 2))
    colmap_io.write_cameras_text(
        f"{scene}/sparse/0/cameras.txt",
        {1: colmap_io.ColmapCamera(1, "PINHOLE", res, res,
                                   np.array([focal, focal, res / 2,
                                             res / 2]))})
    imgs = {}
    max_nr = 0
    for i, c in enumerate(cams):
        img, mask, angle, nr = jax.device_get(render_gt(
            jnp.asarray(c.colmap_transform), jnp.asarray(c.fovx),
            jnp.asarray(c.fovy)))
        max_nr = max(max_nr, int(nr))
        name = f"{i:06d}.png"
        Image.fromarray((np.asarray(img).transpose(1, 2, 0) * 255).astype(
            np.uint8)).save(f"{scene}/images/{name}")
        hair_a = (np.asarray(mask[0]) * 255).astype(np.uint8)
        body_a = (np.asarray(mask[1]) * 255).astype(np.uint8)
        Image.fromarray(hair_a).save(f"{scene}/masks/hair/{name}")
        Image.fromarray(body_a).save(f"{scene}/masks/body/{name}")
        # face = body minus hair (soft)
        face_a = np.clip(body_a.astype(np.int32) - hair_a.astype(np.int32),
                         0, 255).astype(np.uint8)
        Image.fromarray(face_a).save(f"{scene}/masks/face/{name}")
        R = np.asarray(c.colmap_transform[:3, :3])
        t = np.asarray(c.colmap_transform[:3, 3])
        imgs[i + 1] = colmap_io.ColmapImage(i + 1,
                                            colmap_io.rotmat_to_qvec(R), t,
                                            1, name)
    colmap_io.write_images_text(f"{scene}/sparse/0/images.txt", imgs)

    # SfM-like init cloud: subsample of head + strand points, noisy
    head_pts = np.asarray(head_model.params.xyz[
        np.asarray(head_model.aux.alive)])
    strand_pts = np.asarray(t_pts).reshape(-1, 3)
    k = min(25000, strand_pts.shape[0])
    sel = rng.choice(strand_pts.shape[0], size=k, replace=False)
    cloud = np.concatenate([head_pts, strand_pts[sel]], axis=0)
    cloud = cloud + rng.normal(scale=2e-3, size=cloud.shape)
    with open(f"{scene}/sparse/0/points3D.txt", "w") as f:
        f.write("# points\n# \n# \n")
        for j, p in enumerate(cloud):
            f.write(f"{j} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} 128 128 128 0.5\n")
    print(f"# scene built: {views} views @ {res}px, teacher {n_strands}x"
          f"L{length}, GT max num_rendered {max_nr}, init cloud "
          f"{cloud.shape[0]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/repo/runs/r5/pipeline_scene")
    ap.add_argument("--out", default="PIPELINE_r05.json")
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--teacher_strands", type=int, default=10000)
    ap.add_argument("--strand_length", type=int, default=100)
    ap.add_argument("--skip_build", action="store_true")
    args = ap.parse_args()

    if not args.skip_build and not os.path.exists(
            f"{args.scene}/sparse/0/images.txt"):
        t0 = time.time()
        build_scene(args.scene, args.views, args.res, args.teacher_strands,
                    args.strand_length)
        print(f"# scene build: {time.time()-t0:.0f}s", flush=True)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    t_start = time.time()
    stage_t = {}
    last = t_start
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "gaussianhaircut_tpu.cli.run_pipeline",
         "--data_path", args.scene],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
    log_path = os.path.join(os.path.dirname(args.scene) or ".",
                            "pipeline_run.log")
    with open(log_path, "w") as logf:
        for line in proc.stdout:
            logf.write(line)
            logf.flush()
            m = re.match(r"=== (\S+): done ===", line)
            if m:
                now = time.time()
                stage_t[m.group(1)] = round(now - last, 1)
                last = now
                print(f"# stage {m.group(1)}: {stage_t[m.group(1)]}s",
                      flush=True)
    rc = proc.wait()
    total = time.time() - t_start
    result = {
        "config": {"views": args.views, "res_raw": args.res,
                   "res_train": args.res // 2,
                   "teacher_strands": args.teacher_strands,
                   "strand_length": args.strand_length,
                   "iters": [30000, 20000, 10000],
                   "num_strands": 10000},
        "returncode": rc,
        "stage_seconds": stage_t,
        "total_seconds": round(total, 1),
        "total_hours": round(total / 3600, 2),
        "log": log_path,
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
