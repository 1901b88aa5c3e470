"""run_pipeline.py end-to-end smoke at toy scale: the FULL orchestrator path
(masks present -> resize -> orientations -> stage1 -> crop -> synthetic GT ->
stage2 -> stage3 -> export) on a fabricated strand-scene directory — the same
builder tools/pipeline_e2e_run.py uses for the at-scale PIPELINE_rNN record
(reference run.sh:1-233)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow
def test_run_pipeline_end_to_end_smoke(tmp_path):
    from pipeline_e2e_run import build_scene

    from gaussianhaircut_tpu.cli import run_pipeline

    scene = str(tmp_path / "scene")
    build_scene(scene, views=3, res=64, n_strands=64, length=8)
    assert os.path.exists(f"{scene}/sparse/0/images.txt")
    assert os.path.exists(f"{scene}/masks/hair/000000.png")

    run_pipeline.main([
        "--data_path", scene,
        "--iters1", "20", "--iters2", "6", "--iters3", "4",
        "--extra_train_args",
        "--raster_backend jnp --tile 16 --instance_capacity_mult 32 "
        "--gaussian_capacity 4096 --test_iterations -1",
        "--extra_strand_args",
        "--num_strands 8 --texture_size 16 --strand_length 8 "
        "--diffusion_input 4",
    ])

    model = f"{scene}/3d_gaussian_splatting/stage1"
    assert os.path.exists(f"{model}/point_cloud/iteration_20")
    assert os.path.exists(f"{scene}/scale.pickle")
    assert os.path.exists(f"{scene}/orientations_2/angles/000000.png")
    hair = f"{scene}/strands_reconstruction/stage2"
    assert os.path.exists(f"{hair}/checkpoints/6.npz")
    curves = f"{scene}/curves_reconstruction/stage3"
    assert os.path.exists(f"{curves}/checkpoints/4.npz")
    strands_pkl = f"{curves}/strands/4_strands.pkl"
    assert os.path.exists(strands_pkl)
    import pickle

    with open(strands_pkl, "rb") as f:
        pts = pickle.load(f)
    assert pts.shape[0] == 8 and np.isfinite(np.asarray(pts)).all()
