from gaussianhaircut_tpu.ops import sh, quaternion, lie, projection, losses, ssim, knn  # noqa: F401
