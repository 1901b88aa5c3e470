from gaussianhaircut_tpu.models.gaussian_model import GaussianParams, GaussianModelState  # noqa: F401
