from gaussianhaircut_tpu.render.renderer import render, render_fields, GaussianFields  # noqa: F401
