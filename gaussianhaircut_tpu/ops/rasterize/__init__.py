from gaussianhaircut_tpu.ops.rasterize.api import (  # noqa: F401
    RasterConfig,
    rasterize,
    rasterize_batched,
)
