from gaussianhaircut_tpu.parallel.data_parallel import (  # noqa: F401
    make_camera_mesh,
    dp_train_step,
)
from gaussianhaircut_tpu.parallel.tile_parallel import (  # noqa: F401
    make_mesh2d,
    dp_tp_train_step,
)
