from gaussianhaircut_tpu.parallel.data_parallel import (  # noqa: F401
    make_camera_mesh,
    dp_train_step,
)
