from gaussianhaircut_tpu.scene.dataset import SceneData, load_scene  # noqa: F401
from gaussianhaircut_tpu.scene.cameras import CameraStatic, CameraResiduals, camera_geom  # noqa: F401
