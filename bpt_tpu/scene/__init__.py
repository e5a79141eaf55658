from bpt_tpu.scene.types import SceneArrays, MaterialTable, TextureTable, CameraConfig  # noqa: F401
from bpt_tpu.scene.builder import SceneBuilder, MaterialSpec, TextureSpec  # noqa: F401
