from tpugs.io.colmap import SceneManager  # noqa: F401
from tpugs.io.checkpoints import load_checkpoint, save_checkpoint  # noqa: F401
