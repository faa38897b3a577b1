from tpugs.core.scene import GaussianScene  # noqa: F401
from tpugs.core.camera import Camera  # noqa: F401
