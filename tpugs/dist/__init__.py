from tpugs.dist.mesh import make_mesh  # noqa: F401
from tpugs.dist.shard import backproject_views_sharded  # noqa: F401
