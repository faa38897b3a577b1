from tpugs.train.config import TrainConfig  # noqa: F401
from tpugs.train.trainer import Trainer  # noqa: F401
