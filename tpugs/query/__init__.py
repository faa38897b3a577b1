from tpugs.query.text import get_mask3d, score_features  # noqa: F401
from tpugs.query.masks import apply_mask3d  # noqa: F401
from tpugs.query.knn import knn_search, transfer_labels  # noqa: F401
