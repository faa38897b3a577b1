from tpugs.viz.gif import render_to_gif, render_mask_2d_to_gif  # noqa: F401
from tpugs.viz.pca import feature_pca, render_pca  # noqa: F401
