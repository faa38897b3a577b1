from tpugs.raster.api import rasterize  # noqa: F401
