from tpugs.encoders.base import (  # noqa: F401
    FeatureEncoder,
    GrayscaleEncoder,
    LinearRGBEncoder,
    PatchAverageEncoder,
)
