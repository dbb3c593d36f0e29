from .gs_raster import RasterizeConfig, rasterize  # noqa: F401
from .knn import dist_to_3nn_sq  # noqa: F401
from .ssim import ssim  # noqa: F401
