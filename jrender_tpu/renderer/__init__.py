from .renderer import Renderer, SoftRenderer
from .rasterizer import SoftRasterizer, pool2x_mean
