from .api import soft_rasterize, soft_rasterize_with_aux, set_backend
from .params import SoftRasParams, make_params
