from .model import (NeRF, Embedder, get_embedder, init_nerf_params, nerf_apply,
                    img2mse, mse2psnr, to8b)
from .dataset import load_blender_data, load_llff_data, load_dv_data
