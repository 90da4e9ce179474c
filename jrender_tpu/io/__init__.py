from .load_obj import load_obj
from .save_obj import save_obj, save_voxel
