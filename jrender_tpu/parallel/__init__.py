from .mesh import make_device_mesh, shard_batch, replicate
from .render import soft_rasterize_sharded
from .nerf import make_sharded_nerf_step, shard_nerf_params
