"""jrender_tpu — a TPU-native differentiable renderer (JAX/XLA/Pallas).

Re-implements the full capability surface of the reference jrender 2.0
(differentiable mesh rasterization + volume/NeRF rendering) with a
TPU-first design: Pallas kernels for the rasterizer hot loops, pure-XLA
everywhere else, shard_map/pjit parallelism over pixels and rays.

Top-level API mirrors the reference `jrender` package:
    Mesh, Renderer, SoftRenderer, load_obj, save_obj, losses,
    soft_rasterize, Scene (scene graph + deferred pipeline).
"""

from .structures import Mesh, join_meshes_as_scene
from .renderer import Renderer, SoftRenderer, SoftRasterizer
from .transform import Transform, look, look_at, perspective, orthogonal, projection
from .lighting import Lighting, AmbientLighting, DirectionalLighting, lighting
from .io import load_obj, save_obj
from .loss import LaplacianLoss, FlattenLoss, neg_iou_loss
from .ops.softras import soft_rasterize
from .scene import Scene, Render, Light, Texture
from .utils import get_points_from_angles

__version__ = '0.1.0'
