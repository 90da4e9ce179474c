"""Static configuration for the SoftRas rasterizer.

Mirrors the knobs of the reference SoftRasterizeFunction
(jrender/renderer/dr/softras/soft_rasterize.py:10-32).
"""
from __future__ import annotations

import dataclasses
import math

DIST_FUNC = {'hard': 0, 'barycentric': 1, 'euclidean': 2}
RGB_FUNC = {'hard': 0, 'softmax': 1, 'none': 2}
ALPHA_FUNC = {'hard': 0, 'sum': 1, 'prod': 2}
TEXTURE_TYPE = {'surface': 0, 'vertex': 1}


@dataclasses.dataclass(frozen=True)
class SoftRasParams:
    image_size: int = 256
    background_color: tuple = (0.0, 0.0, 0.0)
    near: float = 1.0
    far: float = 100.0
    eps: float = 1e-3
    sigma_val: float = 1e-5
    dist_func: str = 'euclidean'
    # NOTE: like the reference (:25), dist_eps here stores log(1/eps - 1)
    dist_eps: float = math.log(1.0 / 1e-4 - 1.0)
    gamma_val: float = 1e-4
    aggr_func_rgb: str = 'softmax'
    aggr_func_alpha: str = 'prod'
    texture_type: str = 'surface'
    fill_back: bool = True          # "double_side" in the kernels
    max_faces_id: int = 16          # top-K faces kept per pixel for backward
    # 'topk'  -> reference default truncated gradient (K nearest faces)
    # 'full'  -> untruncated gradient (reference's legacy naive backward,
    #            soft_rasterize.py:523); more accurate, Pallas-friendly
    grad_mode: str = 'topk'

    @property
    def dist_func_id(self) -> int:
        return DIST_FUNC[self.dist_func]

    @property
    def rgb_func_id(self) -> int:
        return RGB_FUNC[self.aggr_func_rgb]

    @property
    def alpha_func_id(self) -> int:
        return ALPHA_FUNC[self.aggr_func_alpha]

    @property
    def texture_type_id(self) -> int:
        return TEXTURE_TYPE[self.texture_type]

    @property
    def threshold(self) -> float:
        return self.dist_eps * self.sigma_val


def make_params(image_size=256, background_color=(0, 0, 0), near=1, far=100,
                fill_back=True, eps=1e-3, sigma_val=1e-5, dist_func='euclidean',
                dist_eps=1e-4, gamma_val=1e-4, aggr_func_rgb='softmax',
                aggr_func_alpha='prod', texture_type='surface',
                max_faces_per_pixel_for_grad=16, grad_mode='topk') -> SoftRasParams:
    """Build params from user-facing arguments (dist_eps is the raw epsilon)."""
    return SoftRasParams(
        image_size=int(image_size),
        background_color=tuple(float(c) for c in background_color),
        near=float(near), far=float(far), eps=float(eps),
        sigma_val=float(sigma_val), dist_func=dist_func,
        dist_eps=float(math.log(1.0 / dist_eps - 1.0)),
        gamma_val=float(gamma_val), aggr_func_rgb=aggr_func_rgb,
        aggr_func_alpha=aggr_func_alpha, texture_type=texture_type,
        fill_back=bool(fill_back), max_faces_id=int(max_faces_per_pixel_for_grad),
        grad_mode=grad_mode,
    )
