"""Texture with UV query cache, mipmaps, and summed-area tables.

Reference: jrender/Scene/textures/texture.py (sample2D sampler :33,
mipmap :82-102, SAT :115-139 — numba float64 prefix-scan replaced by a
jnp.cumsum SAT; on TPU this runs in f32).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops.image import sample2D, generate_SAT


class Texture:
    def __init__(self, image=None, uv=None, sampler=sample2D):
        self._image = None
        self.height = None
        self.width = None
        self._channel = None
        if image is not None:
            self.image = image
        self._uv = uv
        self._query_uv = None
        self.query_uv_update = True
        self.sampler = sampler
        self._mipmap = None
        self.mipmap_update = True

    @property
    def query_uv(self):
        if self._uv is None:
            raise ValueError('The texture has not been attached to uvs')
        if self.query_uv_update:
            self._query_uv = self.sampler(self.image, self._uv, default=99999)
            self.query_uv_update = False
        return self._query_uv

    @property
    def uv(self):
        return self._uv

    @uv.setter
    def uv(self, _uv):
        self._uv = _uv
        self.update()

    @property
    def image(self):
        return self._image

    @image.setter
    def image(self, image):
        self._image = jnp.asarray(image, jnp.float32)
        self._channel = 1 if self._image.ndim == 2 else self._image.shape[2]
        self.height = self._image.shape[0]
        self.width = self._image.shape[1]
        self.update()

    @property
    def channel(self):
        return self._channel

    def update(self):
        self.query_uv_update = True
        self.mipmap_update = True

    @classmethod
    def generate_mipmap(cls, image):
        """Flat mipmap pyramid + level offsets (texture.py:82-102)."""
        from PIL import Image as PILImage
        image = np.asarray(image, np.float32)
        height, width = image.shape[0], image.shape[1]
        max_level = math.floor(math.log2(min(height, width)))
        level = 0
        mipmap = image.reshape(1, width * height)
        index = [0, width * height]
        cur = image
        while level < max_level:
            width = int(round(width / 2))
            height = int(round(height / 2))
            im = PILImage.fromarray(cur.astype(np.float32), mode='F')
            cur = np.asarray(im.resize((width, height), PILImage.BILINEAR))
            mipmap = np.concatenate([mipmap, cur.reshape(1, width * height)], 1)
            index.append(index[level + 1] + width * height)
            level += 1
        return jnp.asarray(mipmap), jnp.asarray(index, jnp.int32)

    @classmethod
    def from_path(cls, path):
        if path is None:
            return None
        import imageio.v2 as imageio
        image = np.asarray(imageio.imread(path)).astype(np.float32) / 255.0
        if image.ndim == 3 and image.shape[2] == 4:
            image = image[..., :3]
        return cls(image)

    @classmethod
    def generate_SAT(cls, image):
        """SAT matching the reference's zero-padded layout then cropped
        back (texture.py:128-139): SAT[y,x] = sum of image[:y+1,:x+1]."""
        return generate_SAT(jnp.asarray(image))
