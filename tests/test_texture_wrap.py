"""N3MR texture-bake wrap modes (reference load_textures.py:103-247).

The reference resolves wrap BEFORE the barycentric mix of the three UV
corners; CLAMP_TO_BORDER zeroes every updated texel unconditionally
(reference kernel `texture_[k] = 0` whenever wrapping==CLAMP_TO_BORDER,
load_textures.py:189-199,206-211 — matched for parity, quirk included).
"""
import numpy as np
import jax.numpy as jnp

from jrender_tpu.ops.texture import (WRAPPING, _wrap_uv, load_textures_n3mr)


class TestWrapUV:
    def test_repeat(self):
        uv = jnp.asarray([[-0.25, 1.25], [0.5, 2.0]])
        out = np.asarray(_wrap_uv(uv, WRAPPING['REPEAT']))
        np.testing.assert_allclose(out, [[0.75, 0.25], [0.5, 0.0]],
                                   atol=1e-6)

    def test_mirrored_repeat(self):
        uv = jnp.asarray([[1.25, -0.25], [0.5, 2.75]])
        out = np.asarray(_wrap_uv(uv, WRAPPING['MIRRORED_REPEAT']))
        # 1.25: mod2=1.25 >= 1 -> 1 - mod1(1.25) = 0.75
        # -0.25: mod2=1.75 >= 1 -> 1 - mod1(-0.25) = 1 - 0.75 = 0.25
        # (the reference's mod() maps negatives to [0,y); matched)
        np.testing.assert_allclose(out, [[0.75, 0.25], [0.5, 0.75]],
                                   atol=1e-6)

    def test_clamp_to_edge(self):
        uv = jnp.asarray([[-0.5, 1.5], [0.25, 0.75]])
        out = np.asarray(_wrap_uv(uv, WRAPPING['CLAMP_TO_EDGE']))
        np.testing.assert_allclose(out, [[0.0, 1.0], [0.25, 0.75]],
                                   atol=1e-6)


class TestLoadTexturesN3MR:
    def _bake(self, mode, uv_shift=0.0, use_bilinear=True):
        H = W = 8
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
        image = jnp.asarray(np.stack(
            [xs / (W - 1), ys / (H - 1), np.ones_like(xs)], -1
        ).astype(np.float32))
        uv = jnp.asarray(np.array(
            [[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]], np.float32)) + uv_shift
        ts = 2
        tex0 = jnp.full((1, ts, ts, ts, 3), -1.0, jnp.float32)
        upd = jnp.asarray([1], jnp.int32)
        return np.asarray(load_textures_n3mr(
            image, uv, tex0, upd, WRAPPING[mode], use_bilinear))

    def test_in_range_fetch(self):
        # CLAMP_TO_EDGE keeps uv=1.0 at 1.0 (REPEAT would wrap it to 0)
        out = self._bake('CLAMP_TO_EDGE')
        assert out.min() >= 0.0            # all texels updated
        # texel (dim0=0,dim1=0,dim2=1) -> uv corner 2 = (0,1): red=0, green=1
        np.testing.assert_allclose(out[0, 0, 0, 1], [0.0, 1.0, 1.0],
                                   atol=1e-5)

    def test_repeat_wraps_shifted_uv(self):
        base = self._bake('REPEAT')
        shifted = self._bake('REPEAT', uv_shift=1.0)   # uv+1 wraps to uv
        # corner texels (pure single-corner weights) must agree; REPEAT
        # maps 1.0 -> 0.0 so the corner at uv=(1,0) moves — compare the
        # origin corner texel which maps 1.0+0 -> 0 either way
        np.testing.assert_allclose(shifted[0, 0, 0, 1], base[0, 0, 0, 1],
                                   atol=1e-5)

    def test_clamp_to_border_zeroes(self):
        out = self._bake('CLAMP_TO_BORDER')
        np.testing.assert_allclose(out, 0.0, atol=0)

    def test_no_update_keeps_old(self):
        image = jnp.ones((4, 4, 3), jnp.float32)
        uv = jnp.zeros((2, 3, 2), jnp.float32)
        tex0 = jnp.full((2, 2, 2, 2, 3), 0.5, jnp.float32)
        upd = jnp.asarray([1, 0], jnp.int32)
        out = np.asarray(load_textures_n3mr(image, uv, tex0, upd,
                                            WRAPPING['REPEAT'], True))
        np.testing.assert_allclose(out[0], 1.0)
        np.testing.assert_allclose(out[1], 0.5)

    def test_nearest_mode(self):
        out = self._bake('CLAMP_TO_EDGE', use_bilinear=False)
        assert np.isfinite(out).all()
