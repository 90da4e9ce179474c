"""N3MR rasterizer tests (CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jrender_tpu.ops.n3mr import (rasterize_rgbad, rasterize,
                                  rasterize_silhouettes, rasterize_depth,
                                  N3mrRasterizer, vertices_to_faces)


def tri(z=2.0, reverse=False):
    # n3mr's frontside convention is opposite to softras': it draws this
    # winding as-is (rasterize.py:63 skips when the softras-frontside
    # expression holds)
    fv = np.array([[[-0.7, -0.7, z], [0.7, -0.7, z], [0.0, 0.7, z]]], np.float32)
    if reverse:
        fv = fv[:, ::-1, :]
    return fv[None]  # [1,1,3,3]


class TestForward:
    def test_silhouette(self):
        sil = rasterize_silhouettes(jnp.asarray(tri()), image_size=32,
                                    anti_aliasing=False)
        s = np.asarray(sil)
        assert s.shape == (1, 32, 32)
        assert s[0, 16, 16] == 1.0
        assert s[0, 0, 0] == 0.0
        assert 0.05 < s.mean() < 0.6

    def test_depth(self):
        d = np.asarray(rasterize_depth(jnp.asarray(tri(z=3.0)), image_size=32,
                                       anti_aliasing=False))
        assert abs(d[0, 16, 16] - 3.0) < 1e-4
        assert d[0, 0, 0] == 100.0  # far background

    def test_rgb_flat_texture(self):
        fv = jnp.asarray(tri())
        tex = np.zeros((1, 1, 2, 2, 2, 3), np.float32)
        tex[..., 1] = 0.7  # green
        img = np.asarray(rasterize(fv, jnp.asarray(tex), image_size=32,
                                   anti_aliasing=False))
        assert img.shape == (1, 3, 32, 32)
        np.testing.assert_allclose(img[0, :, 16, 16], [0, 0.7, 0], atol=1e-5)

    def test_depth_ordering(self):
        near_t = tri(z=2.0)
        far_t = tri(z=5.0)
        fv = np.concatenate([far_t, near_t], axis=1)
        tex = np.zeros((1, 2, 2, 2, 2, 3), np.float32)
        tex[0, 0, ..., 2] = 1.0  # far blue
        tex[0, 1, ..., 0] = 1.0  # near red
        img = np.asarray(rasterize(jnp.asarray(fv), jnp.asarray(tex),
                                   image_size=32, anti_aliasing=False))
        np.testing.assert_allclose(img[0, :, 16, 16], [1, 0, 0], atol=1e-5)

    def test_backface_culled(self):
        sil = rasterize_silhouettes(jnp.asarray(tri(reverse=True)),
                                    image_size=32, anti_aliasing=False)
        assert np.asarray(sil).max() == 0.0

    def test_anti_aliasing(self):
        sil = rasterize_silhouettes(jnp.asarray(tri()), image_size=32,
                                    anti_aliasing=True)
        s = np.asarray(sil)
        assert s.shape == (1, 32, 32)
        assert ((s > 0) & (s < 1)).any()  # soft edges from supersampling

    def test_trilinear_matches_tap_sampler(self):
        """The factorized tent-weight fetch must equal the reference-style
        8-tap trilinear sampler (rasterize.py:259-298) bit-for-bit-ish."""
        from jrender_tpu.ops.n3mr import impl
        rng = np.random.RandomState(5)
        F, ts, is_ = 25, 4, 48
        tri = rng.uniform(-0.9, 0.9, size=(F, 3, 2)).astype(np.float32)
        z = rng.uniform(1.5, 3.5, size=(F, 3, 1)).astype(np.float32)
        face = jnp.asarray(np.concatenate([tri, z], -1).reshape(F, 9))
        tex = jnp.asarray(rng.rand(F, ts, ts, ts, 3).astype(np.float32))
        fi, wt, dp, _ = impl.forward_maps_single(face, is_, 0.1, 100.0)
        assert int((fi >= 0).sum()) > 100
        rgb_tap, _, _ = impl.texture_sampling_single(face, tex, fi, wt, dp, 1e-3)
        rgb_new, zc = impl.trilinear_rgb_from_maps(face, tex, fi, wt, dp, 1e-3)
        np.testing.assert_allclose(np.asarray(rgb_new), np.asarray(rgb_tap),
                                   atol=2e-6)
        m = np.asarray(fi) >= 0
        np.testing.assert_allclose(np.asarray(zc)[m],
                                   np.asarray(face)[:, 2::3][np.asarray(fi)[m]],
                                   rtol=1e-6)

    def test_rgbad_dict(self):
        fv = jnp.asarray(tri())
        tex = jnp.ones((1, 1, 2, 2, 2, 3), jnp.float32)
        out = rasterize_rgbad(fv, tex, image_size=16, anti_aliasing=False)
        assert out['rgb'].shape == (1, 3, 16, 16)
        assert out['alpha'].shape == (1, 16, 16)
        assert out['depth'].shape == (1, 16, 16)


class TestBackward:
    def test_silhouette_gradient_nonzero(self):
        fv = jnp.asarray(tri())

        def loss(x):
            sil = rasterize_silhouettes(x, image_size=32, anti_aliasing=False)
            return jnp.sum(sil)

        g = np.asarray(jax.grad(loss)(fv))
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0
        # z never gets silhouette gradients in the reference
        np.testing.assert_array_equal(g[..., 2], 0.0)

    def test_silhouette_gradient_direction(self):
        """Growing the triangle should increase silhouette coverage:
        the NMR gradient of sum(alpha) wrt an outward vertex move must be
        positive along that direction."""
        fv = tri()

        def loss(x):
            return jnp.sum(rasterize_silhouettes(x, image_size=64,
                                                 anti_aliasing=False))

        g = np.asarray(jax.grad(loss)(jnp.asarray(fv)))[0, 0]  # [3,3]
        verts = fv[0, 0]
        centroid = verts[:, :2].mean(0)
        for k in range(3):
            outward = verts[k, :2] - centroid
            outward /= np.linalg.norm(outward)
            assert np.dot(g[k, :2], outward) > 0, (k, g[k], outward)

    def test_texture_gradient(self):
        fv = jnp.asarray(tri())
        tex = jnp.full((1, 1, 2, 2, 2, 3), 0.5)

        def loss(t):
            img = rasterize(fv, t, image_size=32, anti_aliasing=False)
            return jnp.sum(img)

        g = np.asarray(jax.grad(loss)(tex))
        assert np.isfinite(g).all() and g.sum() > 0
        # linearity: gradient equals coverage-weighted sampling weights
        fd = float(loss(tex + 0.01) - loss(tex)) / 0.01
        np.testing.assert_allclose(fd, g.sum(), rtol=1e-2)

    def test_depth_gradient_fd(self):
        """Depth map is smooth in z -> finite differences must match."""
        fv = tri(z=3.0).astype(np.float64)

        def loss(x):
            d = rasterize_depth(jnp.asarray(x, jnp.float32), image_size=16,
                                anti_aliasing=False)
            return float(jnp.sum(jnp.where(d < 99.0, d, 0.0)))

        g = jax.grad(lambda x: jnp.sum(jnp.where(
            rasterize_depth(x, image_size=16, anti_aliasing=False) < 99.0,
            rasterize_depth(x, image_size=16, anti_aliasing=False), 0.0)))(
                jnp.asarray(fv, jnp.float32))
        g = np.asarray(g)
        eps = 1e-3
        for k in range(3):
            fvp = fv.copy()
            fvp[0, 0, k, 2] += eps
            fvm = fv.copy()
            fvm[0, 0, k, 2] -= eps
            fd = (loss(fvp) - loss(fvm)) / (2 * eps)
            np.testing.assert_allclose(g[0, 0, k, 2], fd, rtol=5e-2, atol=1e-3)


class TestBandedBackward:
    """Band-binned edge-gradient backward vs the plane-sweep oracle."""

    def _scene(self, seed=7, F=60, is_=64):
        from jrender_tpu.ops.n3mr import impl
        rng = np.random.RandomState(seed)
        tri = rng.uniform(-0.95, 0.95, size=(F, 3, 2)).astype(np.float32)
        z = rng.uniform(1.2, 4.0, size=(F, 3, 1)).astype(np.float32)
        face = jnp.asarray(np.concatenate([tri, z], -1).reshape(F, 9))
        fi, wt, dp, _ = impl.forward_maps_single(face, is_, 0.1, 100.0)
        alpha = (fi >= 0).astype(jnp.float32)
        tex = jnp.asarray(rng.rand(F, 2, 2, 2, 3).astype(np.float32))
        rgb, _ = impl.trilinear_rgb_from_maps(face, tex, fi, wt, dp, 1e-3)
        ga = jnp.asarray(rng.randn(is_, is_).astype(np.float32))
        gr = jnp.asarray(rng.randn(is_, is_, 3).astype(np.float32))
        return face, fi, rgb, alpha, gr, ga, is_

    @pytest.mark.parametrize('rr,ra', [(True, True), (True, False),
                                       (False, True)])
    def test_parity_vs_oracle(self, rr, ra):
        from jrender_tpu.ops.n3mr import impl, banded_bwd
        face, fi, rgb, alpha, gr, ga, is_ = self._scene()
        ref = np.asarray(impl.backward_pixel_map_single(
            face, fi, rgb, alpha, gr, ga, is_, 1e-3, rr, ra))
        got = np.asarray(banded_bwd.backward_pixel_map_banded(
            face, fi, rgb, alpha, gr, ga, is_, 1e-3, rr, ra)).reshape(ref.shape)
        scale = np.max(np.abs(ref))
        assert scale > 0
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale)

    @pytest.mark.parametrize('rr,ra', [(True, True), (True, False),
                                       (False, True)])
    def test_pallas_kernel_parity(self, rr, ra):
        """The Pallas per-item kernel (TPU path) must match the XLA
        while_loop implementation bit-for-bit-ish (interpret mode here)."""
        from jrender_tpu.ops.n3mr import banded_bwd
        face, fi, rgb, alpha, gr, ga, is_ = self._scene()
        maps = (fi, alpha, ga, rgb, gr)
        for axis in (0, 1):
            ref = np.asarray(banded_bwd._axis_pass(
                face, maps, is_, 1e-3, rr, ra, axis=axis, chunk=128,
                w_cap_mul=4))
            got = np.asarray(banded_bwd._axis_pass_pallas(
                face, maps, is_, 1e-3, rr, ra, axis=axis, chunk=128,
                w_cap_mul=4))
            scale = max(np.max(np.abs(ref)), 1e-6)
            np.testing.assert_allclose(got, ref, atol=2e-5 * scale)

    def test_parity_small_chunk_forces_multi_chunk_bands(self):
        """chunk=16 forces several work items per band (list paging path)."""
        from jrender_tpu.ops.n3mr import impl, banded_bwd
        face, fi, rgb, alpha, gr, ga, is_ = self._scene(seed=3, F=90)
        ref = np.asarray(impl.backward_pixel_map_single(
            face, fi, rgb, alpha, gr, ga, is_, 1e-3, True, True))
        got = np.asarray(banded_bwd.backward_pixel_map_banded(
            face, fi, rgb, alpha, gr, ga, is_, 1e-3, True, True,
            16, 8)).reshape(ref.shape)
        scale = np.max(np.abs(ref))
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


class TestModuleFacade:
    def test_rasterizer_mesh_modes(self):
        from jrender_tpu.structures import Mesh
        verts = np.array([[0.0, 0.7, 2.0], [0.7, -0.7, 2.0], [-0.7, -0.7, 2.0]],
                         np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        mesh = Mesh(verts, faces, texture_res=2, texture_type='surface',
                    dr_type='n3mr')
        r = N3mrRasterizer(image_size=32, anti_aliasing=False)
        sil = r(mesh, 'silhouettes')
        assert np.asarray(sil).max() == 1.0
        rgb = r(mesh, 'rgb')
        assert np.asarray(rgb).shape == (1, 3, 32, 32)
        d = r(mesh, 'depth')
        assert np.asarray(d).min() < 3.0

    def test_renderer_facade_n3mr(self):
        import jrender_tpu as jr
        verts = np.array([[0.0, 0.4, 0.0], [0.4, -0.4, 0.0], [-0.4, -0.4, 0.0]],
                         np.float32)[None]
        faces = np.array([[0, 1, 2]], np.int32)[None]
        mesh = jr.Mesh(verts, faces, texture_res=2, texture_type='surface',
                       dr_type='n3mr')
        renderer = jr.Renderer(dr_type='n3mr', image_size=32, camera_mode='look_at')
        renderer.transform.set_eyes_from_angles(2.732, 0, 0)
        sil = renderer.render_mesh(mesh, mode='silhouettes')
        assert np.asarray(sil).max() > 0.5


class TestPallasMaps:
    """Pallas z-buffer (interpret mode on CPU) vs the XLA scan path."""

    def _random_faces(self, seed, F):
        rng = np.random.RandomState(seed)
        tri = rng.uniform(-0.8, 0.8, size=(1, F, 3, 2)).astype(np.float32)
        ctr = tri.mean(2, keepdims=True)
        tri = ctr + (tri - ctr) * 0.35
        z = rng.uniform(1.5, 3.5, size=(1, F, 3, 1)).astype(np.float32)
        return jnp.asarray(np.concatenate([tri, z], -1).reshape(1, F, 9))

    @pytest.mark.parametrize('seed,F', [(3, 40), (7, 150)])
    def test_maps_parity(self, seed, F):
        import jax
        from jrender_tpu.ops.n3mr import impl
        from jrender_tpu.ops.n3mr.pallas_impl import forward_maps_pallas

        face9 = self._random_faces(seed, F)
        is_ = 64
        fi_p, wt_p, dp_p, finv_p = forward_maps_pallas(face9, is_, 0.1, 100.0)
        fi_j, wt_j, dp_j, finv_j = jax.vmap(
            lambda f: impl.forward_maps_single(f, is_, 0.1, 100.0))(face9)
        cov = int((fi_j >= 0).sum())
        assert cov > 50
        # identical winner everywhere (deterministic lowest-index ties)
        np.testing.assert_array_equal(np.asarray(fi_p), np.asarray(fi_j))
        m = np.asarray(fi_j >= 0)
        np.testing.assert_allclose(np.asarray(dp_p)[m], np.asarray(dp_j)[m],
                                   rtol=0, atol=1e-4)
        # FMA-contraction differences between the two compiled graphs
        # bound per-pixel weight agreement
        np.testing.assert_allclose(np.asarray(wt_p), np.asarray(wt_j), atol=5e-4)
        np.testing.assert_allclose(np.asarray(finv_p), np.asarray(finv_j),
                                   atol=1e-3)

    def test_rasterize_rgbad_backend_parity(self):
        from jrender_tpu.ops.n3mr import api

        face9 = self._random_faces(11, 60).reshape(1, 60, 3, 3)
        rng = np.random.RandomState(1)
        tex = jnp.asarray(rng.rand(1, 60, 2, 2, 2, 3).astype(np.float32))
        outs = {}
        for be in ('pallas', 'jax'):
            api.set_backend(be)
            try:
                outs[be] = api.rasterize_rgbad(face9, tex, image_size=64,
                                               anti_aliasing=False)
            finally:
                api.set_backend('auto')
        for k in ('rgb', 'alpha', 'depth'):
            np.testing.assert_allclose(np.asarray(outs['pallas'][k]),
                                       np.asarray(outs['jax'][k]), atol=1e-4)


def test_backward_textures_pallas_parity():
    """The tiled winner-onehot texture backward must match the XLA
    segment-sum reference exactly (interpret mode on CPU)."""
    from jrender_tpu.ops.n3mr import api, impl, pallas_impl
    rng = np.random.RandomState(3)
    F, is_ = 24, 64
    cen = rng.uniform(-0.6, 0.6, (F, 1, 2))
    off = rng.uniform(-0.3, 0.3, (F, 3, 2))
    z = 3.0 + rng.uniform(-0.5, 0.5, (F, 3, 1))
    face = np.concatenate([cen + off, z], -1).astype(np.float32) \
        .reshape(1, F, 9)
    tex = rng.uniform(size=(1, F, 2, 2, 2, 3)).astype(np.float32)
    p = api.N3mrParams(image_size=is_, near=0.1, far=100.0, eps=1e-4,
                       background_color=(0., 0., 0.), return_rgb=True,
                       return_alpha=True, return_depth=True)
    out, m = api._forward(jnp.asarray(face).reshape(1, F, 3, 3),
                          jnp.asarray(tex), p)
    g_rgb = jnp.asarray(rng.randn(1, is_, is_, 3).astype(np.float32))
    ref = jax.vmap(lambda fi, wt, dpv, zc, gr: impl.backward_textures_single(
        tex.shape[1:], fi, wt, dpv, zc, gr, p.eps))(
        m.face_index, m.weight, m.depth, m.zcorn, g_rgb)
    got = pallas_impl.backward_textures_pallas(
        jnp.asarray(face), m.face_index, m.weight, m.depth,
        tuple(tex.shape[1:]), is_, p.eps, zcorn=m.zcorn, grad_rgb=g_rgb)
    scale = max(float(jnp.abs(ref).max()), 1e-9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5 * scale)
