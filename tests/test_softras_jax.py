"""SoftRas pure-JAX implementation tests: forward behaviour + gradient
parity with the reference's analytic backward, validated by float64
finite differences on configurations where the reference gradient is
exact (see comments)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jrender_tpu.ops.softras import jax_impl, make_params
from jrender_tpu.ops.softras.api import soft_rasterize

from conftest import make_random_mesh


def big_triangle(z=5.0):
    fv = np.array([[[-0.9, -0.9, z], [0.9, -0.9, z], [0.0, 0.9, z]]], np.float32)
    return fv[None]  # [1,1,3,3]


def render(fv, tex, **kw):
    defaults = dict(image_size=32, sigma_val=1e-4, gamma_val=1e-4, backend='jax')
    defaults.update(kw)
    return np.asarray(soft_rasterize(jnp.asarray(fv), jnp.asarray(tex), **defaults))


class TestForward:
    def test_triangle_coverage_alpha(self):
        fv = big_triangle()
        tex = np.ones((1, 1, 1, 3), np.float32)
        img = render(fv, tex, aggr_func_alpha='prod')
        alpha = img[0, 3]
        # center pixel covered, corners not
        assert alpha[16, 16] > 0.99
        assert alpha[0, 0] < 0.01
        assert alpha[0, 31] < 0.01

    def test_rgb_softmax_picks_texture_color(self):
        fv = big_triangle()
        tex = np.zeros((1, 1, 1, 3), np.float32)
        tex[..., 0] = 0.8  # red
        img = render(fv, tex)
        np.testing.assert_allclose(img[0, :3, 16, 16], [0.8, 0.0, 0.0], atol=1e-3)

    def test_background_color(self):
        fv = big_triangle()
        tex = np.ones((1, 1, 1, 3), np.float32)
        img = render(fv, tex, background_color=(0.1, 0.2, 0.3))
        np.testing.assert_allclose(img[0, :3, 0, 0], [0.1, 0.2, 0.3], atol=1e-3)

    def test_depth_ordering_softmax(self):
        # near red triangle in front of far green triangle
        near_t = big_triangle(z=3.0)
        far_t = big_triangle(z=10.0)
        fv = np.concatenate([near_t, far_t], axis=1)
        tex = np.zeros((1, 2, 1, 3), np.float32)
        tex[0, 0, 0, 0] = 1.0  # red near
        tex[0, 1, 0, 1] = 1.0  # green far
        img = render(fv, tex)
        assert img[0, 0, 16, 16] > 0.95
        assert img[0, 1, 16, 16] < 0.05

    def test_depth_ordering_hard(self):
        near_t = big_triangle(z=3.0)
        far_t = big_triangle(z=10.0)
        fv = np.concatenate([far_t, near_t], axis=1)  # far first
        tex = np.zeros((1, 2, 1, 3), np.float32)
        tex[0, 0, 0, 1] = 1.0
        tex[0, 1, 0, 0] = 1.0  # near is red
        img = render(fv, tex, aggr_func_rgb='hard', dist_func='hard',
                     aggr_func_alpha='hard')
        np.testing.assert_allclose(img[0, :3, 16, 16], [1, 0, 0], atol=1e-5)
        assert img[0, 3, 16, 16] == 1.0

    def test_backface_culling(self):
        # big_triangle's winding is backfacing under the reference's
        # screen-space convention (check_face_frontside, y axis flipped);
        # with fill_back=False it must be culled from rgb but still
        # aggregate into alpha (soft_rasterize.py:349-358 runs before the
        # frontside check).
        fv = big_triangle()
        tex = np.ones((1, 1, 1, 3), np.float32)
        img = render(fv, tex, fill_back=False, background_color=(0.0, 0.0, 0.0))
        assert img[0, 0, 16, 16] < 0.01  # rgb empty
        assert img[0, 3, 16, 16] > 0.99  # alpha still aggregates
        # reversed winding is frontfacing -> renders
        img2 = render(fv[:, :, ::-1, :], tex, fill_back=False)
        assert img2[0, 0, 16, 16] > 0.9

    def test_vertex_texture_interpolation(self):
        fv = big_triangle()
        tex = np.zeros((1, 1, 3, 3), np.float32)
        tex[0, 0, 0, 0] = 1.0
        tex[0, 0, 1, 1] = 1.0
        tex[0, 0, 2, 2] = 1.0
        img = render(fv, tex, texture_type='vertex')
        c = img[0, :3, 16, 16]
        # center pixel blends all three corners; all channels positive, sum ~1
        assert (c > 0.05).all()
        np.testing.assert_allclose(c.sum(), 1.0, atol=0.05)

    def test_random_mesh_finite(self, rng):
        fv = make_random_mesh(rng, num_faces=20)
        tex = rng.uniform(size=(1, 20, 4, 3)).astype(np.float32)
        img = render(fv, tex, sigma_val=1e-3)
        assert np.isfinite(img).all()
        assert (img[0, 3] >= 0).all() and (img[0, 3] <= 1 + 1e-6).all()

    def test_sum_alpha(self):
        fv = big_triangle()
        tex = np.ones((1, 1, 1, 3), np.float32)
        img = render(fv, tex, aggr_func_alpha='sum')
        assert abs(img[0, 3, 16, 16] - 1.0) < 0.01  # single face / nf=1


def _fd_check(f, x, g_analytic, eps, rtol, atol, rng, n_dirs=6):
    """Directional finite-difference check in float64."""
    for _ in range(n_dirs):
        d = rng.randn(*x.shape)
        d /= np.linalg.norm(d)
        fp = f(x + eps * d)
        fm = f(x - eps * d)
        fd = (fp - fm) / (2 * eps)
        an = float(np.sum(g_analytic * d))
        np.testing.assert_allclose(an, fd, rtol=rtol, atol=atol)


@pytest.mark.parametrize('dist_func', ['euclidean', 'barycentric'])
@pytest.mark.parametrize('alpha_func', ['prod', 'sum'])
class TestGradSilhouette:
    """Alpha-channel gradients are exact in the reference formulation:
    the chain alpha -> sigmoid -> distance -> vertices is fully analytic."""

    def test_alpha_grad_matches_fd(self, dist_func, alpha_func, rng):
        jax.config.update('jax_enable_x64', True)
        try:
            p = make_params(image_size=24, sigma_val=3e-3, gamma_val=1e-2,
                            dist_func=dist_func, aggr_func_alpha=alpha_func,
                            fill_back=True)
            fv = make_random_mesh(rng, num_faces=6).astype(np.float64).reshape(1, 6, 9)
            tex = rng.uniform(size=(1, 6, 1, 3))
            R = rng.randn(24, 24)

            def loss_np(x):
                out, _, _ = jax_impl.soft_rasterize_fwd_jax(
                    jnp.asarray(x), jnp.asarray(tex), p)
                return float(jnp.sum(out[0, 3] * R))

            out, aggrs, fid = jax_impl.soft_rasterize_fwd_jax(
                jnp.asarray(fv), jnp.asarray(tex), p)
            g = np.zeros((1, 4, 24, 24))
            g[0, 3] = R
            gf, gt = jax_impl.soft_rasterize_bwd_jax(
                jnp.asarray(fv), jnp.asarray(tex), out, aggrs, fid,
                jnp.asarray(g), p)
            # alpha channel only: rgb-softmax z-grads are in gf too, but the
            # loss above only reads alpha, so compare against alpha part only.
            _fd_check(loss_np, fv, np.asarray(gf), eps=1e-6, rtol=2e-4,
                      atol=1e-8, rng=rng)
        finally:
            jax.config.update('jax_enable_x64', False)


class TestGradRGB:
    def test_texture_grad_exact(self, rng):
        """Surface-texture gradients are exact (linear in texture)."""
        jax.config.update('jax_enable_x64', True)
        try:
            p = make_params(image_size=24, sigma_val=3e-3, gamma_val=1e-2)
            fv = make_random_mesh(rng, num_faces=6).astype(np.float64).reshape(1, 6, 9)
            tex = rng.uniform(size=(1, 6, 4, 3))
            R = rng.randn(3, 24, 24)

            def loss_np(t):
                out, _, _ = jax_impl.soft_rasterize_fwd_jax(
                    jnp.asarray(fv), jnp.asarray(t), p)
                return float(jnp.sum(out[0, :3] * R))

            out, aggrs, fid = jax_impl.soft_rasterize_fwd_jax(
                jnp.asarray(fv), jnp.asarray(tex), p)
            g = np.zeros((1, 4, 24, 24))
            g[0, :3] = R
            gf, gt = jax_impl.soft_rasterize_bwd_jax(
                jnp.asarray(fv), jnp.asarray(tex), out, aggrs, fid,
                jnp.asarray(g), p)
            _fd_check(loss_np, tex, np.asarray(gt), eps=1e-6, rtol=1e-5,
                      atol=1e-10, rng=rng)
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_vertex_grad_flat_constant_color(self, rng):
        """With per-face constant vertex colors and flat (constant-z) faces,
        every term the reference backward drops vanishes, so the analytic
        gradient must match finite differences tightly."""
        jax.config.update('jax_enable_x64', True)
        try:
            p = make_params(image_size=24, sigma_val=3e-3, gamma_val=3e-2,
                            texture_type='vertex')
            nf = 5
            fv = make_random_mesh(rng, num_faces=nf).astype(np.float64)
            fv[..., 2] = np.floor(fv[..., 2] * 0 + 2.0 + np.arange(nf)[None, :, None] * 0.5)
            fv = fv.reshape(1, nf, 9)
            col = rng.uniform(size=(1, nf, 1, 3))
            tex = np.repeat(col, 3, axis=2)  # same color at each corner
            R = rng.randn(3, 24, 24)

            def loss_np(x):
                out, _, _ = jax_impl.soft_rasterize_fwd_jax(
                    jnp.asarray(x), jnp.asarray(tex), p)
                return float(jnp.sum(out[0, :3] * R))

            out, aggrs, fid = jax_impl.soft_rasterize_fwd_jax(
                jnp.asarray(fv), jnp.asarray(tex), p)
            g = np.zeros((1, 4, 24, 24))
            g[0, :3] = R
            gf, gt = jax_impl.soft_rasterize_bwd_jax(
                jnp.asarray(fv), jnp.asarray(tex), out, aggrs, fid,
                jnp.asarray(g), p)
            # xy-gradients: exact; z-gradients: exact given constant colors.
            gf_np = np.asarray(gf).reshape(1, nf, 3, 3)
            xy_mask = np.zeros((1, nf, 3, 3))
            xy_mask[..., :2] = 1.0

            def loss_xy(x):
                return loss_np((fv.reshape(1, nf, 3, 3) * (1 - xy_mask) +
                                x * xy_mask).reshape(1, nf, 9))

            _fd_check(lambda x: loss_np(x.reshape(1, nf, 9)),
                      fv.reshape(1, nf, 3, 3),
                      gf_np, eps=1e-6, rtol=5e-4, atol=1e-8, rng=rng)
        finally:
            jax.config.update('jax_enable_x64', False)


class TestCustomVJP:
    def test_custom_vjp_wires_through(self, rng):
        fv = make_random_mesh(rng, num_faces=4).reshape(1, 4, 9).astype(np.float32)
        tex = rng.uniform(size=(1, 4, 1, 3)).astype(np.float32)

        def loss(x, t):
            img = soft_rasterize(x, t, image_size=16, sigma_val=1e-3,
                                 backend='jax')
            return jnp.sum(img[:, 3] ** 2) + jnp.sum(img[:, :3] ** 2)

        gf, gt = jax.grad(loss, argnums=(0, 1))(jnp.asarray(fv), jnp.asarray(tex))
        assert np.isfinite(np.asarray(gf)).all()
        assert np.isfinite(np.asarray(gt)).all()
        assert np.abs(np.asarray(gf)).sum() > 0
        assert np.abs(np.asarray(gt)).sum() > 0

    def test_jit_compiles(self, rng):
        fv = make_random_mesh(rng, num_faces=4).reshape(1, 4, 9).astype(np.float32)
        tex = rng.uniform(size=(1, 4, 1, 3)).astype(np.float32)
        f = jax.jit(lambda x, t: soft_rasterize(x, t, image_size=16, backend='jax'))
        out = f(jnp.asarray(fv), jnp.asarray(tex))
        assert out.shape == (1, 4, 16, 16)
