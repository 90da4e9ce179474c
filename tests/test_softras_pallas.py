"""Pallas kernel parity vs the jnp oracle (interpret mode on CPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

from jrender_tpu.ops.softras import (jax_impl, pallas_impl, pxg_impl,
                                     pxt_impl, make_params)

from conftest import make_random_mesh


def _run_both(fv, tex, p):
    out_j, ag_j, _ = jax_impl.soft_rasterize_fwd_jax(jnp.asarray(fv), jnp.asarray(tex), p)
    out_p, ag_p, _ = pallas_impl.soft_rasterize_fwd_pallas(jnp.asarray(fv), jnp.asarray(tex), p)
    return np.asarray(out_j), np.asarray(out_p), np.asarray(ag_j), np.asarray(ag_p)


def assert_images_close(a, b, atol=2e-5, boundary_frac=0.01):
    """Images must agree except at texel-selector discontinuities.

    The surface-texture texel index is a discontinuous function of the
    clipped barycentrics; FMA contraction differences between the XLA and
    Pallas pipelines can flip the choice exactly at texel boundaries
    (verified: every mismatching pixel sits on a boundary).  So: tight
    agreement for the vast majority, bounded fraction of flips."""
    diff = np.abs(a - b)
    frac = (diff > atol).mean()
    assert frac <= boundary_frac, f'mismatch fraction {frac:.4f} (max {diff.max():.4f})'


@pytest.mark.parametrize('dist_func', ['euclidean', 'barycentric', 'hard'])
def test_fwd_parity_dist(dist_func, rng):
    p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3, dist_func=dist_func)
    fv = make_random_mesh(rng, num_faces=40).reshape(1, 40, 9)
    tex = rng.uniform(size=(1, 40, 4, 3)).astype(np.float32)
    oj, op, aj, ap = _run_both(fv, tex, p)
    assert_images_close(op, oj)
    # alpha and the softmax denominators are smooth -> must agree tightly
    np.testing.assert_allclose(op[:, 3], oj[:, 3], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(ap, aj, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize('alpha_func', ['prod', 'sum', 'hard'])
def test_fwd_parity_alpha(alpha_func, rng):
    p = make_params(image_size=32, sigma_val=1e-3, aggr_func_alpha=alpha_func)
    fv = make_random_mesh(rng, num_faces=24).reshape(1, 24, 9)
    tex = rng.uniform(size=(1, 24, 4, 3)).astype(np.float32)
    oj, op, _, _ = _run_both(fv, tex, p)
    np.testing.assert_allclose(op[:, 3], oj[:, 3], atol=2e-5, rtol=1e-4)


def test_fwd_parity_hard_rgb(rng):
    p = make_params(image_size=32, dist_func='hard', aggr_func_rgb='hard',
                    aggr_func_alpha='hard')
    fv = make_random_mesh(rng, num_faces=24).reshape(1, 24, 9)
    tex = rng.uniform(size=(1, 24, 4, 3)).astype(np.float32)
    oj, op, aj, ap = _run_both(fv, tex, p)
    assert_images_close(op, oj)
    # aggrs: depth_min and face_index_min must agree exactly
    np.testing.assert_allclose(ap[:, 0], aj[:, 0], atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(ap[:, 1], aj[:, 1])


def test_fwd_parity_vertex_texture(rng):
    p = make_params(image_size=32, sigma_val=1e-3, texture_type='vertex')
    fv = make_random_mesh(rng, num_faces=24).reshape(1, 24, 9)
    tex = rng.uniform(size=(1, 24, 3, 3)).astype(np.float32)
    oj, op, _, _ = _run_both(fv, tex, p)
    assert_images_close(op, oj)


def test_fwd_parity_batched(rng):
    p = make_params(image_size=32, sigma_val=1e-3)
    fv = np.concatenate([make_random_mesh(rng, num_faces=16) for _ in range(2)], 0)
    tex = rng.uniform(size=(2, 16, 4, 3)).astype(np.float32)
    oj, op, _, _ = _run_both(fv.reshape(2, 16, 9), tex, p)
    assert_images_close(op, oj)


def test_fwd_parity_background(rng):
    p = make_params(image_size=32, sigma_val=1e-3, background_color=(0.2, 0.4, 0.6))
    fv = make_random_mesh(rng, num_faces=8).reshape(1, 8, 9)
    tex = rng.uniform(size=(1, 8, 4, 3)).astype(np.float32)
    oj, op, _, _ = _run_both(fv, tex, p)
    assert_images_close(op, oj)


def test_binning_lists_cover_bbox(rng):
    from jrender_tpu.ops.softras.binning import build_tile_lists
    fv = make_random_mesh(rng, num_faces=32).reshape(1, 32, 9)
    p = make_params(image_size=64, sigma_val=1e-3)
    lists = build_tile_lists(jnp.asarray(fv), 64, 16, 32, cap=32, threshold=p.threshold)
    ids = np.asarray(lists.ids)
    assert ids.shape == (1, (64 // 16) * (64 // 32), 32)
    # every face appears in at least one tile (faces are on-screen)
    seen = set(ids[ids >= 0].tolist())
    assert seen == set(range(32))


class TestBackwardParity:
    def _grads_both(self, fv, tex, p_jax, p_pal, rng):
        import jax
        g = rng.randn(1, 4, p_jax.image_size, p_jax.image_size).astype(np.float32)
        out_j, ag_j, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p_jax)
        gf_j, gt_j = jax_impl.soft_rasterize_bwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), out_j, ag_j, fid_j, jnp.asarray(g), p_jax)
        out_p, ag_p, ids = pallas_impl.soft_rasterize_fwd_pallas(
            jnp.asarray(fv), jnp.asarray(tex), p_pal)
        gf_p, gt_p = pallas_impl.soft_rasterize_bwd_pallas(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, ids, jnp.asarray(g), p_pal)
        return map(np.asarray, (gf_j, gt_j, gf_p, gt_p))

    @pytest.mark.parametrize('dist_func', ['euclidean', 'barycentric'])
    def test_bwd_parity_T1(self, dist_func, rng):
        """texture_res=1: no texel-selection discontinuity -> gradients of
        the full geometry chain must match the oracle tightly."""
        F = 24
        # jnp path with K=F == untruncated gradient, same as pallas semantics
        p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                        dist_func=dist_func, max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 1, 3)).astype(np.float32)
        gf_j, gt_j, gf_p, gt_p = self._grads_both(fv, tex, p, p, rng)
        scale = np.abs(gf_j).max()
        np.testing.assert_allclose(gf_p, gf_j, atol=2e-3 * scale, rtol=2e-3)
        tscale = max(np.abs(gt_j).max(), 1e-6)
        np.testing.assert_allclose(gt_p, gt_j, atol=2e-3 * tscale, rtol=2e-3)

    def test_bwd_parity_T4_statistical(self, rng):
        """R=2 textures: texel-boundary flips move gradient mass between
        adjacent texels; demand agreement except a bounded fraction."""
        rng = np.random.RandomState(7)  # deterministic regardless of test order
        F = 24
        p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                        max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        gf_j, gt_j, gf_p, gt_p = self._grads_both(fv, tex, p, p, rng)
        scale = np.abs(gf_j).max()
        assert (np.abs(gf_p - gf_j) > 2e-3 * scale).mean() < 0.08
        # per-face texture-gradient *totals* are flip-invariant
        np.testing.assert_allclose(gt_p.sum(axis=2), gt_j.sum(axis=2),
                                   atol=2e-3 * max(np.abs(gt_j).max(), 1e-6), rtol=2e-3)

    def test_bwd_parity_vertex(self, rng):
        F = 16
        p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                        texture_type='vertex', max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 3, 3)).astype(np.float32)
        gf_j, gt_j, gf_p, gt_p = self._grads_both(fv, tex, p, p, rng)
        scale = np.abs(gf_j).max()
        np.testing.assert_allclose(gf_p, gf_j, atol=2e-3 * scale, rtol=2e-3)
        tscale = max(np.abs(gt_j).max(), 1e-6)
        np.testing.assert_allclose(gt_p, gt_j, atol=2e-3 * tscale, rtol=2e-3)

    def test_bwd_parity_hard_rgb(self, rng):
        F = 16
        p = make_params(image_size=32, dist_func='hard', aggr_func_rgb='hard',
                        aggr_func_alpha='hard', max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        gf_j, gt_j, gf_p, gt_p = self._grads_both(fv, tex, p, p, rng)
        np.testing.assert_allclose(gf_p, gf_j, atol=1e-5)
        tscale = max(np.abs(gt_j).max(), 1e-6)
        np.testing.assert_allclose(gt_p, gt_j, atol=2e-3 * tscale, rtol=2e-3)


class TestPxFParity:
    """Production px_f layout vs the jnp oracle — full config sweep at two
    tile sizes (32 -> 32/16-px tiles, 24 -> 8-px tiles)."""

    def _run_pf(self, fv, tex, p):
        out_j, ag_j, _ = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        out_p, ag_p, cnt = pallas_impl.soft_rasterize_fwd_pallas_pf(
            jnp.asarray(fv), jnp.asarray(tex), p)
        return (np.asarray(out_j), np.asarray(out_p), np.asarray(ag_j),
                np.asarray(ag_p), cnt)

    @pytest.mark.parametrize('is_', [32, 24])
    @pytest.mark.parametrize('dist_func', ['euclidean', 'barycentric', 'hard'])
    def test_fwd_parity_dist(self, dist_func, is_, rng):
        p = make_params(image_size=is_, sigma_val=1e-3, gamma_val=1e-3,
                        dist_func=dist_func)
        fv = make_random_mesh(rng, num_faces=40).reshape(1, 40, 9)
        tex = rng.uniform(size=(1, 40, 4, 3)).astype(np.float32)
        oj, op, aj, ap, _ = self._run_pf(fv, tex, p)
        assert_images_close(op, oj)
        # alpha tolerance: the pf kernel reduces the (1-sf) product as a
        # pairwise tree (vs the oracle's sequential product) -> f32
        # reassociation drift up to ~2e-4 over 40 mid-range factors
        np.testing.assert_allclose(op[:, 3], oj[:, 3], atol=5e-4, rtol=1e-4)
        np.testing.assert_allclose(ap, aj, atol=5e-4, rtol=1e-4)

    @pytest.mark.parametrize('alpha_func', ['prod', 'sum', 'hard'])
    def test_fwd_parity_alpha(self, alpha_func, rng):
        p = make_params(image_size=32, sigma_val=1e-3,
                        aggr_func_alpha=alpha_func)
        fv = make_random_mesh(rng, num_faces=24).reshape(1, 24, 9)
        tex = rng.uniform(size=(1, 24, 4, 3)).astype(np.float32)
        oj, op, _, _, _ = self._run_pf(fv, tex, p)
        np.testing.assert_allclose(op[:, 3], oj[:, 3], atol=5e-4, rtol=1e-4)

    def test_fwd_parity_hard_rgb(self, rng):
        p = make_params(image_size=32, dist_func='hard', aggr_func_rgb='hard',
                        aggr_func_alpha='hard')
        fv = make_random_mesh(rng, num_faces=24).reshape(1, 24, 9)
        tex = rng.uniform(size=(1, 24, 4, 3)).astype(np.float32)
        oj, op, aj, ap, _ = self._run_pf(fv, tex, p)
        assert_images_close(op, oj)
        np.testing.assert_allclose(ap[:, 0], aj[:, 0], atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(ap[:, 1], aj[:, 1])

    def test_fwd_parity_vertex_texture(self, rng):
        p = make_params(image_size=32, sigma_val=1e-3, texture_type='vertex')
        fv = make_random_mesh(rng, num_faces=24).reshape(1, 24, 9)
        tex = rng.uniform(size=(1, 24, 3, 3)).astype(np.float32)
        oj, op, _, _, _ = self._run_pf(fv, tex, p)
        assert_images_close(op, oj)

    def test_candidate_count_matches_oracle(self, rng):
        """The forward's cnt output must equal the oracle's per-pixel
        number of valid faces_id entries (when F <= K none are cut)."""
        F = 24
        p = make_params(image_size=32, sigma_val=1e-3,
                        max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        _, _, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        _, _, aux = pallas_impl.soft_rasterize_fwd_pallas_pf(
            jnp.asarray(fv), jnp.asarray(tex), p)
        np.testing.assert_array_equal(np.asarray(aux[0, 0]),
                                      np.asarray((fid_j[0] >= 0).sum(0)))

    def _grads_both_pf(self, fv, tex, p, rng, is_=32):
        g = rng.randn(1, 4, is_, is_).astype(np.float32)
        out_j, ag_j, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        gf_j, gt_j = jax_impl.soft_rasterize_bwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), out_j, ag_j, fid_j,
            jnp.asarray(g), p)
        with_thr = p.grad_mode == 'topk' and p.max_faces_id < fv.shape[1]
        out_p, ag_p, aux = pallas_impl.soft_rasterize_fwd_pallas_pf(
            jnp.asarray(fv), jnp.asarray(tex), p, with_thr)
        gf_p, gt_p = pallas_impl.soft_rasterize_bwd_pallas_pf(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
            jnp.asarray(g), p)
        return map(np.asarray, (gf_j, gt_j, gf_p, gt_p))

    @pytest.mark.parametrize('is_', [32, 24])
    @pytest.mark.parametrize('dist_func', ['euclidean', 'barycentric'])
    def test_bwd_parity_T1(self, dist_func, is_, rng):
        F = 24
        p = make_params(image_size=is_, sigma_val=1e-3, gamma_val=1e-3,
                        dist_func=dist_func, max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 1, 3)).astype(np.float32)
        gf_j, gt_j, gf_p, gt_p = self._grads_both_pf(fv, tex, p, rng, is_)
        scale = np.abs(gf_j).max()
        np.testing.assert_allclose(gf_p, gf_j, atol=2e-3 * scale, rtol=2e-3)
        tscale = max(np.abs(gt_j).max(), 1e-6)
        np.testing.assert_allclose(gt_p, gt_j, atol=2e-3 * tscale, rtol=2e-3)

    def test_bwd_parity_T4_statistical(self, rng):
        rng = np.random.RandomState(7)
        F = 24
        p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                        max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        gf_j, gt_j, gf_p, gt_p = self._grads_both_pf(fv, tex, p, rng)
        scale = np.abs(gf_j).max()
        assert (np.abs(gf_p - gf_j) > 2e-3 * scale).mean() < 0.08
        np.testing.assert_allclose(
            gt_p.sum(axis=2), gt_j.sum(axis=2),
            atol=2e-3 * max(np.abs(gt_j).max(), 1e-6), rtol=2e-3)

    def test_bwd_parity_vertex(self, rng):
        F = 16
        p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                        texture_type='vertex', max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 3, 3)).astype(np.float32)
        gf_j, gt_j, gf_p, gt_p = self._grads_both_pf(fv, tex, p, rng)
        scale = np.abs(gf_j).max()
        np.testing.assert_allclose(gf_p, gf_j, atol=2e-3 * scale, rtol=2e-3)
        tscale = max(np.abs(gt_j).max(), 1e-6)
        np.testing.assert_allclose(gt_p, gt_j, atol=2e-3 * tscale, rtol=2e-3)

    def test_bwd_parity_hard_rgb(self, rng):
        F = 16
        p = make_params(image_size=32, dist_func='hard', aggr_func_rgb='hard',
                        aggr_func_alpha='hard', max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        gf_j, gt_j, gf_p, gt_p = self._grads_both_pf(fv, tex, p, rng)
        np.testing.assert_allclose(gf_p, gf_j, atol=1e-5)
        tscale = max(np.abs(gt_j).max(), 1e-6)
        np.testing.assert_allclose(gt_p, gt_j, atol=2e-3 * tscale, rtol=2e-3)


class TestTopKTruncation:
    """grad_mode='topk' (reference default, soft_rasterize.py:369-385,
    1233-1359) must truncate gradients to the K nearest faces per pixel;
    'full' must not.  K=4 over 40 overlapping faces makes it bind."""

    def _setup(self, grad_mode, K=4, F=40):
        rng = np.random.RandomState(0)
        p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                        max_faces_per_pixel_for_grad=K, grad_mode=grad_mode)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        g = rng.randn(1, 4, 32, 32).astype(np.float32)
        return p, fv, tex, g

    def _pf_grads(self, p, fv, tex, g):
        with_thr = p.grad_mode == 'topk' and p.max_faces_id < fv.shape[1]
        out_p, ag_p, aux = pallas_impl.soft_rasterize_fwd_pallas_pf(
            jnp.asarray(fv), jnp.asarray(tex), p, with_thr)
        assert float(aux[:, 0].max()) > p.max_faces_id  # truncation binds
        return map(np.asarray, pallas_impl.soft_rasterize_bwd_pallas_pf(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
            jnp.asarray(g), p))

    def test_topk_matches_oracle_topk(self):
        p, fv, tex, g = self._setup('topk')
        out_j, ag_j, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        gf_j, gt_j = map(np.asarray, jax_impl.soft_rasterize_bwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), out_j, ag_j, fid_j,
            jnp.asarray(g), p))
        gf_p, gt_p = self._pf_grads(p, fv, tex, g)
        scale = np.abs(gf_j).max()
        assert (np.abs(gf_p - gf_j) > 2e-3 * scale).mean() < 0.08
        np.testing.assert_allclose(
            gt_p.sum(axis=2), gt_j.sum(axis=2),
            atol=2e-3 * max(np.abs(gt_j).max(), 1e-6), rtol=2e-3)

    def test_topk_differs_from_full(self):
        p_t, fv, tex, g = self._setup('topk')
        p_f, _, _, _ = self._setup('full')
        gf_t, _ = self._pf_grads(p_t, fv, tex, g)
        gf_f, _ = self._pf_grads(p_f, fv, tex, g)
        # truncation must remove gradient mass somewhere
        assert np.abs(gf_t - gf_f).max() > 1e-3 * np.abs(gf_f).max()
        # and full-mode jnp (K=F) agrees with full-mode pallas
        F = fv.shape[1]
        p_jf = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                           max_faces_per_pixel_for_grad=F, grad_mode='full')
        out_j, ag_j, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p_jf)
        gf_j, _ = map(np.asarray, jax_impl.soft_rasterize_bwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), out_j, ag_j, fid_j,
            jnp.asarray(g), p_jf))
        scale = np.abs(gf_j).max()
        assert (np.abs(gf_f - gf_j) > 2e-3 * scale).mean() < 0.08

    def test_api_topk_dispatch_non_tileable(self):
        """Non-tileable sizes route a binding topk to the oracle."""
        import os
        from jrender_tpu.ops.softras import api
        F, K = 12, 4
        p = make_params(image_size=20, max_faces_per_pixel_for_grad=K)
        assert api._pallas_route(p, F) == 'jax'
        p_full = make_params(image_size=20, max_faces_per_pixel_for_grad=K,
                             grad_mode='full')
        assert api._pallas_route(p_full, F) == 'f_px'
        p_ok = make_params(image_size=32, max_faces_per_pixel_for_grad=K)
        # dir is disabled by default (slower than pxt on real v5e —
        # see dir_impl.dir_max_faces); JR_DIR_MAX opts small meshes in
        assert api._pallas_route(p_ok, F) == 'pxt'
        os.environ['JR_DIR_MAX'] = '64'
        try:
            assert api._pallas_route(p_ok, F) == 'dir'
            assert api._pallas_route(p_ok, 65) == 'pxt'
        finally:
            del os.environ['JR_DIR_MAX']


def test_custom_vjp_pallas_backend(rng):
    import jax
    from jrender_tpu.ops.softras.api import soft_rasterize
    fv = make_random_mesh(rng, num_faces=8).reshape(1, 8, 9).astype(np.float32)
    tex = rng.uniform(size=(1, 8, 4, 3)).astype(np.float32)

    def loss(x, t):
        img = soft_rasterize(x, t, image_size=32, sigma_val=1e-3, backend='pallas')
        return jnp.sum(img ** 2)

    gf, gt = jax.grad(loss, argnums=(0, 1))(jnp.asarray(fv), jnp.asarray(tex))
    assert np.isfinite(np.asarray(gf)).all() and np.abs(np.asarray(gf)).sum() > 0
    assert np.isfinite(np.asarray(gt)).all() and np.abs(np.asarray(gt)).sum() > 0


class TestPxgParity(TestPxFParity):
    """Grouped-lane pxg layout (pxg_impl.py) vs the jnp oracle — inherits
    the full px_f sweep (32 -> 16px tiles, 24 -> 8px tiles)."""

    def _run_pf(self, fv, tex, p):
        out_j, ag_j, _ = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        out_p, ag_p, aux = pxg_impl.soft_rasterize_fwd_pxg(
            jnp.asarray(fv), jnp.asarray(tex), p)
        return (np.asarray(out_j), np.asarray(out_p), np.asarray(ag_j),
                np.asarray(ag_p), aux)

    def _grads_both_pf(self, fv, tex, p, rng, is_=32):
        g = rng.randn(1, 4, is_, is_).astype(np.float32)
        out_j, ag_j, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        gf_j, gt_j = jax_impl.soft_rasterize_bwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), out_j, ag_j, fid_j,
            jnp.asarray(g), p)
        with_thr = p.grad_mode == 'topk' and p.max_faces_id < fv.shape[1]
        out_p, ag_p, aux = pxg_impl.soft_rasterize_fwd_pxg(
            jnp.asarray(fv), jnp.asarray(tex), p, with_thr)
        gf_p, gt_p = pxg_impl.soft_rasterize_bwd_pxg(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
            jnp.asarray(g), p)
        return map(np.asarray, (gf_j, gt_j, gf_p, gt_p))

    def test_candidate_count_matches_oracle(self, rng):
        F = 24
        p = make_params(image_size=32, sigma_val=1e-3,
                        max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        _, _, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        _, _, aux = pxg_impl.soft_rasterize_fwd_pxg(
            jnp.asarray(fv), jnp.asarray(tex), p)
        np.testing.assert_array_equal(np.asarray(aux[0, 0]),
                                      np.asarray((fid_j[0] >= 0).sum(0)))


class TestTopKTruncationPxg(TestTopKTruncation):
    """Same top-K truncation semantics through the pxg layout (threshold
    computed by the XLA depth bisection instead of the in-kernel slab)."""

    def _pf_grads(self, p, fv, tex, g):
        with_thr = p.grad_mode == 'topk' and p.max_faces_id < fv.shape[1]
        out_p, ag_p, aux = pxg_impl.soft_rasterize_fwd_pxg(
            jnp.asarray(fv), jnp.asarray(tex), p, with_thr)
        assert float(aux[:, 0].max()) > p.max_faces_id  # truncation binds
        return map(np.asarray, pxg_impl.soft_rasterize_bwd_pxg(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
            jnp.asarray(g), p))

    def test_api_topk_dispatch_non_tileable(self):
        pass  # covered by the base class (route logic is layout-global)


class TestPxtParity(TestPxgParity):
    """Tile-block-aligned pxt layout (pxt_impl.py) vs the jnp oracle —
    inherits the full px_f/pxg sweep (32 -> 16px tiles, 24 -> 8px
    tiles), exercising the revisited-block combine, the in-kernel ring
    -slab top-K threshold, and the revisited px backward input."""

    def _run_pf(self, fv, tex, p):
        out_j, ag_j, _ = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        out_p, ag_p, aux = pxt_impl.soft_rasterize_fwd_pxt(
            jnp.asarray(fv), jnp.asarray(tex), p)
        return (np.asarray(out_j), np.asarray(out_p), np.asarray(ag_j),
                np.asarray(ag_p), aux)

    def _grads_both_pf(self, fv, tex, p, rng, is_=32):
        g = rng.randn(1, 4, is_, is_).astype(np.float32)
        out_j, ag_j, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        gf_j, gt_j = jax_impl.soft_rasterize_bwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), out_j, ag_j, fid_j,
            jnp.asarray(g), p)
        with_thr = p.grad_mode == 'topk' and p.max_faces_id < fv.shape[1]
        out_p, ag_p, aux = pxt_impl.soft_rasterize_fwd_pxt(
            jnp.asarray(fv), jnp.asarray(tex), p, with_thr)
        gf_p, gt_p = pxt_impl.soft_rasterize_bwd_pxt(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
            jnp.asarray(g), p)
        return map(np.asarray, (gf_j, gt_j, gf_p, gt_p))

    def test_candidate_count_matches_oracle(self, rng):
        F = 24
        p = make_params(image_size=32, sigma_val=1e-3,
                        max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        _, _, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        _, _, aux = pxt_impl.soft_rasterize_fwd_pxt(
            jnp.asarray(fv), jnp.asarray(tex), p)
        np.testing.assert_array_equal(np.asarray(aux[0, 0]),
                                      np.asarray((fid_j[0] >= 0).sum(0)))

    def test_tpi_sweep_parity(self, rng):
        """The block width must not change results: run one scene at
        every TPI (1/2/4 at a 2x2-tile image) and compare to TPI=auto."""
        import os
        F = 24
        p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        ref = None
        for tpi in ('1', '2', '4'):
            os.environ['JR_PXT_TPI'] = tpi
            try:
                out, ag, aux = pxt_impl.soft_rasterize_fwd_pxt(
                    jnp.asarray(fv), jnp.asarray(tex), p)
            finally:
                del os.environ['JR_PXT_TPI']
            out = np.asarray(out)
            if ref is None:
                ref = out
            else:
                np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


class TestTopKTruncationPxt(TestTopKTruncation):
    """Same top-K truncation semantics through the pxt layout (threshold
    bisected in the forward kernel from the ring slab)."""

    def _pf_grads(self, p, fv, tex, g):
        with_thr = p.grad_mode == 'topk' and p.max_faces_id < fv.shape[1]
        out_p, ag_p, aux = pxt_impl.soft_rasterize_fwd_pxt(
            jnp.asarray(fv), jnp.asarray(tex), p, with_thr)
        assert float(aux[:, 0].max()) > p.max_faces_id  # truncation binds
        return map(np.asarray, pxt_impl.soft_rasterize_bwd_pxt(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
            jnp.asarray(g), p))

    def test_api_topk_dispatch_non_tileable(self):
        pass  # covered by the base class (route logic is layout-global)


def test_pxt_glist_parity(rng):
    """Faces spanning more tiles than the emit cap ride the glist path;
    forcing mt=2 routes most faces through it — gradients must still
    match the oracle (exercises the glist branch of the pxt face-major
    gradient reduction).  F=23 keeps the jit cache cold (prep reads
    JR_PXG_MT at trace time)."""
    import os
    F = 23
    p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                    max_faces_per_pixel_for_grad=F)
    fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
    tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
    g = rng.randn(1, 4, 32, 32).astype(np.float32)
    os.environ['JR_PXG_MT'] = '2'
    try:
        from jrender_tpu.ops.softras.binning import build_tile_lists_compact
        from jrender_tpu.ops.softras.pxg_impl import _mt_pxg
        lists = build_tile_lists_compact(
            jnp.asarray(fv), 32, 16, 16, p.threshold, _mt_pxg(F))
        assert int(np.asarray(lists.gcount)[0]) > 0  # glist binds
        out_p, ag_p, aux = pxt_impl.soft_rasterize_fwd_pxt(
            jnp.asarray(fv), jnp.asarray(tex), p, False)
        gf_p, gt_p = pxt_impl.soft_rasterize_bwd_pxt(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
            jnp.asarray(g), p)
    finally:
        del os.environ['JR_PXG_MT']
    out_j, ag_j, fid_j = jax_impl.soft_rasterize_fwd_jax(
        jnp.asarray(fv), jnp.asarray(tex), p)
    gf_j, gt_j = jax_impl.soft_rasterize_bwd_jax(
        jnp.asarray(fv), jnp.asarray(tex), out_j, ag_j, fid_j,
        jnp.asarray(g), p)
    gf_j, gt_j, gf_p, gt_p = map(np.asarray, (gf_j, gt_j, gf_p, gt_p))
    d = np.abs(np.asarray(out_p) - np.asarray(out_j))
    assert (d > 2e-5).mean() < 0.01
    scale = np.abs(gf_j).max()
    assert (np.abs(gf_p - gf_j) > 2e-3 * scale).mean() < 0.02
    np.testing.assert_allclose(
        gt_p, gt_j, atol=2e-3 * max(np.abs(gt_j).max(), 1e-6))


def test_pxt_batched_parity(rng):
    """B=2 through the pxt layout: the per-batch padded-compact tile
    order (prank/pad_off) and the batch-aware gradient segments must
    match the oracle — no other test runs pxt with B > 1."""
    F = 20
    p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                    max_faces_per_pixel_for_grad=F)
    fv = np.concatenate([make_random_mesh(rng, num_faces=F)
                         for _ in range(2)], 0).reshape(2, F, 9)
    tex = rng.uniform(size=(2, F, 4, 3)).astype(np.float32)
    g = rng.randn(2, 4, 32, 32).astype(np.float32)

    out_j, ag_j, fid_j = jax_impl.soft_rasterize_fwd_jax(
        jnp.asarray(fv), jnp.asarray(tex), p)
    gf_j, gt_j = jax_impl.soft_rasterize_bwd_jax(
        jnp.asarray(fv), jnp.asarray(tex), out_j, ag_j, fid_j,
        jnp.asarray(g), p)
    out_p, ag_p, aux = pxt_impl.soft_rasterize_fwd_pxt(
        jnp.asarray(fv), jnp.asarray(tex), p, False)
    gf_p, gt_p = pxt_impl.soft_rasterize_bwd_pxt(
        jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
        jnp.asarray(g), p)
    d = np.abs(np.asarray(out_p) - np.asarray(out_j))
    assert (d > 2e-5).mean() < 0.01
    scale = max(float(jnp.abs(gf_j).max()), 1e-6)
    assert (np.abs(np.asarray(gf_p) - np.asarray(gf_j))
            > 2e-3 * scale).mean() < 0.02
    tscale = max(float(jnp.abs(gt_j).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_j),
                               atol=2e-3 * tscale, rtol=2e-3)

def test_pxt_overflow_degrades_clean(rng, monkeypatch):
    """Work-item overflow (W_true > w_cap) must degrade to DROPPED tiles
    (init vector / background), never to uninitialized kernel-output
    rows scattered into covered pixels (advisor r4).  Force a tiny item
    cap: blocks past the clamped grid never execute, and without the
    rawj executed-mask their S=0 rows divide to inf in the softmax
    finalize."""
    F = 31  # unique F keeps the jit caches cold for the patched caps
    real_caps = pxt_impl._pxt_caps

    def tiny_caps(Fa, image_size, B):
        t, NT, NTP, cap, TPI, w_cap = real_caps(Fa, image_size, B)
        # TPI=1 -> one block per covered tile, so blocks past the item
        # cap exist (at TPI=NT there is a single block whose first item
        # always executes); w_cap=2 drops every block after the second
        return t, NT, NT, cap, 1, 2
    monkeypatch.setattr(pxt_impl, '_pxt_caps', tiny_caps)

    p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                    background_color=(0.25, 0.5, 0.75))
    fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
    tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
    out, ag, aux = pxt_impl.soft_rasterize_fwd_pxt(
        jnp.asarray(fv), jnp.asarray(tex), p)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # dropped tiles must sit exactly at the background init
    bg = np.asarray([0.25, 0.5, 0.75, 0.0], np.float32)
    is_bg = np.all(np.abs(out - bg[None, :, None, None]) < 1e-6, axis=1)
    assert is_bg.mean() > 0.1  # the tiny cap really dropped tiles

class TestDirParity(TestPxgParity):
    """Binning-free direct layout (dir_impl.py, small meshes) vs the jnp
    oracle — inherits the full px_f/pxg sweep, exercising the resident
    face table, per-chunk bbox culling, register-carried tile
    aggregation, the in-step top-K bisect, and the resident-gradient
    backward."""

    def _run_pf(self, fv, tex, p):
        from jrender_tpu.ops.softras import dir_impl
        out_j, ag_j, _ = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        out_p, ag_p, aux = dir_impl.soft_rasterize_fwd_dir(
            jnp.asarray(fv), jnp.asarray(tex), p)
        return (np.asarray(out_j), np.asarray(out_p), np.asarray(ag_j),
                np.asarray(ag_p), aux)

    def _grads_both_pf(self, fv, tex, p, rng, is_=32):
        from jrender_tpu.ops.softras import dir_impl
        g = rng.randn(1, 4, is_, is_).astype(np.float32)
        out_j, ag_j, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        gf_j, gt_j = jax_impl.soft_rasterize_bwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), out_j, ag_j, fid_j,
            jnp.asarray(g), p)
        with_thr = p.grad_mode == 'topk' and p.max_faces_id < fv.shape[1]
        out_p, ag_p, aux = dir_impl.soft_rasterize_fwd_dir(
            jnp.asarray(fv), jnp.asarray(tex), p, with_thr)
        gf_p, gt_p = dir_impl.soft_rasterize_bwd_dir(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
            jnp.asarray(g), p)
        return map(np.asarray, (gf_j, gt_j, gf_p, gt_p))

    def test_candidate_count_matches_oracle(self, rng):
        from jrender_tpu.ops.softras import dir_impl
        F = 24
        p = make_params(image_size=32, sigma_val=1e-3,
                        max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        _, _, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        _, _, aux = dir_impl.soft_rasterize_fwd_dir(
            jnp.asarray(fv), jnp.asarray(tex), p)
        np.testing.assert_array_equal(np.asarray(aux[0, 0]),
                                      np.asarray((fid_j[0] >= 0).sum(0)))

    def test_multi_chunk_batched(self, rng):
        """F=150 at B=2: two 128-lane chunks with a real lane-padding
        tail, per-batch face tables, and batched gradient blocks."""
        from jrender_tpu.ops.softras import dir_impl
        F = 150
        p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                        max_faces_per_pixel_for_grad=F)
        fv = np.concatenate([make_random_mesh(rng, num_faces=F)
                             for _ in range(2)], 0).reshape(2, F, 9)
        tex = rng.uniform(size=(2, F, 4, 3)).astype(np.float32)
        g = rng.randn(2, 4, 32, 32).astype(np.float32)
        out_j, ag_j, fid_j = jax_impl.soft_rasterize_fwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), p)
        gf_j, gt_j = jax_impl.soft_rasterize_bwd_jax(
            jnp.asarray(fv), jnp.asarray(tex), out_j, ag_j, fid_j,
            jnp.asarray(g), p)
        out_p, ag_p, aux = dir_impl.soft_rasterize_fwd_dir(
            jnp.asarray(fv), jnp.asarray(tex), p)
        gf_p, gt_p = dir_impl.soft_rasterize_bwd_dir(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
            jnp.asarray(g), p)
        d = np.abs(np.asarray(out_p) - np.asarray(out_j))
        assert (d > 2e-5).mean() < 0.01
        scale = max(float(jnp.abs(gf_j).max()), 1e-6)
        assert (np.abs(np.asarray(gf_p) - np.asarray(gf_j))
                > 2e-3 * scale).mean() < 0.02
        tscale = max(float(jnp.abs(gt_j).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_j),
                                   atol=2e-3 * tscale, rtol=2e-3)


class TestTopKTruncationDir(TestTopKTruncation):
    """Same top-K truncation semantics through the dir layout (threshold
    bisected in-step from the per-tile candidate-depth scratch)."""

    def _pf_grads(self, p, fv, tex, g):
        from jrender_tpu.ops.softras import dir_impl
        with_thr = p.grad_mode == 'topk' and p.max_faces_id < fv.shape[1]
        out_p, ag_p, aux = dir_impl.soft_rasterize_fwd_dir(
            jnp.asarray(fv), jnp.asarray(tex), p, with_thr)
        assert float(aux[:, 0].max()) > p.max_faces_id  # truncation binds
        return map(np.asarray, dir_impl.soft_rasterize_bwd_dir(
            jnp.asarray(fv), jnp.asarray(tex), out_p, ag_p, aux,
            jnp.asarray(g), p))

    def test_api_topk_dispatch_non_tileable(self):
        pass  # covered by the base class (route logic is layout-global)

    def test_morton_sort_invariance(self, rng):
        """JR_DIR_SORT reorders the face table for chunk-cull locality;
        results must be invariant (original ids ride the table, grads
        are un-permuted) up to float re-association."""
        import os
        from jrender_tpu.ops.softras import dir_impl
        F = 151
        p = make_params(image_size=32, sigma_val=1e-3, gamma_val=1e-3,
                        dist_func='hard', aggr_func_rgb='hard',
                        aggr_func_alpha='hard',
                        max_faces_per_pixel_for_grad=F)
        fv = make_random_mesh(rng, num_faces=F).reshape(1, F, 9)
        tex = rng.uniform(size=(1, F, 4, 3)).astype(np.float32)
        g = rng.randn(1, 4, 32, 32).astype(np.float32)

        def run():
            out, ag, aux = dir_impl.soft_rasterize_fwd_dir(
                jnp.asarray(fv), jnp.asarray(tex), p)
            gf, gt = dir_impl.soft_rasterize_bwd_dir(
                jnp.asarray(fv), jnp.asarray(tex), out, ag, aux,
                jnp.asarray(g), p)
            return map(np.asarray, (out, ag, gf, gt))

        out1, ag1, gf1, gt1 = run()
        os.environ['JR_DIR_SORT'] = '0'
        try:
            out0, ag0, gf0, gt0 = run()
        finally:
            del os.environ['JR_DIR_SORT']
        np.testing.assert_allclose(out1, out0, atol=1e-6)
        # hard winner ids must be IDENTICAL (original-id tie-break)
        np.testing.assert_array_equal(ag1[:, 1], ag0[:, 1])
        np.testing.assert_allclose(gf1, gf0, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(gt1, gt0, atol=1e-5, rtol=1e-5)
