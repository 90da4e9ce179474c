"""Sharded rendering: pixel-band rasterize fwd+bwd parity on a virtual
8-device mesh (SURVEY §5 / jt.mpi replacement; VERDICT r1 item 3)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh
import pytest

from conftest import make_random_mesh
from jrender_tpu.ops.softras import jax_impl
from jrender_tpu.ops.softras.params import make_params
from jrender_tpu.parallel.render import soft_rasterize_sharded_vjp


@pytest.fixture(scope='module')
def mesh8():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ('data',))


class TestShardedRasterize:
    def _setup(self, rng, F=40, is_=64):
        p = make_params(image_size=is_, sigma_val=1e-3, gamma_val=1e-3)
        fv = jnp.asarray(make_random_mesh(rng, num_faces=F).reshape(1, F, 9))
        tex = jnp.asarray(rng.uniform(size=(1, F, 4, 3)).astype(np.float32))
        return p, fv, tex

    def test_fwd_parity(self, rng, mesh8):
        p, fv, tex = self._setup(rng)
        ref, _, _ = jax_impl.soft_rasterize_fwd_jax(fv, tex, p)
        with mesh8:
            out = soft_rasterize_sharded_vjp(fv, tex, p, mesh8)
        out, ref = np.asarray(out), np.asarray(ref)
        # rgb: tight except texel-selector discontinuity flips (the FMA
        # contraction differs across band shapes — same tolerance as the
        # pallas-vs-oracle tests); alpha has no selector -> tight everywhere
        assert (np.abs(out - ref) > 2e-4).mean() < 0.01
        np.testing.assert_allclose(out[:, 3], ref[:, 3], atol=2e-4)

    def test_bwd_parity_psum(self, rng, mesh8):
        """Band-sharded gradients must equal the single-device gradients
        (per-band partial grads reduce over the band axis).

        T=1 textures: no texel-selector discontinuity, so the band and
        full-image forwards agree everywhere and the gradient comparison
        is tight (T>1 flips a ~1% pixel fraction at selector boundaries
        purely from re-vectorized FMA contraction on CPU)."""
        p, fv, _ = self._setup(rng)
        tex = jnp.asarray(rng.uniform(size=(1, 40, 1, 3)).astype(np.float32))
        g = jnp.asarray(rng.randn(1, 4, 64, 64).astype(np.float32))

        def loss_ref(f, t):
            out, ag, fid = jax_impl.soft_rasterize_fwd_jax(f, t, p)
            return jnp.sum(out * g)

        # oracle grads through the jnp custom path
        out, ag, fid = jax_impl.soft_rasterize_fwd_jax(fv, tex, p)
        gf_ref, gt_ref = jax_impl.soft_rasterize_bwd_jax(
            fv, tex, out, ag, fid, g, p)

        def loss_sh(f, t):
            with mesh8:
                out = soft_rasterize_sharded_vjp(f, t, p, mesh8)
            return jnp.sum(out * g)

        gf, gt = jax.grad(loss_sh, argnums=(0, 1))(fv, tex)
        scale = max(float(jnp.abs(gf_ref).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref),
                                   atol=2e-3 * scale, rtol=2e-3)
        tscale = max(float(jnp.abs(gt_ref).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref),
                                   atol=2e-3 * tscale, rtol=2e-3)

    def test_band_pallas_path_multi_device(self, rng, mesh8, monkeypatch):
        """The PRODUCTION px_f band kernels (ty0/ty_band index math +
        psum glue) must execute under shard_map — forced into interpret
        mode on the 8-CPU mesh via JR_FORCE_PALLAS_BANDS (VERDICT r2
        item 6).  grad_mode='topk' (K<F) also runs the banded threshold
        pass.  PF_TILE=8 gives 8 tile rows at 64px -> one per device."""
        from jrender_tpu.ops.softras import pallas_impl
        monkeypatch.setenv('JR_FORCE_PALLAS_BANDS', '1')
        monkeypatch.setattr(pallas_impl, 'PF_TILE', 8)
        p, fv, _ = self._setup(rng)
        tex = jnp.asarray(rng.uniform(size=(1, 40, 1, 3)).astype(np.float32))
        g = jnp.asarray(rng.randn(1, 4, 64, 64).astype(np.float32))

        out_ref, ag, fid = jax_impl.soft_rasterize_fwd_jax(fv, tex, p)
        gf_ref, gt_ref = jax_impl.soft_rasterize_bwd_jax(
            fv, tex, out_ref, ag, fid, g, p)

        def loss_sh(f, t):
            with mesh8:
                out = soft_rasterize_sharded_vjp(f, t, p, mesh8)
            return jnp.sum(out * g)

        with mesh8:
            out = soft_rasterize_sharded_vjp(fv, tex, p, mesh8)
        assert (np.abs(np.asarray(out) - np.asarray(out_ref)) > 2e-4).mean() \
            < 0.01
        gf, gt = jax.grad(loss_sh, argnums=(0, 1))(fv, tex)
        # topk truncation binds identically in the banded and oracle paths
        scale = max(float(jnp.abs(gf_ref).max()), 1e-6)
        assert (np.abs(np.asarray(gf) - np.asarray(gf_ref))
                > 2e-3 * scale).mean() < 0.08
        tscale = max(float(jnp.abs(gt_ref).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref),
                                   atol=2e-3 * tscale, rtol=2e-3)


class TestShardedPxtBand:
    def test_pxt_band_path_multi_device(self, rng, mesh8):
        """The DEFAULT pxt layout's band mode (ty0/ty_band demand
        masking + band-local assembly + psum glue) must execute under
        shard_map (VERDICT r3 item 5: the sharded path previously
        hardwired px_f).  128px / 16px tiles -> 8 tile rows, one per
        device; grad_mode='topk' (K<F) runs the in-forward threshold."""
        import os
        from jrender_tpu.ops.softras import pallas_impl, pxg_impl
        from jrender_tpu.parallel.render import soft_rasterize_sharded_vjp
        is_ = 128
        F = 40
        assert pallas_impl.LAYOUT == 'pxt'
        assert (is_ // pxg_impl._pxg_tile_for(is_)) % 8 == 0
        os.environ['JR_FORCE_PALLAS_BANDS'] = '1'
        try:
            p = make_params(image_size=is_, sigma_val=1e-3, gamma_val=1e-3,
                            max_faces_per_pixel_for_grad=8)
            fv = jnp.asarray(
                make_random_mesh(rng, num_faces=F).reshape(1, F, 9))
            tex = jnp.asarray(
                rng.uniform(size=(1, F, 1, 3)).astype(np.float32))
            g = jnp.asarray(rng.randn(1, 4, is_, is_).astype(np.float32))

            out_ref, ag, fid = jax_impl.soft_rasterize_fwd_jax(fv, tex, p)
            gf_ref, gt_ref = jax_impl.soft_rasterize_bwd_jax(
                fv, tex, out_ref, ag, fid, g, p)

            def loss_sh(f, t):
                with mesh8:
                    out = soft_rasterize_sharded_vjp(f, t, p, mesh8)
                return jnp.sum(out * g)

            with mesh8:
                out = soft_rasterize_sharded_vjp(fv, tex, p, mesh8)
            assert (np.abs(np.asarray(out) - np.asarray(out_ref))
                    > 2e-4).mean() < 0.01
            gf, gt = jax.grad(loss_sh, argnums=(0, 1))(fv, tex)
            scale = max(float(jnp.abs(gf_ref).max()), 1e-6)
            assert (np.abs(np.asarray(gf) - np.asarray(gf_ref))
                    > 2e-3 * scale).mean() < 0.08
            tscale = max(float(jnp.abs(gt_ref).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref),
                                       atol=2e-3 * tscale, rtol=2e-3)
        finally:
            del os.environ['JR_FORCE_PALLAS_BANDS']

    def test_pxt_stride_equals_contig(self, rng, mesh8):
        """band_mode='stride' (round-robin tile rows, the default) must
        return the SAME image and gradients as the round-4 contiguous
        bands — the wrapper re-interleaves the strided device bands
        (VERDICT r4 item 5: striding flattens band load imbalance)."""
        import os
        is_, F = 128, 37
        os.environ['JR_FORCE_PALLAS_BANDS'] = '1'
        try:
            p = make_params(image_size=is_, sigma_val=1e-3, gamma_val=1e-3,
                            max_faces_per_pixel_for_grad=8)
            fv = jnp.asarray(
                make_random_mesh(rng, num_faces=F).reshape(1, F, 9))
            tex = jnp.asarray(
                rng.uniform(size=(1, F, 1, 3)).astype(np.float32))
            g = jnp.asarray(rng.randn(1, 4, is_, is_).astype(np.float32))

            def loss(mode):
                def f(fv_, tex_):
                    with mesh8:
                        out = soft_rasterize_sharded_vjp(
                            fv_, tex_, p, mesh8, band_mode=mode)
                    return jnp.sum(out * g), out
                (l, out), grads = jax.value_and_grad(
                    f, argnums=(0, 1), has_aux=True)(fv, tex)
                return out, grads

            out_s, (gf_s, gt_s) = loss('stride')
            out_c, (gf_c, gt_c) = loss('contig')
            np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_c),
                                       atol=1e-6, rtol=1e-6)
            np.testing.assert_allclose(np.asarray(gf_s), np.asarray(gf_c),
                                       atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(gt_s), np.asarray(gt_c),
                                       atol=1e-5, rtol=1e-5)
        finally:
            del os.environ['JR_FORCE_PALLAS_BANDS']
