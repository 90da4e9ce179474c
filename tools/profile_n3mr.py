"""Component-level timing of the N3MR path on the real chip.

Splits fwd z-buffer / trilinear texture / banded edge backward /
texture backward, per mesh row.  Same timing methodology as bench.py.
"""
import sys

sys.path.insert(0, '/root/repo')
from bench import uv_sphere, _probe_backend
from tools.profile_softras import timed

IMAGE_SIZE = 1024
TEX_SIZE = 2


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.n3mr import rasterize, api, banded_bwd, impl
    from jrender_tpu.ops.n3mr import pallas_impl as n3mr_pl

    for name, rings, segs in [('small', 13, 12), ('large', 130, 153)]:
        verts, faces = uv_sphere(rings=rings, segs=segs)
        mesh = Mesh(verts, faces)
        v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
        fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
        F = fv.shape[1]
        tex = jax.random.uniform(
            jax.random.PRNGKey(0),
            (1, F, TEX_SIZE, TEX_SIZE, TEX_SIZE, 3), jnp.float32)

        p = api.N3mrParams(image_size=IMAGE_SIZE, near=0.1, far=100.0,
                           eps=1e-4, background_color=(0., 0., 0.),
                           return_rgb=True, return_alpha=True,
                           return_depth=True)

        def fwd_only(x, t):
            out, _ = api._forward(x.reshape(1, F, 3, 3), t, p)
            return out[0].sum() + out[1].sum() + out[2].sum()

        def fwd_maps(x, t):
            fi, wt, dp, finv, zc, texrow = n3mr_pl.forward_sel_pallas(
                x.reshape(1, F, 9),
                t.reshape(1, F, -1), IMAGE_SIZE, p.near, p.far)
            return dp.sum() + wt.sum()

        # full fwd+bwd via rasterize (rgb only like the bench)
        def full(x, t):
            img = rasterize(x.reshape(1, F, 3, 3), t,
                            image_size=IMAGE_SIZE, anti_aliasing=False)
            return jnp.sum(img)

        grad_fn = jax.grad(full, argnums=(0, 1))

        def fwdbwd(x, t):
            gf, gt = grad_fn(x, t)
            return gf[0, 0, 0] + gt[0, 0, 0, 0, 0, 0]

        # isolate the banded pixel-map backward: precompute maps once
        out, saved = api._forward(fv.reshape(1, F, 3, 3), tex, p)
        m = saved
        g_rgb = jnp.ones_like(m.rgb)
        g_alpha = jnp.ones_like(m.alpha)

        def banded_only(x, g):
            return banded_bwd.backward_pixel_map_banded(
                x[0], m.face_index[0], m.rgb[0], m.alpha[0],
                g[0], g_alpha[0], IMAGE_SIZE, p.eps, True, True).sum()

        def texbwd_only(x, g):
            return impl.backward_textures_single(
                tex.shape[1:], m.face_index[0], m.weight[0], m.depth[0],
                m.zcorn[0], g[0] * (1.0 + x[0, 0, 0]), p.eps).sum()

        r = {
            'F': F,
            'fwd_maps_ms': round(timed(fwd_maps, fv, tex), 2),
            'fwd_full_ms': round(timed(fwd_only, fv, tex), 2),
            'banded_bwd_ms': round(timed(banded_only, fv, g_rgb), 2),
            'tex_bwd_ms': round(timed(texbwd_only, fv, g_rgb), 2),
            'fwd_bwd_ms': round(timed(fwdbwd, fv, tex), 2),
        }
        print(name, r, flush=True)


if __name__ == '__main__':
    main()
