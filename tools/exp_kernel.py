"""Experiment: break down px_f kernel cost — precision, texture sweep, tile size.

Usage: python tools/exp_kernel.py  (env: JR_PRECISION, JR_PF_TILE, JR_BIN_MT)
"""
import sys
import os

sys.path.insert(0, '/root/repo')
from bench import uv_sphere, _probe_backend
from tools.profile_softras import timed

IMAGE_SIZE = 1024


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.softras.params import make_params
    from jrender_tpu.ops.softras import pallas_impl

    cfg = (f"tile={pallas_impl._pf_tile_for(IMAGE_SIZE)} "
           f"prec={os.environ.get('JR_PRECISION','highest')} "
           f"mt={pallas_impl._bin_mt_for(39474)}")

    for name, rings, segs in [('small', 13, 12), ('large', 130, 153)]:
        verts, faces = uv_sphere(rings=rings, segs=segs)
        mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
        v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
        fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
        F = fv.shape[1]
        tex_s = jax.random.uniform(jax.random.PRNGKey(0), (1, F, 25, 3))
        tex_v = jax.random.uniform(jax.random.PRNGKey(0), (1, F, 3, 3))

        res = {}
        for tt, tex in [('surface', tex_s), ('vertex', tex_v)]:
            p = make_params(image_size=IMAGE_SIZE, sigma_val=1e-5,
                            gamma_val=1e-4, texture_type=tt, grad_mode='topk',
                            max_faces_per_pixel_for_grad=16)

            def fwd_nothr(x, t, p=p):
                out, _, _ = pallas_impl.soft_rasterize_fwd_pallas_pf(
                    x, t, p, False)
                return jnp.sum(out)

            def fwd_thr(x, t, p=p):
                out, _, _ = pallas_impl.soft_rasterize_fwd_pallas_pf(
                    x, t, p, True)
                return jnp.sum(out)

            def fwdbwd(x, t, p=p):
                out, ag, aux = pallas_impl.soft_rasterize_fwd_pallas_pf(
                    x, t, p, True)
                g = jnp.ones_like(out)
                gf, gt = pallas_impl.soft_rasterize_bwd_pallas_pf(
                    x, t, out, ag, aux, g, p)
                return jnp.sum(out) + gf[0, 0, 0] + gt[0, 0, 0, 0]

            res[f'{tt}_fwd'] = round(timed(fwd_nothr, fv, tex), 2)
            res[f'{tt}_fwd_thr'] = round(timed(fwd_thr, fv, tex), 2)
            res[f'{tt}_fwdbwd'] = round(timed(fwdbwd, fv, tex), 2)
        print(name, 'F=', F, cfg, res, flush=True)


if __name__ == '__main__':
    main()
