"""On-device parity check: px_f Pallas kernels vs jnp oracle at the
current JR_PRECISION / JR_PF_TILE settings (the CPU test suite runs the
kernels in interpret mode, which cannot see MXU precision effects)."""
import sys
import os

sys.path.insert(0, '/root/repo')
from bench import uv_sphere, _probe_backend

IMAGE_SIZE = 256


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.softras.params import make_params
    from jrender_tpu.ops.softras import pallas_impl, jax_impl

    verts, faces = uv_sphere(rings=13, segs=12)
    mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
    v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
    fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
    F = fv.shape[1]

    fails = 0
    for tt, tex in [
        ('surface', jax.random.uniform(jax.random.PRNGKey(0), (1, F, 25, 3))),
        ('vertex', jax.random.uniform(jax.random.PRNGKey(0), (1, F, 3, 3))),
    ]:
        for aggr_rgb, aggr_a in [('softmax', 'prod'), ('hard', 'hard'),
                                 ('softmax', 'sum')]:
            p = make_params(image_size=IMAGE_SIZE, sigma_val=1e-5,
                            gamma_val=1e-4, texture_type=tt,
                            aggr_func_rgb=aggr_rgb, aggr_func_alpha=aggr_a,
                            grad_mode='topk', max_faces_per_pixel_for_grad=16)
            op, ap, _ = pallas_impl.soft_rasterize_fwd_pallas_pf(fv, tex, p, True)
            oj, aj, _ = jax_impl.soft_rasterize_fwd_jax(fv, tex, p)
            op, ap, oj, aj = map(np.asarray, (op, ap, oj, aj))
            derr = np.abs(op - oj).max()
            frac = (np.abs(op - oj) > 2e-5).mean()
            tag = f'{tt}/{aggr_rgb}/{aggr_a}'
            ok = frac < 0.01 and derr < 0.05
            print(f'fwd  {tag:28s} maxerr={derr:.2e} frac>2e-5={frac:.4f} '
                  f'{"OK" if ok else "FAIL"}', flush=True)
            fails += 0 if ok else 1

            if aggr_rgb == 'softmax' and aggr_a == 'prod':
                def loss_p(x, t, p=p):
                    out, ag, aux = pallas_impl.soft_rasterize_fwd_pallas_pf(
                        x, t, p, True)
                    g = jnp.ones_like(out)
                    return pallas_impl.soft_rasterize_bwd_pallas_pf(
                        x, t, out, ag, aux, g, p)

                def loss_j(x, t, p=p):
                    out, ag, fid = jax_impl.soft_rasterize_fwd_jax(x, t, p)
                    g = jnp.ones_like(out)
                    return jax_impl.soft_rasterize_bwd_jax(
                        x, t, out, ag, fid, g, p)

                gf_p, gt_p = map(np.asarray, loss_p(fv, tex))
                gf_j, gt_j = map(np.asarray, loss_j(fv, tex))
                sc = max(np.abs(gf_j).max(), 1e-6)
                tsc = max(np.abs(gt_j).max(), 1e-6)
                e1 = np.abs(gf_p - gf_j).max() / sc
                e2 = np.abs(gt_p - gt_j).max() / tsc
                ok = e1 < 2e-3 and e2 < 2e-3
                print(f'bwd  {tag:28s} gface_rel={e1:.2e} gtex_rel={e2:.2e} '
                      f'{"OK" if ok else "FAIL"}', flush=True)
                fails += 0 if ok else 1
    print('FAILS:', fails)
    sys.exit(1 if fails else 0)


if __name__ == '__main__':
    main()
