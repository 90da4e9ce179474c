"""Experiment: isolate px_f grid-step overhead vs pair math cost.

Times the raw px_f forward under varying w_cap (padding steps),
tile sizes, and precision, on the real chip.
"""
import sys
import functools

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
    from jrender_tpu.ops.softras import pallas_impl, binning

    for name, rings, segs in [('small', 13, 12), ('large', 130, 153)]:
        verts, faces = uv_sphere(rings=rings, segs=segs)
        mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
        v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
        fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
        tex = jax.random.uniform(jax.random.PRNGKey(0),
                                 (1, fv.shape[1], 25, 3))
        F = fv.shape[1]
        p = make_params(image_size=IMAGE_SIZE, sigma_val=1e-5, gamma_val=1e-4,
                        texture_type='surface', grad_mode='topk',
                        max_faces_per_pixel_for_grad=16)

        # measure true demand eagerly
        t_edge = pallas_impl._pf_tile_for(IMAGE_SIZE)
        lists = binning.build_tile_lists_compact(
            fv, IMAGE_SIZE, t_edge, t_edge, p.threshold,
            pallas_impl._bin_mt_for(F))
        import numpy as np
        counts = np.asarray(lists.counts)
        nc = np.ceil(np.minimum(counts, 2048) / pallas_impl.PF_FB)
        true_items = int(nc.sum())
        covered = int((counts > 0).sum())
        print(f'{name}: F={F} true_items={true_items} covered_tiles={covered} '
              f'gcount={int(np.asarray(lists.gcount)[0])}', flush=True)

        def raw_fwd(x, t):
            out, aggrs, aux = pallas_impl.soft_rasterize_fwd_pallas_pf(
                x, t, p, False)
            return jnp.sum(out)

        # baseline (current w_cap)
        ms = timed(raw_fwd, fv, tex)
        print(f'  fwd(no thr) default w_cap={pallas_impl._work_cap_pf(F, (IMAGE_SIZE//t_edge)**2, 1)}: {ms:.2f} ms', flush=True)

        # tight w_cap: monkeypatch
        orig = pallas_impl._work_cap_pf
        tight = max(64, (true_items + 63) // 64 * 64)
        pallas_impl._work_cap_pf = lambda F_, n, B_: tight
        try:
            ms2 = timed(raw_fwd, fv, tex)
            print(f'  fwd(no thr) tight w_cap={tight}: {ms2:.2f} ms', flush=True)
        finally:
            pallas_impl._work_cap_pf = orig


if __name__ == '__main__':
    main()
