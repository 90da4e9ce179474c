"""Stage-level timing of soft_rasterize_bwd_pallas_pf on the real chip.

All timings use the scan-chained two-point methodology (per-call
block_until_ready timing is unreliable through the axon tunnel): each
variant runs fwd(with_thr) then a prefix of the backward pipeline, and
the stage costs fall out of differences between variants.
"""
import sys
import time
import functools

import numpy as np

sys.path.insert(0, '/root/repo')
from bench import uv_sphere, _probe_backend

IMAGE_SIZE = 1024


def scan_timed(fn, x0, *rest, n1=2, n2=12):
    """fn(x0*, *rest) -> scalar f32; x0 perturbed by the carry."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(len(rest) + 1,))
    def many(x0, *a):
        *xs, n = a

        def body(c, _):
            r = fn(x0 * (1.0 + c), *xs)
            return c + r * 1e-32, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    float(many(x0, *rest, n1))
    float(many(x0, *rest, n2))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(many(x0, *rest, n1))
        t1 = time.time()
        float(many(x0, *rest, n2))
        t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return best


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.softras.params import make_params
    from jrender_tpu.ops.softras import pallas_impl as PI

    for name, rings, segs in [('small', 13, 12), ('large', 130, 153)]:
        verts, faces = uv_sphere(rings=rings, segs=segs)
        mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
        v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
        fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
        tex = jax.random.uniform(jax.random.PRNGKey(0),
                                 (1, fv.shape[1], 25, 3))
        F = fv.shape[1]
        B = 1
        T = 25
        p = make_params(image_size=IMAGE_SIZE, sigma_val=1e-5,
                        gamma_val=1e-4, texture_type='surface',
                        grad_mode='topk', max_faces_per_pixel_for_grad=16)

        is_ = p.image_size
        t = PI._pf_tile_for(is_)
        TY = TX = is_ // t
        T2 = t * t
        TYB = TY
        cap = max(PI.PF_FB, min(F, 2048))
        cap = (cap + PI.PF_FB - 1) // PI.PF_FB * PI.PF_FB
        w_cap = PI._work_cap_pf(F, TYB * TX, B)
        FB = PI.PF_FB
        NT = TYB * TX
        BWD_PC = PI.BWD_PC

        def fwd(x):
            out, aggrs, aux = PI.soft_rasterize_fwd_pallas_pf(x, tex, p, True)
            return out, aggrs, aux

        def v_fwd(x):
            out, _, _ = fwd(x)
            return jnp.sum(out[:, :1, ::64, ::64])

        def px_build(out, aggrs, aux):
            g = jnp.ones_like(out)
            px = jnp.concatenate([out, aggrs, g, aux[:, 1:2]], axis=1)
            return px.reshape(B, BWD_PC, TYB, t, TX, t) \
                .transpose(0, 2, 4, 1, 3, 5).reshape(B, NT, BWD_PC, T2)

        def v_fwd_px(x):
            out, aggrs, aux = fwd(x)
            px = px_build(out, aggrs, aux)
            return jnp.sum(px[:, ::16, 0, 0])

        def v_fwd_prep(x):
            out, aggrs, aux = fwd(x)
            r = PI._prep_work_data_pf(x, tex, p, cap, w_cap, None)
            return jnp.sum(out[0, 0, 0, ::64]) + r[0][::32, 0, 0].sum()

        kernel = PI._make_bwd_kernel_pf(p, T, F, use_thr=True)
        px_spec = pl.BlockSpec(
            (1, 1, BWD_PC, T2),
            lambda i, b_s, ty_s, tx_s, ch_s, fi_s, la_s, ac_s:
            (b_s[i], ty_s[i] * TX + tx_s[i], 0, 0),
            memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((1, 9, FB),
                         lambda i, b_s, ty_s, tx_s, ch_s, fi_s, la_s, ac_s:
                         (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T * 3, FB),
                         lambda i, b_s, ty_s, tx_s, ch_s, fi_s, la_s, ac_s:
                         (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((w_cap, 9, FB), jnp.float32),
            jax.ShapeDtypeStruct((w_cap, T * 3, FB), jnp.float32),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(w_cap,),
            in_specs=[PI._scal7_spec(1, FB), PI._scal7_spec(9, FB),
                      PI._scal7_spec(9, FB), PI._scal7_spec(9, FB),
                      PI._scal7_spec(3, FB), PI._scal7_spec(1, FB),
                      PI._scal7_spec(T * 3, FB), px_spec],
            out_specs=out_specs,
            scratch_shapes=[],
        )

        def v_fwd_prep_kernel(x):
            out, aggrs, aux = fwd(x)
            px = px_build(out, aggrs, aux)
            (ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex,
             scalars, lists, covered, _T) = \
                PI._prep_work_data_pf(x, tex, p, cap, w_cap, None)
            gface_slots, gtex_slots = pl.pallas_call(
                kernel, grid_spec=grid_spec, out_shape=out_shapes,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(*scalars, ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex,
              px)
            return gface_slots[::16, 0, 0].sum() + gtex_slots[::16, 0, 0].sum()

        def v_full(x):
            out, aggrs, aux = fwd(x)
            g = jnp.ones_like(out)
            gf, gt = PI.soft_rasterize_bwd_pallas_pf(x, tex, out, aggrs,
                                                     aux, g, p)
            return gf[0, ::32, 0].sum() + gt[0, ::32, 0, 0].sum()

        r = {
            'F': F, 'w_cap': w_cap,
            'fwd': round(scan_timed(v_fwd, fv), 2),
            'fwd+px': round(scan_timed(v_fwd_px, fv), 2),
            'fwd+prep': round(scan_timed(v_fwd_prep, fv), 2),
            'fwd+prep+kernel': round(scan_timed(v_fwd_prep_kernel, fv), 2),
            'fwd+fullbwd': round(scan_timed(v_full, fv), 2),
        }
        print(name, r, flush=True)


if __name__ == '__main__':
    main()
