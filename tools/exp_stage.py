"""Stage decomposition of the SoftRas fwd+bwd frame on the bench meshes.

Round-4 verdict (weak #2): the 51.23 ms headline has no committed
breakdown — "how much is prep (binning sort + row gathers), fwd kernel,
bwd kernel, final segment-sums, image assembly?".  This harness times
each stage in isolation with the same scan-chain + two-point timing as
bench.py, so the numbers compose with the bench rows.

Stages (pxt route):
  binning   build_tile_lists_compact alone (sort + offsets + glist)
  prep      full prep_pxt (binning + work list + per-lane gathers)
  fwd       soft_rasterize_fwd_pxt GIVEN prep (kernel + scatter + image)
  bwd       soft_rasterize_bwd_pxt GIVEN prep (kernel + segment-sums)
  e2e       jax.grad of the public soft_rasterize (the bench row)

For the dir route (small meshes) prep is three tiny ops; stages are
prep/fwd/bwd/e2e.

Usage (on the real chip):
  python tools/exp_stage.py [small|middle|large|spot ...]
Writes one JSON line per (mesh, stage) to stdout; commit the output as
docs/STAGE_BREAKDOWN_r5.jsonl.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402  (uv_sphere / spot_mesh / timing constants)


def timed(fn, args, n1=2, n2=10, reps=3, perturb=0):
    """Best per-call ms: scan-chained on-device calls, two-point timing.
    ``perturb``: index of the f32 operand to scale by (1 + carry*1e-32)
    so XLA cannot hoist the body out of the scan."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(len(args),))
    def many(*a):
        *xs, n = a

        def body(c, _):
            xs2 = list(xs)
            xs2[perturb] = xs2[perturb] * (1.0 + c)
            r = fn(*xs2)
            return c + r * 1e-32, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    v = float(many(*args, n1))
    assert np.isfinite(v), 'non-finite timed result'
    float(many(*args, n2))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        float(many(*args, n1))
        t1 = time.time()
        float(many(*args, n2))
        t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return best


def mesh_for(name):
    rows = {n: (r, s) for n, r, s, _ in bench.ROWS}
    r, s = rows[name]
    if name == 'spot':
        return bench.spot_mesh()
    return bench.uv_sphere(rings=r, segs=s)


def run(name):
    import jax
    import jax.numpy as jnp
    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.softras import soft_rasterize, api, make_params
    from jrender_tpu.ops.softras.binning import build_tile_lists_compact

    verts, faces = mesh_for(name)
    mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
    v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
    fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
    tex = jax.random.uniform(jax.random.PRNGKey(0), (1, fv.shape[1], 25, 3))
    F = fv.shape[1]
    is_ = bench.IMAGE_SIZE
    p = make_params(image_size=is_, sigma_val=1e-5, gamma_val=1e-4)
    route = api._pallas_route(p, F)
    g = jax.random.normal(jax.random.PRNGKey(1), (1, 4, is_, is_))

    only = [s for s in os.environ.get('JR_STAGE_ONLY', '').split(',') if s]

    def emit(stage, ms):
        print(json.dumps({'mesh': name, 'faces': F, 'route': route,
                          'stage': stage, 'ms': round(ms, 3)}), flush=True)

    def want(stage):
        return not only or stage in only

    if route == 'pxt':
        from jrender_tpu.ops.softras import pxt_impl
        from jrender_tpu.ops.softras.pxg_impl import _mt_pxg, _pxg_tile_for
        t = _pxg_tile_for(is_)

        def f_bin(x):
            lists = build_tile_lists_compact(x, is_, t, t, p.threshold,
                                             _mt_pxg(F))
            return (lists.counts.sum().astype(jnp.float32)
                    + lists.faces_sorted[0, 0].astype(jnp.float32))
        if want('binning'):
            emit('binning', timed(f_bin, (fv,)))

        def f_prep(x):
            pr = pxt_impl.prep_pxt(x, tex, p)
            return (pr['face'][0, 0, 0] + pr['lim'][0].astype(jnp.float32)
                    + pr['ids'][0, 0, 0].astype(jnp.float32))
        if want('prep'):
            emit('prep', timed(f_prep, (fv,)))

        prep = pxt_impl.prep_pxt(fv, tex, p)
        out, ag, aux = pxt_impl.soft_rasterize_fwd_pxt(fv, tex, p, True,
                                                       prep)

        # tie the prep's face rows to the carry-scaled input at below-
        # f32 resolution: numerics unchanged, but XLA cannot hoist the
        # kernel out of the timing scan
        def f_fwd(x):
            pr = dict(prep)
            pr['face'] = pr['face'] * (1.0 + x[0, 0, 0] * 1e-40)
            o, a_, au = pxt_impl.soft_rasterize_fwd_pxt(fv, tex, p, True, pr)
            return o[0, 0, 0, 0] + a_[0, 0, 0, 0]
        if want('fwd_given_prep'):
            emit('fwd_given_prep', timed(f_fwd, (fv,)))

        # thr-off variant isolates the in-kernel top-K bisect cost
        def f_fwd_nothr(x):
            pr = dict(prep)
            pr['face'] = pr['face'] * (1.0 + x[0, 0, 0] * 1e-40)
            o, a_, au = pxt_impl.soft_rasterize_fwd_pxt(fv, tex, p, False, pr)
            return o[0, 0, 0, 0] + a_[0, 0, 0, 0]
        if want('fwd_given_prep_nothr'):
            emit('fwd_given_prep_nothr', timed(f_fwd_nothr, (fv,)))

        # pass every array as an argument: closed-over arrays embed as
        # HLO constants and the axon remote_compile request body blows
        # its length limit (observed HTTP 413 on the large mesh's aux)
        import jax.tree_util as jtu
        leaves, tree = jtu.tree_flatten((g, fv, tex, out, ag, aux, prep))

        def f_bwd(*ls):
            g_, fv_, tex_, out_, ag_, aux_, prep_ = jtu.tree_unflatten(
                tree, ls)
            gf, gt = pxt_impl.soft_rasterize_bwd_pxt(
                fv_, tex_, out_, ag_, aux_, g_, p, prep_)
            return gf[0, 0, 0] + gt[0, 0, 0, 0]
        if want('bwd_given_prep'):
            emit('bwd_given_prep', timed(f_bwd, tuple(leaves)))
    elif route == 'dir':
        from jrender_tpu.ops.softras import dir_impl

        def f_prep(x):
            pr = dir_impl.prep_dir(x, tex, p)
            return pr['tab'][0, 0, 0] + pr['bbox'][0, 0, 0]
        emit('prep', timed(f_prep, (fv,)))

        prep = dir_impl.prep_dir(fv, tex, p)
        out, ag, aux = dir_impl.soft_rasterize_fwd_dir(fv, tex, p, True,
                                                       prep)

        def f_fwd(x):
            pr = dir_impl.prep_dir(x, tex, p)
            o, a_, au = dir_impl.soft_rasterize_fwd_dir(fv, tex, p, True, pr)
            return o[0, 0, 0, 0] + pr['tab'][0, 0, 0] * 1e-32
        emit('prep_plus_fwd', timed(f_fwd, (fv,)))

        def f_bwd(g_):
            gf, gt = dir_impl.soft_rasterize_bwd_dir(
                fv, tex, out, ag, aux, g_, p, prep)
            return gf[0, 0, 0] + gt[0, 0, 0, 0]
        emit('bwd_given_prep', timed(f_bwd, (g,)))

    def one(x, t_):
        img = soft_rasterize(x, t_, image_size=is_, sigma_val=1e-5,
                             gamma_val=1e-4)
        return jnp.sum(img)

    grad_fn = jax.grad(one, argnums=(0, 1))

    def f_e2e(x):
        gf, gt = grad_fn(x, tex)
        return gf[0, 0, 0] + gt[0, 0, 0, 0]
    if want('e2e_grad'):
        emit('e2e_grad', timed(f_e2e, (fv,)))


if __name__ == '__main__':
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    names = sys.argv[1:] or ['small', 'middle', 'large']
    for n in names:
        run(n)
