"""Headline benchmark: SoftRas forward+backward, 1024x1024, ~39k-face mesh.

Mirrors the reference's README benchmark (README.md:63-69: jrender does
35.5 ms/frame fwd+bwd on the "large (39k tris)" mesh at 1024^2 on an
unstated GPU — BASELINE.md).  Prints ONE JSON line:
  {"metric": ..., "value": ms, "unit": "ms/frame", "vs_baseline": speedup}

The mesh is a UV-sphere with 39,474 triangles (on-screen, spot-like
face footprint), textured with R=5 surface textures (demo1's setting),
rendered with the default euclidean/softmax/prod config; the timed step
is grad(sum(rgba)) wrt vertices AND textures — the same fwd+bwd the
reference times.  Chained on-device via lax.scan so host/tunnel latency
is excluded.
"""
import json
import time
import functools

import numpy as np

BASELINE_MS = 35.5
IMAGE_SIZE = 1024
RINGS = 130
SEGS = 153  # 2*SEGS*(RINGS-1) = 39,474 faces

# reference README.md:63-69 — all three mesh rows; the large row is the
# headline and is printed LAST (the driver parses the final JSON line).
ROWS = [
    ('small', 13, 12, 7.3),     # 288 tris
    ('middle', 38, 45, 11.5),   # 3,330 tris
    ('spot', None, None, None),  # real scanned mesh (subdivided), no ref row
    ('large', RINGS, SEGS, BASELINE_MS),
]

SPOT_OBJ = '/root/reference/data/obj/spot/spot_triangulated.obj'


def subdivide(verts, faces):
    """One midpoint (1:4) subdivision — turns spot's 5,856 tris into a
    23.4k-tri real-geometry benchmark mesh (non-uniform face sizes, real
    curvature: the honest counterpart to the synthetic UV sphere)."""
    import numpy as np
    edges = {}
    vs = [v for v in verts]

    def mid(a, b):
        k = (min(a, b), max(a, b))
        if k not in edges:
            edges[k] = len(vs)
            vs.append((verts[a] + verts[b]) * 0.5)
        return edges[k]

    out = []
    for a, b, c in faces:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        out += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
    return (np.asarray(vs, np.float32),
            np.asarray(out, np.int32))


def spot_mesh():
    from jrender_tpu.io import load_obj
    v, f = load_obj(SPOT_OBJ, load_texture=False)[:2]
    import numpy as np
    v = np.asarray(v, np.float32)
    f = np.asarray(f, np.int32)
    v = (v - v.mean(0)) / np.abs(v - v.mean(0)).max() * 0.85
    return subdivide(v, f)


def uv_sphere(rings=RINGS, segs=SEGS, radius=0.85):
    """UV sphere triangulation: [V,3], [F,3] (realistic small faces)."""
    vs = []
    for r in range(rings + 1):
        phi = np.pi * r / rings
        for s in range(segs):
            th = 2 * np.pi * s / segs
            vs.append([np.sin(phi) * np.cos(th) * radius,
                       np.cos(phi) * radius,
                       np.sin(phi) * np.sin(th) * radius])
    vs = np.asarray(vs, np.float32)
    fs = []
    for r in range(rings):
        for s in range(segs):
            a = r * segs + s
            b = r * segs + (s + 1) % segs
            c = (r + 1) * segs + s
            d = (r + 1) * segs + (s + 1) % segs
            if r > 0:
                fs.append([a, b, c])
            if r < rings - 1:
                fs.append([b, d, c])
    return vs, np.asarray(fs, np.int32)


def _probe_backend(timeout=240):
    """Fail fast if the device claim would hang (e.g. TPU tunnel down).

    A dead tunnel makes jax.devices() block forever with no error; probing
    in a subprocess with a timeout turns that into a clean failure instead
    of a silently hung benchmark run."""
    import subprocess
    import sys
    try:
        subprocess.run([sys.executable, '-c', 'import jax; jax.devices()'],
                       timeout=timeout, check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        print(f'bench.py: device claim hung for {timeout}s '
              '(TPU tunnel down?) — aborting', file=sys.stderr)
        sys.exit(1)
    except subprocess.CalledProcessError:
        pass  # claim errored quickly; let the real import surface it


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.softras import soft_rasterize

    for name, rings, segs, baseline in ROWS:
        if name == 'spot':
            import os
            if not os.path.exists(SPOT_OBJ):
                continue
            verts, faces = spot_mesh()
        else:
            verts, faces = uv_sphere(rings=rings, segs=segs)
        mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
        v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
        fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
        tex = jax.random.uniform(jax.random.PRNGKey(0),
                                 (1, fv.shape[1], 25, 3))
        F = fv.shape[1]

        def one(x, t):
            img = soft_rasterize(x, t, image_size=IMAGE_SIZE, sigma_val=1e-5,
                                 gamma_val=1e-4)
            return jnp.sum(img)

        grad_fn = jax.grad(one, argnums=(0, 1))

        @functools.partial(jax.jit, static_argnums=(2,))
        def many(x, t, n):
            # The carry perturbs the inputs below f32 resolution each step
            # so the per-iteration grad is NOT loop-invariant — XLA must
            # execute it n times (a carry-free body gets hoisted out of the
            # scan and times 1/n of the real cost).
            def body(c, _):
                gf, gt = grad_fn(x * (1.0 + c), t)
                return c + gf[0, 0, 0] * 1e-32, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        # warmup / compile (both trip counts)
        n1, n2 = 2, 12
        assert np.isfinite(float(many(fv, tex, n1))), 'non-finite gradients'
        float(many(fv, tex, n2))

        # two-point timing cancels the constant dispatch/tunnel overhead:
        # per-frame = (T(n2) - T(n1)) / (n2 - n1)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            float(many(fv, tex, n1))
            t1 = time.time()
            float(many(fv, tex, n2))
            t2 = time.time()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)

        row = {
            'metric': f'softras_fwd_bwd_{IMAGE_SIZE}px_{F}faces'
                      + ('_spot' if name == 'spot' else ''),
            'value': round(best, 2),
            'unit': 'ms/frame',
        }
        # the spot row is a real-geometry honesty check with no
        # reference number (the reference's meshes are unspecified)
        if baseline is not None:
            row['vs_baseline'] = round(baseline / best, 3)
        print(json.dumps(row))


if __name__ == '__main__':
    main()
