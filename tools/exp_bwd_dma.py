"""Design probe for the pxg backward glue replacement.

Questions answered on the real chip (N grid steps ~ the 39k-face mesh's
w_cap, block shapes matching the real backward):
  base      : kernel that reads one [C,128] face block + writes [84,128]
              grads (per-step pipeline floor, no px work)
  dma16     : + 16 per-group DMAs of [16,256] px rows into a c-major
              slab [16, GPI, 256] (dest indexed on the MIDDLE dim)
  dma1r     : + ONE ranged DMA of [NTR,16,256] rows into an r-major slab
  tr256     : + one [256,256] in-kernel transpose of the slab view
  tr256x11  : + 11 separate [16,256]->[256,16] transposes instead
  dots      : + 11 static-slice [T2,GPI] @ em [GPI,FB] HIGHEST dots
"""
import sys
import time
import functools

import numpy as np

sys.path.insert(0, '/root/repo')
from bench import _probe_backend

T2 = 256
FB = 128
GPI = 16
NTR = 18
N = 3973        # ~ w_cap of the 39k bench mesh
NTT = 4096


def build(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seg_s, lim_s, face_ref, px_hbm, gout_ref, slab, sem):
        i = pl.program_id(0)
        face = face_ref[0]                       # [C, FB]

        acc = jnp.broadcast_to(face[0:1, :], (T2, FB)) * 1e-6

        if variant in ('dma16', 'tr256', 'tr256x11', 'dots'):
            for g in range(GPI):
                cp = pltpu.make_async_copy(
                    px_hbm.at[seg_s[i * GPI + g]], slab.at[:, g, :], sem)
                cp.start()
                cp.wait()
        elif variant == 'dma1r':
            cp = pltpu.make_async_copy(
                px_hbm.at[pl.ds(seg_s[i * GPI], NTR)],
                slab.at[pl.ds(0, NTR)], sem)
            cp.start()
            cp.wait()

        if variant in ('tr256', 'dots'):
            px2 = jax.lax.transpose(
                slab[:].reshape(GPI * GPI, T2), (1, 0))   # [256, 256]
            acc = acc + px2[:, 0:FB] * 1e-6
        if variant == 'tr256x11':
            for c in range(11):
                xc = jax.lax.transpose(slab[:, :, 0][c:c + 1].reshape(
                    1, T2), (1, 0))
                acc = acc + xc * 1e-6
        if variant == 'dots':
            il = jax.lax.broadcasted_iota(jnp.int32, (GPI, FB), 1)
            ig = jax.lax.broadcasted_iota(jnp.int32, (GPI, FB), 0)
            em = (il // 8 == ig).astype(jnp.float32)
            for c in range(11):
                xc = px2[:, c * GPI:(c + 1) * GPI]        # [T2, GPI]
                acc = acc + jax.lax.dot_general(
                    xc, em, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)

        s = jnp.sum(acc, axis=0, keepdims=True)           # [1, FB]
        gout_ref[0] = jnp.broadcast_to(s, (84, FB))

    if variant in ('dma1r',):
        slab_shape = pltpu.VMEM((NTR, GPI, T2), jnp.float32)
    else:
        slab_shape = pltpu.VMEM((GPI, GPI, T2), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 106, FB), lambda i, s, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[pl.BlockSpec((1, 84, FB), lambda i, s, l: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[slab_shape, pltpu.SemaphoreType.DMA(())],
    )

    @jax.jit
    def run(seg, lim, face, px):
        (gout,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((N, 84, FB), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(seg, lim, face, px)
        return gout[0, 0, 0] + gout[N - 1, 0, 0]

    return run


def scan_timed(fn, x0, *rest, n1=2, n2=10):
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

    key = jax.random.PRNGKey(0)
    face = jax.random.uniform(key, (N, 106, FB), jnp.float32)
    px = jax.random.uniform(key, (NTT + NTR, GPI, T2), jnp.float32)
    # sorted non-decreasing segment ids, ~16 groups per tile
    seg = np.sort(np.random.randint(0, NTT, size=(N * GPI,))
                  ).astype(np.int32)
    seg = jnp.asarray(seg)
    lim = jnp.full((1,), N, jnp.int32)

    for variant in ('base', 'dma16', 'dma1r', 'tr256', 'tr256x11', 'dots'):
        try:
            run = build(variant)
            ms = scan_timed(lambda f, s, l, p: run(s, l, f, p),
                            face, seg, lim, px)
            print(f'{variant:10s}: {ms:8.3f} ms  '
                  f'({ms / N * 1e3:.3f} us/item)')
        except Exception as e:
            print(f'{variant:10s}: FAILED {type(e).__name__}: '
                  f'{str(e)[:200]}')


if __name__ == '__main__':
    main()
