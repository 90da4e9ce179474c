"""Micro-benchmark: what does a px_f-style grid step actually cost?

Variants (grid=(N,) steps, [T2, FB] pair arrays):
  pairXX    : XX chained elementwise passes on [T2,FB]
  faceYY    : + YY per-face [1,FB] ops before the pair chain
  sliceYY   : + YY [1,FB] *slices* of the input block (no arithmetic)
  dotD      : + D small MXU dots [4,FB]x[T2,FB]
"""
import sys
import functools
import time

import numpy as np

sys.path.insert(0, '/root/repo')
from bench import _probe_backend

T2 = 1024
FB = 128
N = 838


def build(n_pair, n_face, n_slice, n_dot, T2=T2):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(data_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros((T2, 1), jnp.float32)

        face = data_ref[0]                        # [C, FB]
        rows = []
        for j in range(n_slice):
            rows.append(face[j % 16:j % 16 + 1, :])
        f = face[0:1, :]
        for j in range(n_face):
            f = f * 1.0000001 + 0.0000001 * (j + 1)
        x = jnp.broadcast_to(f, (T2, FB)) + 1.0
        for r in rows:
            x = x + r
        for j in range(n_pair):
            x = x * 1.0000001 + 1e-9
        d = jnp.zeros((4, T2), jnp.float32)
        for j in range(n_dot):
            d = d + jax.lax.dot_general(
                face[0:4, :], x, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        acc[:] = acc[:] + jnp.sum(x, -1, keepdims=True) + \
            jnp.sum(d[0:1, :]) * jnp.ones((T2, 1), jnp.float32)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    @jax.jit
    def run(data):
        return pl.pallas_call(
            kernel,
            grid=(N,),
            in_specs=[pl.BlockSpec((1, 16, FB), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T2, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T2, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((T2, 1), jnp.float32)],
        )(data)
    return run


def timeit(fn, data):
    import jax
    fn(data).block_until_ready()
    best = np.inf
    for _ in range(5):
        t0 = time.time()
        fn(data).block_until_ready()
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    data = jax.random.uniform(jax.random.PRNGKey(0), (N, 16, FB), jnp.float32)
    cases = [
        ('pair20', (20, 0, 0, 0)),
        ('pair100', (100, 0, 0, 0)),
        ('pair300', (300, 0, 0, 0)),
        ('pair20_face90', (20, 90, 0, 0)),
        ('pair20_slice90', (20, 0, 90, 0)),
        ('pair20_dot25', (20, 0, 0, 25)),
        ('pair100_T2=256', (100, 0, 0, 0, 256)),
        ('pair300_T2=256', (300, 0, 0, 0, 256)),
    ]
    for name, args in cases:
        fn = build(*args)
        ms = timeit(fn, data)
        print(f'{name:18s}: {ms:7.2f} ms total, {ms/N*1e3:7.2f} us/step',
              flush=True)


if __name__ == '__main__':
    main()
