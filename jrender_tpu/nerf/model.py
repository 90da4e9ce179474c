"""NeRF MLP + positional encoding (pure JAX pytree params).

Reference: nerf_helper/utils.py:13-145 (Embedder :13-61, NeRF :64-116,
Keras-weight import :118-145, img2mse/mse2psnr/to8b :7-9).

TPU-first: the model is a plain params pytree + a pure apply function, so
it jits, vmaps, shards (params can be replicated or tensor-sharded over a
mesh axis) and checkpoints (orbax) without framework glue.  Matmuls are
sized for the MXU (W=256 hidden); an optional compute dtype lets the
trainer run bf16 matmuls with f32 params.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(x):
    return -10.0 * jnp.log(x) / jnp.log(jnp.asarray(10.0))


def to8b(x):
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


class Embedder:
    """Positional encoding: [x, sin(2^k x), cos(2^k x), ...]."""

    def __init__(self, include_input=True, input_dims=3, max_freq_log2=9,
                 num_freqs=10, log_sampling=True, periodic_fns=(jnp.sin, jnp.cos)):
        self.include_input = include_input
        self.input_dims = input_dims
        self.periodic_fns = periodic_fns
        if log_sampling:
            self.freq_bands = 2.0 ** jnp.linspace(0.0, max_freq_log2, num_freqs)
        else:
            self.freq_bands = jnp.linspace(2.0 ** 0.0, 2.0 ** max_freq_log2, num_freqs)
        self.out_dim = (input_dims if include_input else 0) + \
            num_freqs * len(periodic_fns) * input_dims

    def embed(self, inputs):
        outs = [inputs] if self.include_input else []
        # vectorized over all frequencies at once: [..., F, d] -> flatten
        scaled = inputs[..., None, :] * self.freq_bands[:, None]
        for fn in self.periodic_fns:
            outs.append(fn(scaled).reshape(inputs.shape[:-1] + (-1,)))
        return jnp.concatenate(outs, -1)


def get_embedder(multires, i=0, input_dims=3):
    if i == -1:
        return (lambda x: x), input_dims
    eo = Embedder(include_input=True, input_dims=input_dims,
                  max_freq_log2=multires - 1, num_freqs=multires,
                  log_sampling=True)
    return (lambda x: eo.embed(x)), eo.out_dim


def _linear_init(key, fan_in, fan_out):
    # match torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(k1, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(k2, (fan_out,), jnp.float32, -bound, bound)
    return {'w': w, 'b': b}


def init_nerf_params(key, D=8, W=256, input_ch=3, input_ch_views=3,
                     output_ch=4, skips=(4,), use_viewdirs=False):
    keys = jax.random.split(key, D + 8)
    params = {'pts_linears': []}
    in_dim = input_ch
    for i in range(D):
        params['pts_linears'].append(_linear_init(keys[i], in_dim, W))
        in_dim = W + input_ch if i in skips else W
    if use_viewdirs:
        params['feature_linear'] = _linear_init(keys[D], W, W)
        params['alpha_linear'] = _linear_init(keys[D + 1], W, 1)
        params['views_linears'] = [_linear_init(keys[D + 2], input_ch_views + W, W // 2)]
        params['rgb_linear'] = _linear_init(keys[D + 3], W // 2, 3)
    else:
        params['output_linear'] = _linear_init(keys[D], W, output_ch)
    return params


def _dense(p, x, dtype=None):
    w, b = p['w'], p['b']
    if dtype is not None:
        w = w.astype(dtype)
        x = x.astype(dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32) + b


def nerf_apply(params, x, input_ch=3, input_ch_views=3, skips=(4,),
               use_viewdirs=False, compute_dtype=None):
    """Apply the NeRF MLP to x = [pts_embedded, views_embedded]."""
    input_pts = x[..., :input_ch]
    input_views = x[..., input_ch:input_ch + input_ch_views]
    h = input_pts
    for i, layer in enumerate(params['pts_linears']):
        h = jax.nn.relu(_dense(layer, h, compute_dtype))
        if i in skips:
            h = jnp.concatenate([input_pts, h], -1)
    if use_viewdirs:
        alpha = _dense(params['alpha_linear'], h, compute_dtype)
        feature = _dense(params['feature_linear'], h, compute_dtype)
        h = jnp.concatenate([feature, input_views], -1)
        for layer in params['views_linears']:
            h = jax.nn.relu(_dense(layer, h, compute_dtype))
        rgb = _dense(params['rgb_linear'], h, compute_dtype)
        return jnp.concatenate([rgb, alpha], -1)
    return _dense(params['output_linear'], h, compute_dtype)


class NeRF:
    """Object wrapper mirroring the reference NeRF module API."""

    def __init__(self, D=8, W=256, input_ch=3, input_ch_views=3, output_ch=4,
                 skips=(4,), use_viewdirs=False, key=None):
        self.D = D
        self.W = W
        self.input_ch = input_ch
        self.input_ch_views = input_ch_views
        self.skips = tuple(skips)
        self.use_viewdirs = use_viewdirs
        if key is None:
            key = jax.random.PRNGKey(0)
        self.params = init_nerf_params(key, D, W, input_ch, input_ch_views,
                                       output_ch, self.skips, use_viewdirs)

    def __call__(self, x, params=None):
        return nerf_apply(self.params if params is None else params, x,
                          self.input_ch, self.input_ch_views, self.skips,
                          self.use_viewdirs)

    def load_weights_from_keras(self, weights):
        """Import official Keras weights (utils.py:118-145)."""
        assert self.use_viewdirs, 'Not implemented if use_viewdirs=False'
        for i in range(self.D):
            self.params['pts_linears'][i] = {
                'w': jnp.asarray(weights[2 * i]),
                'b': jnp.asarray(weights[2 * i + 1]).reshape(-1)}
        iD = 2 * self.D
        self.params['feature_linear'] = {'w': jnp.asarray(weights[iD]),
                                         'b': jnp.asarray(weights[iD + 1]).reshape(-1)}
        self.params['views_linears'][0] = {'w': jnp.asarray(weights[iD + 2]),
                                           'b': jnp.asarray(weights[iD + 3]).reshape(-1)}
        self.params['rgb_linear'] = {'w': jnp.asarray(weights[iD + 4]),
                                     'b': jnp.asarray(weights[iD + 5]).reshape(-1)}
        self.params['alpha_linear'] = {'w': jnp.asarray(weights[iD + 6]),
                                       'b': jnp.asarray(weights[iD + 7]).reshape(-1)}
