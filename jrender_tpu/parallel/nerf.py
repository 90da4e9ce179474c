"""Multi-device NeRF training: rays data-parallel + MLP tensor-parallel.

Rays shard over the mesh 'data' axis (the reference's implicit jt.mpi
data parallelism, demo7-nerf.py:357-359); hidden-layer weights shard
over 'model' (tensor parallel the reference never had).  Gradients are
reduced by XLA-inserted psums from the sharding annotations — no manual
collectives.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nerf.model import nerf_apply, img2mse
from ..vol.ray_marching import render_rays


def _param_spec(path_leaf_shape):
    """Hidden weights shard their output-feature dim over 'model'."""
    name, shape = path_leaf_shape
    if name.endswith('w') and len(shape) == 2 and shape[1] % 2 == 0 and shape[1] >= 64:
        return P(None, 'model')
    if name.endswith('b') and len(shape) == 1 and shape[0] % 2 == 0 and shape[0] >= 64:
        return P('model')
    return P()


def shard_nerf_params(params, mesh: Mesh):
    """Apply tensor-parallel shardings to a NeRF params pytree."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        name = str(path[-1])
        spec = _param_spec((name, leaf.shape))
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def make_sharded_nerf_step(optimizer, network_query_fn, mesh: Mesh,
                           N_samples=32, N_importance=0, white_bkgd=False):
    """Jitted train step with rays sharded over 'data'.

    The sharding of inputs drives XLA's partitioner: per-device ray chunks
    render locally; parameter gradients are all-reduced automatically.
    """
    ray_sharding = NamedSharding(mesh, P('data'))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, ray_batch, target, key):
        ray_batch = jax.lax.with_sharding_constraint(ray_batch, ray_sharding)
        target = jax.lax.with_sharding_constraint(target, ray_sharding)

        def loss_fn(p):
            out = render_rays(ray_batch, p['coarse'],
                              lambda pts, vd, net: network_query_fn(pts, vd, net),
                              N_samples=N_samples, N_importance=N_importance,
                              network_fine=p.get('fine'),
                              white_bkgd=white_bkgd, key=key)
            loss = img2mse(out['rgb_map'], target)
            if 'rgb0' in out:
                loss = loss + img2mse(out['rgb0'], target)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
