"""NeRF trainer — functional equivalent of the reference demo7-nerf.py.

Reference behaviors reproduced (demo7-nerf.py):
  * create_nerf: embedders, coarse+fine MLPs, Adam, checkpoint discovery
    and restore (:94-182) — checkpoints via orbax.
  * train loop: pre-shuffled ray batching or per-image sampling with
    precrop (:504-563), MSE + coarse-branch aux loss (:569-577),
    exponential LR decay (:583-588), PSNR logging, periodic checkpoint /
    video / testset renders (:594-647).

TPU-first: the whole optimization step (ray sampling -> hierarchical
render -> loss -> Adam update) is one jitted function, and
``steps_per_dispatch`` steps are fused with lax.scan per dispatch so
host-device latency is amortized; rays shard over the device mesh's
data axis (the jt.mpi replacement — SURVEY.md §2.4).
"""
from __future__ import annotations

import contextlib
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import dataset
from .model import get_embedder, init_nerf_params, nerf_apply, img2mse, mse2psnr, to8b  # noqa: F401
from ..vol import render_pass
from ..vol.camera import pinhole_get_rays


def make_network_query_fn(embed_fn, embeddirs_fn, input_ch, input_ch_views,
                          skips, use_viewdirs, netchunk=1024 * 64,
                          compute_dtype=None):
    """Embeds points (+dirs) and evaluates the MLP, chunked via lax.map.

    compute_dtype=jnp.bfloat16 runs the MLP matmuls in bf16 on the MXU
    (params stay f32; dot accumulation stays f32 via
    preferred_element_type) — the TPU mixed-precision training path."""

    def query(pts, viewdirs, params):
        sh = pts.shape
        flat = pts.reshape(-1, sh[-1])
        embedded = embed_fn(flat)
        if viewdirs is not None:
            dirs = jnp.broadcast_to(viewdirs[:, None, :], sh[:-1] + (viewdirs.shape[-1],))
            embedded = jnp.concatenate([embedded, embeddirs_fn(dirs.reshape(-1, dirs.shape[-1]))], -1)

        def apply(x):
            return nerf_apply(params, x, input_ch, input_ch_views, skips,
                              use_viewdirs, compute_dtype=compute_dtype)

        N = embedded.shape[0]
        if N <= netchunk:
            out = apply(embedded)
        else:
            n_chunks = (N + netchunk - 1) // netchunk
            pad = n_chunks * netchunk - N
            emb = jnp.pad(embedded, ((0, pad), (0, 0)))
            out = jax.lax.map(apply, emb.reshape(n_chunks, netchunk, -1))
            out = out.reshape(-1, out.shape[-1])[:N]
        return out.reshape(sh[:-1] + (out.shape[-1],))

    return query


def create_nerf(args, key=None):
    """Instantiate embedders, MLP params, optimizer, and render kwargs."""
    if key is None:
        key = jax.random.PRNGKey(args.seed)
    # embed_depth appends the sample depth as a 4th embedded coordinate
    # (demo7-nerf.py:96-101; rayMarching.py:57)
    input_dims = 4 if getattr(args, 'embed_depth', False) else 3
    embed_fn, input_ch = get_embedder(args.multires, args.i_embed, input_dims)
    input_ch_views = 0
    embeddirs_fn = None
    if args.use_viewdirs:
        embeddirs_fn, input_ch_views = get_embedder(args.multires_views, args.i_embed)
    output_ch = 5 if args.N_importance > 0 else 4
    skips = (4,)

    k1, k2 = jax.random.split(key)
    params = {'coarse': init_nerf_params(k1, args.netdepth, args.netwidth,
                                         input_ch, input_ch_views, output_ch,
                                         skips, args.use_viewdirs)}
    if args.N_importance > 0:
        params['fine'] = init_nerf_params(k2, args.netdepth_fine, args.netwidth_fine,
                                          input_ch, input_ch_views, output_ch,
                                          skips, args.use_viewdirs)

    compute_dtype = (jnp.bfloat16
                     if getattr(args, 'net_precision', 'f32') == 'bf16'
                     else None)
    network_query_fn = make_network_query_fn(embed_fn, embeddirs_fn, input_ch,
                                             input_ch_views, skips,
                                             args.use_viewdirs, args.netchunk,
                                             compute_dtype=compute_dtype)

    render_kwargs_train = {
        'network_query_fn': network_query_fn,
        'perturb': args.perturb,
        'N_importance': args.N_importance,
        'N_samples': args.N_samples,
        'use_viewdirs': args.use_viewdirs,
        'white_bkgd': args.white_bkgd,
        'raw_noise_std': args.raw_noise_std,
        'embed_depth': getattr(args, 'embed_depth', False),
    }
    if args.dataset_type != 'llff' or args.no_ndc:
        render_kwargs_train['ndc'] = False
        render_kwargs_train['lindisp'] = args.lindisp
    render_kwargs_test = {k: v for k, v in render_kwargs_train.items()}
    render_kwargs_test['perturb'] = 0.0
    render_kwargs_test['raw_noise_std'] = 0.0

    # optimizer with the reference's exponential decay (:583-588)
    decay_steps = args.lrate_decay * 1000
    schedule = optax.exponential_decay(args.lrate, decay_steps, 0.1)
    optimizer = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-7)
    acc = max(1, int(getattr(args, 'accumulation_steps', 1)))
    if acc > 1:
        # real gradient accumulation (demo7-nerf.py:457-458,579-585 builds
        # the same machinery with accumulation_steps hardcoded to 1): each
        # micro-step carries N_rand/acc rays, grads average over acc
        # micro-steps, and Adam applies once per acc.  MultiSteps' inner
        # count advances once per real update, so the decay schedule needs
        # no acc rescaling (the reference scales decay_steps by acc only
        # because its counter counts micro-iterations).
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=acc)

    # checkpoint discovery/restore (:136-155)
    start = 0
    ckpt_dir = os.path.join(args.basedir, args.expname, 'ckpts')
    if args.ft_path is not None and args.ft_path != 'None':
        ckpts = [args.ft_path]
    else:
        ckpts = sorted([os.path.join(ckpt_dir, f) for f in
                        (os.listdir(ckpt_dir) if os.path.exists(ckpt_dir) else [])])
    opt_state = optimizer.init(params)
    if len(ckpts) > 0 and not args.no_reload:
        print('Reloading from', ckpts[-1])
        params, opt_state, start = restore_checkpoint(ckpts[-1], params, opt_state)

    return render_kwargs_train, render_kwargs_test, start, params, optimizer, opt_state


def save_checkpoint(ckpt_dir, step, params, opt_state):
    """Persist step + params + optimizer state (demo7-nerf.py:594-602 saves
    the Adam state dict too; resume must not reset moments)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f'{step:09d}'))
    ckptr = ocp.PyTreeCheckpointer()
    # optax states are namedtuple pytrees; orbax restores them as plain
    # dict/list trees, so store the leaves and rebuild with the caller's
    # treedef on restore.
    opt_leaves = jax.tree_util.tree_leaves(opt_state)
    ckptr.save(path, {'step': step, 'params': params,
                      'opt_leaves': list(opt_leaves)}, force=True)
    return path


def restore_checkpoint(path, params, opt_state):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    step = int(np.asarray(restored['step']))
    if 'opt_leaves' in restored and restored['opt_leaves'] is not None:
        treedef = jax.tree_util.tree_structure(opt_state)
        leaves = [restored['opt_leaves'][k] for k in
                  sorted(restored['opt_leaves'], key=int)] \
            if isinstance(restored['opt_leaves'], dict) else list(restored['opt_leaves'])
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return restored['params'], opt_state, step


def render_full_image(H, W, focal, c2w, params, render_kwargs, chunk=1024 * 32,
                      intrinsic=None, near=2.0, far=6.0, ndc=False):
    kwargs = dict(render_kwargs)
    nq = kwargs.pop('network_query_fn')
    kwargs.pop('ndc', None)
    rgb, disp, acc, _ = render_pass.render(
        H, W, focal, chunk=chunk, c2w=jnp.asarray(c2w)[:3, :4],
        intrinsic=intrinsic, ndc=ndc,
        network_fn=params['coarse'],
        network_fine=params.get('fine'),
        network_query_fn=nq,
        near=near, far=far, **kwargs)
    return rgb, disp, acc


def render_path(poses, hwf, params, render_kwargs, chunk=1024 * 32,
                near=2.0, far=6.0, ndc=False, render_factor=0, savedir=None):
    """Render a pose path (spiral video / testset; demo7-nerf.py:604-647)."""
    from .model import to8b
    H, W, focal = int(hwf[0]), int(hwf[1]), hwf[2]
    if render_factor > 0:
        H, W, focal = H // render_factor, W // render_factor, focal / render_factor
    rgbs = []
    for i, c2w in enumerate(poses):
        rgb, disp, acc = render_full_image(H, W, focal, c2w, params,
                                           render_kwargs, chunk, near=near,
                                           far=far, ndc=ndc)
        frame = to8b(np.asarray(rgb))
        rgbs.append(frame)
        if savedir is not None:
            import imageio.v2 as imageio
            imageio.imwrite(os.path.join(savedir, f'{i:03d}.png'), frame)
    return np.stack(rgbs, 0)


def make_train_step(optimizer, render_kwargs, H, W, focal, near, far,
                    N_rand, precrop_iters, precrop_frac, ndc,
                    valid_ratio=-1.0):
    """One fused train step: sample rays from one image, render, update.

    ``valid_ratio >= 0`` enables the reference's mask-guided sampling
    (demo7-nerf.py:545-563): when an image's valid (mask>0) pixels are a
    minority, draw ``N_rand*valid_ratio`` rays from valid pixels and the
    rest from invalid ones — implemented as a single Gumbel-top-k sort so
    it stays jittable (without-replacement, like the reference's
    np.random.choice(replace=False)).
    """
    kwargs = dict(render_kwargs)
    network_query_fn = kwargs.pop('network_query_fn')
    use_viewdirs = kwargs.get('use_viewdirs', False)

    def step_fn(params, opt_state, image, pose, step, key, mask=None):
        k_sel, k_render = jax.random.split(key)
        rays_o, rays_d = pinhole_get_rays(H, W, focal, pose)
        in_precrop = step < precrop_iters
        dH = int(H // 2 * precrop_frac)
        dW = int(W // 2 * precrop_frac)

        if valid_ratio >= 0.0 and mask is not None:
            # Mask-guided valid-ratio sampling (demo7-nerf.py:545-563).
            yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing='ij')
            in_window = jnp.where(
                in_precrop,
                (yy >= H // 2 - dH) & (yy < H // 2 + dH) &
                (xx >= W // 2 - dW) & (xx < W // 2 + dW),
                jnp.ones((H, W), bool))
            valid = (mask[..., 0] > 0.0) & in_window
            invalid = (mask[..., 0] == 0.0) & in_window
            n_valid = jnp.sum(valid)
            n_invalid = jnp.sum(invalid)
            # reference falls back to uniform when valid pixels dominate
            uniform = n_valid > n_invalid
            sample_size = jnp.minimum(int(N_rand * valid_ratio), n_valid)
            sample_size = jnp.where(uniform, 0, sample_size)
            g = jax.random.gumbel(k_sel, (H * W,))
            # three tiers: valid > invalid > outside-window; within a tier
            # the gumbel noise orders pixels uniformly at random, so taking
            # prefixes = without-replacement sampling per tier.
            score = g + jnp.where(valid.reshape(-1), 2e4,
                                  jnp.where(invalid.reshape(-1), 0.0, -2e4))
            order = jnp.argsort(-score)
            j = jnp.arange(N_rand)
            # invalid-tier index clamped INSIDE the window (<= n_valid +
            # n_invalid - 1): when the window has fewer invalid pixels
            # than requested this duplicates the last one rather than
            # spilling into the outside-window tier
            in_window_last = jnp.maximum(n_valid + n_invalid - 1, 0)
            pick = jnp.where(
                uniform,
                order[j],  # uniform over the window (valid first is fine: all tiers random)
                jnp.where(j < sample_size, order[j],
                          order[jnp.clip(n_valid + (j - sample_size), 0,
                                         in_window_last)]))
            # For the uniform branch the reference samples uniformly over the
            # window; tiered `order` is not uniform across tiers, so redraw:
            u_flat = jnp.argsort(-(g + jnp.where(in_window.reshape(-1), 0.0, -2e4)))
            pick = jnp.where(uniform, u_flat[j], pick)
            ys, xs = pick // W, pick % W
        else:
            # precrop-aware pixel selection (demo7-nerf.py:526-544)
            hy = jax.random.randint(k_sel, (N_rand,), 0, 2 * dH)
            hx = jax.random.randint(jax.random.fold_in(k_sel, 1), (N_rand,), 0, 2 * dW)
            fy = jax.random.randint(jax.random.fold_in(k_sel, 2), (N_rand,), 0, H)
            fx = jax.random.randint(jax.random.fold_in(k_sel, 3), (N_rand,), 0, W)
            ys = jnp.where(in_precrop, H // 2 - dH + hy, fy)
            xs = jnp.where(in_precrop, W // 2 - dW + hx, fx)

        ro = rays_o[ys, xs]
        rd = rays_d[ys, xs]
        target = image[ys, xs]

        def loss_fn(p):
            kw = dict(kwargs)
            rgb, disp, acc, extras = render_pass.render(
                H, W, focal, chunk=N_rand, rays=(ro, rd), ndc=ndc,
                near=near, far=far, key=k_render,
                network_fn=p['coarse'], network_fine=p.get('fine'),
                network_query_fn=network_query_fn, **kw)
            loss = img2mse(rgb, target)
            psnr = mse2psnr(loss)
            if 'rgb0' in extras:
                loss = loss + img2mse(extras['rgb0'], target)
            return loss, psnr

        (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, psnr

    return step_fn


def make_scan_train(step_fn, steps_per_dispatch, with_masks=False):
    """Fuse N train steps into one dispatch with lax.scan."""

    @jax.jit
    def run(params, opt_state, images, poses, img_idx, step0, key, masks=None):
        def body(carry, i):
            params, opt_state = carry
            k = jax.random.fold_in(key, i)
            image = images[img_idx[i]]
            pose = poses[img_idx[i]]
            mask = masks[img_idx[i]] if with_masks else None
            params, opt_state, loss, psnr = step_fn(params, opt_state, image,
                                                    pose, step0 + i, k, mask)
            return (params, opt_state), (loss, psnr)

        (params, opt_state), (losses, psnrs) = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps_per_dispatch))
        return params, opt_state, losses, psnrs

    return run


def build_ray_pool(images, poses, i_train, H, W, focal):
    """Pre-compute the shuffled all-image ray pool for batched training.

    Reference: demo7-nerf.py:459-478 — rays_rgb [(N_train·H·W), 3, 3]
    stacking (ray_o, ray_d, rgb) per pixel over all training images,
    shuffled once up front.  Built in numpy on host, shipped to device
    once.
    """
    pools = []
    for i in np.asarray(i_train):
        ro, rd = pinhole_get_rays(H, W, focal, jnp.asarray(poses[i][:3, :4]))
        pools.append(np.stack([np.asarray(ro), np.asarray(rd),
                               np.asarray(images[i][..., :3])], 2))  # [H,W,3,3]
    pool = np.concatenate([p.reshape(-1, 3, 3) for p in pools], 0)
    return pool.astype(np.float32)


def make_batched_train_step(optimizer, render_kwargs, H, W, focal, near, far,
                            N_rand, ndc):
    """One train step drawing rays from the pre-shuffled global ray pool
    (demo7-nerf.py:509-520): sequential N_rand slices through a device-held
    permutation of the pool."""
    kwargs = dict(render_kwargs)
    network_query_fn = kwargs.pop('network_query_fn')

    def step_fn(params, opt_state, pool, perm, offset, key):
        idx = jax.lax.dynamic_slice(perm, (offset,), (N_rand,))
        batch = pool[idx]                      # [N_rand, 3, 3]
        ro, rd, target = batch[:, 0], batch[:, 1], batch[:, 2]

        def loss_fn(p):
            kw = dict(kwargs)
            rgb, disp, acc, extras = render_pass.render(
                H, W, focal, chunk=N_rand, rays=(ro, rd), ndc=ndc,
                near=near, far=far, key=key,
                network_fn=p['coarse'], network_fine=p.get('fine'),
                network_query_fn=network_query_fn, **kw)
            loss = img2mse(rgb, target)
            psnr = mse2psnr(loss)
            if 'rgb0' in extras:
                loss = loss + img2mse(extras['rgb0'], target)
            return loss, psnr

        (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, psnr

    return step_fn


def make_batched_scan_train(step_fn, steps_per_dispatch, N_rand):
    """Fuse N batched steps per dispatch.  Offsets advance strictly
    sequentially through `perm` — the caller sizes perm so a dispatch
    never runs off its end (see train(): perm concatenates enough
    independent epoch permutations, matching the reference's
    reshuffle-at-epoch, demo7-nerf.py:515-519)."""

    @jax.jit
    def run(params, opt_state, pool, perm, offset0, key):
        def body(carry, i):
            params, opt_state = carry
            k = jax.random.fold_in(key, i)
            offset = offset0 + i * N_rand
            params, opt_state, loss, psnr = step_fn(params, opt_state, pool,
                                                    perm, offset, k)
            return (params, opt_state), (loss, psnr)

        (params, opt_state), (losses, psnrs) = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps_per_dispatch))
        return params, opt_state, losses, psnrs

    return run


def _make_summary_writer(expdir):
    """Tensorboard scalar/image logging (demo7-nerf.py:490-501,630-633).

    Only process index 0 writes (the jt.mpi rank-0 guard equivalent).
    Returns None if no tensorboard backend is importable.
    """
    if jax.process_index() != 0:
        return None
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        try:
            from tensorboardX import SummaryWriter
        except Exception:
            return None
    logdir = os.path.join(expdir, 'summaries')
    os.makedirs(logdir, exist_ok=True)
    return SummaryWriter(log_dir=logdir)


def train(args):
    """Full training entry point (mirrors demo7-nerf.py train())."""
    key = jax.random.PRNGKey(args.seed)

    # ---- data -------------------------------------------------------------
    masks = None
    if args.dataset_type == 'blender':
        images, poses, render_poses, hwf, i_split = dataset.load_blender_data(
            args.datadir, args.half_res, args.testskip, factor=args.blender_factor,
            do_pose_normalization=getattr(args, 'do_pose_normalization', False),
            target_radius=getattr(args, 'target_radius', 1.0))
        i_train, i_val, i_test = i_split
        # periodic eval uses every faketestskip-th test view (demo7:369)
        i_test = i_test[::max(1, getattr(args, 'faketestskip', 1))]
        near, far = 2.0, 6.0
        masks = images[..., -1:]  # alpha channel (demo7-nerf.py:381)
        if args.white_bkgd:
            images = images[..., :3] * images[..., -1:] + (1.0 - images[..., -1:])
        else:
            images = images[..., :3]
        ndc = False
    elif args.dataset_type == 'llff':
        images, poses, bds, render_poses, i_test = dataset.load_llff_data(
            args.datadir, args.factor, recenter=True, bd_factor=0.75,
            spherify=args.spherify)
        hwf = poses[0, :3, -1]
        poses = poses[:, :3, :4]
        if not isinstance(i_test, list):
            i_test = [i_test]
        if args.llffhold > 0:
            i_test = np.arange(images.shape[0])[::args.llffhold]
        i_val = i_test
        i_train = np.array([i for i in np.arange(int(images.shape[0]))
                            if (i not in i_test and i not in i_val)])
        if args.no_ndc:
            near = float(np.min(bds) * 0.9)
            far = float(np.max(bds) * 1.0)
            ndc = False
        else:
            near, far = 0.0, 1.0
            ndc = True
    elif args.dataset_type == 'deepvoxels':
        images, poses, render_poses, hwf, i_split = dataset.load_dv_data(
            scene=args.shape, basedir=args.datadir, testskip=args.testskip)
        i_train, i_val, i_test = i_split
        hemi_R = np.mean(np.linalg.norm(poses[:, :3, -1], axis=-1))
        near, far = hemi_R - 1.0, hemi_R + 1.0
        ndc = False
    else:
        raise ValueError(f'Unknown dataset type {args.dataset_type}')

    if args.near is not None:
        near = args.near
    if args.far is not None:
        far = args.far

    H, W, focal = hwf
    H, W = int(H), int(W)

    # ---- model ------------------------------------------------------------
    (render_kwargs_train, render_kwargs_test, start, params, optimizer,
     opt_state) = create_nerf(args, key)
    render_kwargs_train.pop('ndc', None)
    render_kwargs_train.pop('lindisp', None)
    render_kwargs_test.pop('ndc', None)
    lindisp = args.lindisp
    render_kwargs_train['lindisp'] = lindisp
    render_kwargs_test['lindisp'] = lindisp

    expdir = os.path.join(args.basedir, args.expname)
    os.makedirs(expdir, exist_ok=True)
    with open(os.path.join(expdir, 'args.txt'), 'w') as f:
        for k in sorted(vars(args)):
            f.write(f'{k} = {getattr(args, k)}\n')
    # reference also snapshots the raw config file (demo7-nerf.py:422-426)
    if getattr(args, 'config', None) and os.path.isfile(args.config):
        with open(args.config) as src, \
                open(os.path.join(expdir, 'config.txt'), 'w') as dst:
            dst.write(src.read())

    spd = args.steps_per_dispatch
    use_batching = not args.no_batching
    valid_ratio = getattr(args, 'valid_ratio', -1.0)
    # gradient accumulation: each micro-step carries N_rand/acc rays and
    # Adam applies every acc micro-steps (MultiSteps; demo7-nerf.py:458)
    acc = max(1, int(getattr(args, 'accumulation_steps', 1)))
    n_rand = max(1, args.N_rand // acc)
    images_d = jnp.asarray(images)
    poses_d = jnp.asarray(poses[:, :3, :4] if poses.shape[1] > 3 else poses)
    masks_d = jnp.asarray(masks) if (masks is not None and valid_ratio >= 0) else None

    if use_batching:
        # global pre-shuffled ray pool (demo7-nerf.py:459-478)
        pool_np = build_ray_pool(images, poses, i_train, H, W, focal)
        pool_size = pool_np.shape[0]
        pool_d = jnp.asarray(pool_np)
        del pool_np
        step_fn = make_batched_train_step(optimizer, render_kwargs_train, H, W,
                                          focal, near, far, n_rand, ndc)
        scan_train_b = make_batched_scan_train(step_fn, spd, n_rand)

        # perm concatenates enough INDEPENDENT epoch permutations that one
        # dispatch (spd*N_rand rays) never runs off the end — each epoch is
        # still a proper reshuffled pass over the pool even when the pool
        # is smaller than a dispatch (tiny datasets)
        n_epochs_per_perm = (spd * n_rand) // pool_size + 2

        def fresh_perm(k):
            ks = jax.random.split(k, n_epochs_per_perm)
            return jnp.concatenate(
                [jax.random.permutation(kk, pool_size) for kk in ks])

        key, kp = jax.random.split(key)
        perm_d = fresh_perm(kp)
        perm_len = n_epochs_per_perm * pool_size
        i_batch = 0
    else:
        step_fn = make_train_step(optimizer, render_kwargs_train, H, W, focal,
                                  near, far, n_rand, args.precrop_iters,
                                  args.precrop_frac, ndc, valid_ratio=valid_ratio)
        scan_train = make_scan_train(step_fn, spd,
                                     with_masks=masks_d is not None)

    writer = _make_summary_writer(expdir)

    # ---- loop -------------------------------------------------------------
    rng = np.random.RandomState(args.seed)
    global_step = start
    t0 = time.time()
    last_t, last_step = t0, global_step
    history = []
    while global_step < args.N_iters:
        key, sub = jax.random.split(key)
        # device-trace the SECOND dispatch (first is compile) when asked
        prof = contextlib.ExitStack()
        if getattr(args, 'profile_dir', '') and global_step == start + spd:
            from ..utils import profiling
            prof.enter_context(profiling.trace(args.profile_dir))
        with prof:
            if use_batching:
                params, opt_state, losses, psnrs = scan_train_b(
                    params, opt_state, pool_d, perm_d, i_batch, sub)
                i_batch += spd * n_rand
                if i_batch + spd * n_rand > perm_len:
                    # exhausted the pre-built permutations: draw fresh
                    # ones (epoch reshuffle, demo7-nerf.py:515-519)
                    key, kp = jax.random.split(key)
                    perm_d = fresh_perm(kp)
                    i_batch = 0
            else:
                img_idx = jnp.asarray(rng.choice(i_train, size=spd))
                params, opt_state, losses, psnrs = scan_train(
                    params, opt_state, images_d, poses_d, img_idx,
                    global_step, sub, masks_d)
            if getattr(args, 'profile_dir', '') and \
                    global_step == start + spd:
                jax.block_until_ready(losses)
        global_step += spd

        if global_step % max(args.i_print // spd * spd, spd) == 0 or \
                global_step >= args.N_iters:
            loss = float(losses[-1])
            psnr = float(psnrs[-1])
            # windowed rate since last print (the first window is dominated
            # by XLA compile time; later windows show steady-state it/s)
            now = time.time()
            rate = (global_step - last_step) / max(now - last_t, 1e-9)
            last_t, last_step = now, global_step
            print(f'[TRAIN] Iter: {global_step} Loss: {loss:.6f}  PSNR: {psnr:.3f} '
                  f'({rate:.1f} it/s)', flush=True)
            history.append((global_step, loss, psnr))
            if writer is not None:
                writer.add_scalar('train/loss', loss, global_step)
                writer.add_scalar('train/psnr', psnr, global_step)
                writer.add_scalar('train/it_per_s', rate, global_step)

        if args.i_weights > 0 and global_step % args.i_weights < spd:
            ckpt_dir = os.path.join(expdir, 'ckpts')
            os.makedirs(ckpt_dir, exist_ok=True)
            path = save_checkpoint(ckpt_dir, global_step, params, opt_state)
            print('Saved checkpoints at', path)

        if args.i_img > 0 and global_step % args.i_img < spd and len(i_val) > 0:
            vi = int(i_val[0])
            rgb, _, _ = render_full_image(H, W, focal, poses_d[vi], params,
                                          render_kwargs_test, args.chunk,
                                          near=near, far=far, ndc=ndc)
            mse = float(img2mse(rgb, images_d[vi]))
            val_psnr = float(mse2psnr(jnp.asarray(mse)))
            print(f'[VAL] Iter: {global_step} PSNR: {val_psnr:.3f}', flush=True)
            val_dir = os.path.join(expdir, 'val_imgs')
            os.makedirs(val_dir, exist_ok=True)
            try:
                import imageio.v2 as imageio
                imageio.imwrite(os.path.join(val_dir, f'{global_step:06d}.png'),
                                to8b(np.asarray(rgb)))
            except Exception:
                pass
            if writer is not None:
                writer.add_scalar('test/psnr', val_psnr, global_step)
                writer.add_image('test/rgb', to8b(np.asarray(rgb)),
                                 global_step, dataformats='HWC')
                writer.add_image('test/target', to8b(np.asarray(images_d[vi])),
                                 global_step, dataformats='HWC')

        if args.i_video > 0 and global_step % args.i_video < spd and \
                global_step >= args.i_video:
            import imageio.v2 as imageio
            rgbs = render_path(render_poses[:, :3, :4], (H, W, focal), params,
                               render_kwargs_test, args.chunk, near=near,
                               far=far, ndc=ndc,
                               render_factor=max(args.render_factor, 1) * 2)
            moviebase = os.path.join(
                expdir, f'{args.expname}_spiral_{global_step:06d}_rgb.mp4')
            try:
                imageio.mimwrite(moviebase, rgbs, fps=30, quality=8)
            except (ValueError, ImportError):
                # no ffmpeg backend in this environment: degrade to GIF
                moviebase = moviebase[:-4] + '.gif'
                imageio.mimwrite(moviebase, list(rgbs), fps=30)
            print('Saved video', moviebase)

        if args.i_testset > 0 and global_step % args.i_testset < spd and \
                global_step >= args.i_testset and len(i_test) > 0:
            testsavedir = os.path.join(expdir, f'testset_{global_step:06d}')
            os.makedirs(testsavedir, exist_ok=True)
            render_path(poses_d[np.asarray(i_test)][:, :3, :4], (H, W, focal),
                        params, render_kwargs_test, args.chunk, near=near,
                        far=far, ndc=ndc, savedir=testsavedir,
                        render_factor=max(args.render_factor, 1) * 2)
            print('Saved test set renders to', testsavedir)

    if writer is not None:
        writer.flush()
        writer.close()
    return params, opt_state, history
