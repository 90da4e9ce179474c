"""End-to-end NeRF training through the demo7-equivalent entry point:
synthetic Blender-format dataset -> config file -> train() -> PSNR rises."""
import json
import os

import numpy as np
import pytest


def make_blender_dataset(root, n=3, H=24):
    import imageio.v2 as imageio
    from jrender_tpu.nerf.dataset import pose_spherical

    os.makedirs(root, exist_ok=True)
    frames = {s: [] for s in ('train', 'val', 'test')}
    idx = 0
    for split in ('train', 'val', 'test'):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            pose = pose_spherical(360.0 * i / n, -30.0, 4.0)
            # simple analytic image: shaded disc whose position depends on pose
            ys, xs = np.meshgrid(np.arange(H), np.arange(H), indexing='ij')
            cx = H / 2 + 4 * np.sin(2 * np.pi * i / n)
            r = np.sqrt((xs - cx) ** 2 + (ys - H / 2) ** 2)
            img = np.clip(1.0 - r / (H / 3), 0, 1)
            rgba = np.stack([img, img * 0.5, img * 0.25, (img > 0).astype(float)], -1)
            fname = f'{split}/r_{i}'
            imageio.imwrite(os.path.join(root, fname + '.png'),
                            (rgba * 255).astype(np.uint8))
            frames[split].append({'file_path': fname,
                                  'transform_matrix': pose.tolist()})
            idx += 1
    for split in ('train', 'val', 'test'):
        with open(os.path.join(root, f'transforms_{split}.json'), 'w') as f:
            json.dump({'camera_angle_x': 0.6911, 'frames': frames[split]}, f)


def make_llff_dataset(root, n=8, H=24, W=32):
    """Synthetic LLFF scene: cameras on a circle looking at the origin,
    poses_bounds.npy in the raw LLFF [down, right, back | t | hwf] layout
    (nerf_helper/load_llff.py's input contract)."""
    import imageio.v2 as imageio

    imgdir = os.path.join(root, 'images')
    os.makedirs(imgdir, exist_ok=True)
    focal = 30.0
    rows = []
    for i in range(n):
        th = 2 * np.pi * i / n
        # forward-facing rig (NDC assumes it): small lateral offsets, all
        # looking at the origin from z ~ 4
        eye = np.array([0.4 * np.sin(th), 0.3 * np.cos(th), 4.0])
        back = eye - np.array([0.0, 0.0, 0.0])
        back = back / np.linalg.norm(back)
        right = np.cross(np.array([0.0, 1.0, 0.0]), back)
        right /= np.linalg.norm(right)
        up = np.cross(back, right)
        # raw LLFF rotation columns: [down, right, back]
        m = np.stack([-up, right, back, eye], 1)              # [3,4]
        hwf = np.array([[H], [W], [focal]])
        rows.append(np.concatenate([np.concatenate([m, hwf], 1).ravel(),
                                    [2.5, 6.5]]))
        # view-consistent image: a fixed radial blob (tiny parallax, so a
        # radiance field can fit it well)
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
        r = np.sqrt((xs - W / 2) ** 2 + (ys - H / 2) ** 2)
        v = np.clip(1.0 - r / (H / 2), 0, 1)
        img = np.stack([v, v * 0.6, 0.2 + 0.3 * v], -1)
        imageio.imwrite(os.path.join(imgdir, f'img_{i:03d}.png'),
                        (img * 255).astype(np.uint8))
    np.save(os.path.join(root, 'poses_bounds.npy'),
            np.stack(rows).astype(np.float64))


def test_load_llff_data_synthetic(tmp_path):
    """The rewritten LLFF pose path: recenter -> average pose ~ identity,
    spiral render path finite, hwf rescaled by factor."""
    from jrender_tpu.nerf.dataset import load_llff_data

    root = str(tmp_path / 'scene')
    make_llff_dataset(root)
    images, poses, bds, render_poses, i_test = load_llff_data(
        root, factor=1, recenter=True, bd_factor=0.75)
    assert images.shape == (8, 24, 32, 3)
    assert poses.shape == (8, 3, 5)
    assert np.isfinite(poses).all() and np.isfinite(render_poses).all()
    assert 0 <= i_test < 8
    assert render_poses.shape[0] == 120
    # bounds rescaled so near ~ 1/bd_factor
    assert np.isclose(bds.min(), 1.0 / 0.75, rtol=1e-5)
    # recentred: average camera position at the origin
    assert np.abs(poses[:, :3, 3].mean(0)).max() < 1e-4

    # spherify path too (rewritten _spherify_poses)
    _, poses_s, bds_s, rp_s, _ = load_llff_data(
        root, factor=1, recenter=True, bd_factor=0.75, spherify=True)
    assert np.isfinite(poses_s).all() and np.isfinite(np.array(rp_s)).all()


def test_train_llff_ndc_batched_e2e(tmp_path):
    """fern-style config: LLFF data through NDC rays + the ray-pool
    batching path (the reference's default LLFF training mode,
    demo7-nerf.py:459-520) trains end-to-end."""
    from jrender_tpu.nerf.config import parse_args
    from jrender_tpu.nerf.trainer import train

    root = str(tmp_path / 'scene')
    make_llff_dataset(root)
    cfg = tmp_path / 'cfg.txt'
    cfg.write_text("""expname = tl
dataset_type = llff
factor = 1
llffhold = 8
N_samples = 16
N_rand = 128
netdepth = 2
netwidth = 32
multires = 4
lrate = 0.005
N_iters = 100
steps_per_dispatch = 10
i_print = 10
i_weights = 0
""")
    args = parse_args(['--config', str(cfg), '--datadir', root,
                       '--basedir', str(tmp_path / 'logs')])
    assert args.dataset_type == 'llff'
    assert not args.no_batching and not args.no_ndc
    params, opt_state, history = train(args)
    psnrs = [h[2] for h in history]
    assert np.isfinite(psnrs[-1])
    assert psnrs[-1] > psnrs[0] + 1.0, f'PSNR did not rise: {psnrs}'


def make_dv_dataset(root, scene='cube', n=4, H=16):
    """Synthetic DeepVoxels layout: {train,validation,test}/<scene>/
    with intrinsics.txt, pose/*.txt, rgb/*.png."""
    import imageio.v2 as imageio

    for split in ('train', 'validation', 'test'):
        base = os.path.join(root, split, scene)
        os.makedirs(os.path.join(base, 'pose'), exist_ok=True)
        os.makedirs(os.path.join(base, 'rgb'), exist_ok=True)
        with open(os.path.join(base, 'intrinsics.txt'), 'w') as f:
            f.write('280.0 256.0 256.0\n0 0 0\n0.8\n1.0\n512 512\n0\n')
        for i in range(n):
            th = 2 * np.pi * i / n
            eye = np.array([2 * np.sin(th), 0.3, 2 * np.cos(th)])
            fwd = -eye / np.linalg.norm(eye)
            right = np.cross([0, 1, 0], -fwd)
            right = right / np.linalg.norm(right)
            up = np.cross(-fwd, right)
            pose = np.eye(4)
            pose[:3, :3] = np.stack([right, up, -fwd], 1)
            pose[:3, 3] = eye
            with open(os.path.join(base, 'pose', f'{i:03d}.txt'), 'w') as f:
                f.write(' '.join(str(x) for x in pose.ravel()))
            img = np.full((H, H, 3), (40 * i) % 255, np.uint8)
            imageio.imwrite(os.path.join(base, 'rgb', f'{i:03d}.png'), img)


def test_load_dv_data_synthetic(tmp_path):
    """DeepVoxels loader (nerf_helper/load_deepvoxels.py parity): splits
    concatenated train|val|test, intrinsics rescaled to the 512 target,
    cam2world flipped to the OpenGL convention."""
    from jrender_tpu.nerf.dataset import load_dv_data

    root = str(tmp_path / 'dv')
    make_dv_dataset(root, n=4)
    imgs, poses, render_poses, hwf, i_split = load_dv_data(
        scene='cube', basedir=root, testskip=1)
    assert imgs.shape == (12, 16, 16, 3)
    assert poses.shape == (12, 3, 4)
    assert [len(s) for s in i_split] == [4, 4, 4]
    H, W, focal = hwf
    assert H == W == 512
    assert np.isclose(focal, 280.0)          # 512/512 * f
    assert np.isfinite(poses).all()
    assert render_poses.shape == (4, 3, 4)


def test_train_blender_e2e(tmp_path):
    from jrender_tpu.nerf.config import parse_args
    from jrender_tpu.nerf.trainer import train

    root = str(tmp_path / 'data')
    make_blender_dataset(root)

    cfg = tmp_path / 'cfg.txt'
    cfg.write_text(f"""expname = t
dataset_type = blender
white_bkgd = True
no_batching = True
N_samples = 16
N_importance = 8
N_rand = 128
netdepth = 2
netwidth = 32
netdepth_fine = 2
netwidth_fine = 32
multires = 4
multires_views = 2
use_viewdirs = True
lrate = 0.005
N_iters = 120
steps_per_dispatch = 10
i_print = 10
i_weights = 120
testskip = 1
""")
    args = parse_args(['--config', str(cfg), '--datadir', root,
                       '--basedir', str(tmp_path / 'logs')])
    assert args.dataset_type == 'blender'
    assert args.N_samples == 16
    assert args.use_viewdirs is True
    assert args.no_batching is True

    params, opt_state, history = train(args)
    assert len(history) > 0
    psnrs = [h[2] for h in history]
    # training must actually learn: PSNR rises by a real margin
    assert psnrs[-1] > psnrs[0] + 2.0, f'PSNR did not rise: {psnrs}'
    assert np.isfinite(psnrs[-1])
    # checkpoint written and restorable
    ckpt_dir = tmp_path / 'logs' / 't' / 'ckpts'
    assert ckpt_dir.exists() and len(list(ckpt_dir.iterdir())) > 0

    # resume path: re-parse with no_reload off discovers the checkpoint and
    # restores the FULL optimizer state (demo7-nerf.py:148-155,594-602) —
    # Adam moments must survive, not reset.
    from jrender_tpu.nerf.trainer import create_nerf
    args2 = parse_args(['--config', str(cfg), '--datadir', root,
                        '--basedir', str(tmp_path / 'logs')])
    _, _, start, params2, _, opt_state2 = create_nerf(args2)
    assert start >= 120
    import jax
    leaves_live = jax.tree_util.tree_leaves(opt_state)
    leaves_restored = jax.tree_util.tree_leaves(opt_state2)
    assert len(leaves_live) == len(leaves_restored)
    for a, b in zip(leaves_live, leaves_restored):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg='optimizer state not restored')
    # Adam second moments are nonzero after training (i.e. not a fresh init)
    total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves_restored)
    assert total > 0.0


def test_train_blender_e2e_batched(tmp_path):
    """The ray-pool batching path (reference default; demo7-nerf.py:459-520)
    trains end-to-end and learns."""
    from jrender_tpu.nerf.config import parse_args
    from jrender_tpu.nerf.trainer import train

    root = str(tmp_path / 'data')
    make_blender_dataset(root)
    cfg = tmp_path / 'cfg.txt'
    cfg.write_text("""expname = tb
dataset_type = blender
white_bkgd = True
N_samples = 16
N_rand = 128
netdepth = 2
netwidth = 32
multires = 4
lrate = 0.005
N_iters = 120
steps_per_dispatch = 10
i_print = 10
i_weights = 0
testskip = 1
""")
    args = parse_args(['--config', str(cfg), '--datadir', root,
                       '--basedir', str(tmp_path / 'logs')])
    assert not args.no_batching
    params, opt_state, history = train(args)
    psnrs = [h[2] for h in history]
    assert psnrs[-1] > psnrs[0] + 2.0, f'PSNR did not rise: {psnrs}'


def test_video_and_testset_renders(tmp_path):
    """i_video / i_testset branches (demo7-nerf.py:604-647): spiral video
    written via imageio.mimwrite + testset pngs dumped to disk."""
    from jrender_tpu.nerf.config import parse_args
    from jrender_tpu.nerf.trainer import train

    root = str(tmp_path / 'data')
    make_blender_dataset(root)
    cfg = tmp_path / 'cfg.txt'
    cfg.write_text("""expname = tv
dataset_type = blender
white_bkgd = True
no_batching = True
N_samples = 8
N_rand = 64
netdepth = 2
netwidth = 16
multires = 2
lrate = 0.005
N_iters = 20
steps_per_dispatch = 10
i_print = 10
i_weights = 0
i_video = 20
i_testset = 20
testskip = 1
render_n_views = 4
""")
    args = parse_args(['--config', str(cfg), '--datadir', root,
                       '--basedir', str(tmp_path / 'logs')])
    train(args)
    exp = tmp_path / 'logs' / 'tv'
    vids = list(exp.glob('*rgb.mp4')) + list(exp.glob('*rgb.gif'))
    assert vids, f'no spiral video written in {list(exp.iterdir())}'
    testdirs = list(exp.glob('testset_*'))
    assert testdirs, f'no testset dir in {list(exp.iterdir())}'
    pngs = list(testdirs[0].glob('*.png'))
    assert pngs, 'testset dir has no rendered images'


def test_train_mask_guided_sampling(tmp_path):
    """valid_ratio >= 0 routes through mask-guided sampling
    (demo7-nerf.py:545-563) and still trains."""
    from jrender_tpu.nerf.config import parse_args
    from jrender_tpu.nerf.trainer import train

    root = str(tmp_path / 'data')
    make_blender_dataset(root)
    cfg = tmp_path / 'cfg.txt'
    cfg.write_text("""expname = tm
dataset_type = blender
white_bkgd = True
no_batching = True
valid_ratio = 0.8
N_samples = 16
N_rand = 64
netdepth = 2
netwidth = 32
multires = 4
lrate = 0.005
N_iters = 100
steps_per_dispatch = 10
i_print = 10
i_weights = 0
testskip = 1
""")
    args = parse_args(['--config', str(cfg), '--datadir', root,
                       '--basedir', str(tmp_path / 'logs')])
    assert args.valid_ratio == 0.8
    params, opt_state, history = train(args)
    psnrs = [h[2] for h in history]
    assert np.isfinite(psnrs[-1])
    # mask-guided sampling must still actually learn
    assert psnrs[-1] > psnrs[0] + 1.0, f'PSNR did not rise: {psnrs}'


@pytest.mark.parametrize('batching', [False, True])
def test_train_gradient_accumulation(tmp_path, batching):
    """accumulation_steps > 1 routes through optax.MultiSteps: each
    micro-step carries N_rand/acc rays, Adam applies once per acc
    micro-steps (demo7-nerf.py:457-458,579-585), and training learns on
    both the per-image and the ray-pool-batched sampling paths (the
    batched path's permutation bookkeeping must advance by the reduced
    micro-batch size)."""
    from jrender_tpu.nerf.config import parse_args
    from jrender_tpu.nerf.trainer import create_nerf, train

    root = str(tmp_path / 'data')
    make_blender_dataset(root)
    cfg = tmp_path / 'cfg.txt'
    cfg.write_text(f"""expname = ta
dataset_type = blender
white_bkgd = True
{'' if batching else 'no_batching = True'}
accumulation_steps = 2
N_samples = 16
N_rand = 128
netdepth = 2
netwidth = 32
multires = 4
lrate = 0.005
N_iters = 120
steps_per_dispatch = 10
i_print = 10
i_weights = 0
testskip = 1
""")
    args = parse_args(['--config', str(cfg), '--datadir', root,
                       '--basedir', str(tmp_path / 'logs')])
    assert args.accumulation_steps == 2

    # optimizer is a MultiSteps wrapper: mini_step counter present
    import optax
    _, _, _, params0, opt, opt_state0 = create_nerf(args)
    assert isinstance(opt_state0, optax.MultiStepsState)
    # one micro-step must NOT move params; the second must
    import jax
    import jax.numpy as jnp
    g = jax.tree_util.tree_map(jnp.ones_like, params0)
    u1, s1 = opt.update(g, opt_state0, params0)
    p1 = optax.apply_updates(params0, u1)
    moved1 = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(params0)))
    assert moved1 == 0.0, 'params moved on an accumulation micro-step'
    u2, _ = opt.update(g, s1, p1)
    p2 = optax.apply_updates(p1, u2)
    moved2 = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p1)))
    assert moved2 > 0.0, 'params did not move on the apply micro-step'

    params, opt_state, history = train(args)
    psnrs = [h[2] for h in history]
    assert np.isfinite(psnrs[-1])
    assert psnrs[-1] > psnrs[0] + 1.0, f'PSNR did not rise: {psnrs}'
