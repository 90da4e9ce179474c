"""End-to-end Renderer tests incl. golden-image parity with the reference.

The reference repo ships demo1's output (data/results/output_render/
rotation.gif, 90 frames = azimuth 0,4,...,356 at 256x256).  We render the
same frames with our pipeline and compare (GIF palette quantization and
f32-vs-CUDA accumulation-order differences bound the tolerance).
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

import jrender_tpu as jr

GOLDEN_GIF = '/root/reference/data/results/output_render/rotation.gif'


@pytest.fixture(scope='module')
def spot_mesh(spot_obj_path):
    return jr.Mesh.from_obj(spot_obj_path, load_texture=True, texture_res=5,
                            texture_type='surface', dr_type='softras')


def test_load_spot(spot_mesh):
    assert spot_mesh.vertices.shape == (1, 2930, 3)
    assert spot_mesh.faces.shape == (1, 5856, 3)
    assert spot_mesh.textures.shape == (1, 5856, 25, 3)
    tex = np.asarray(spot_mesh.textures)
    assert tex.min() >= 0 and tex.max() <= 1 + 1e-5
    assert tex.std() > 0.05  # actually textured, not flat


@pytest.mark.parametrize('frame', [0, 23, 45])
def test_demo1_golden_frames(spot_mesh, frame):
    import imageio.v2 as imageio
    golden = imageio.mimread(GOLDEN_GIF, memtest=False)
    azimuth = frame * 4
    spot_mesh.reset_()
    renderer = jr.Renderer(dr_type='softras', backend='jax')
    renderer.transform.set_eyes_from_angles(2.732, 30, azimuth)
    rgb = renderer.render_mesh(spot_mesh, mode='rgb')
    ours = np.asarray(rgb)[0].transpose(1, 2, 0)
    ref = np.asarray(golden[frame])[..., :3].astype(np.float32) / 255.0
    diff = np.abs(ours - ref)
    # GIF quantization allows per-pixel error; demand tight mean agreement
    assert diff.mean() < 0.015, f'mean abs diff {diff.mean():.4f}'
    assert (diff > 0.25).mean() < 0.01, f'large-diff pixel frac {(diff > 0.25).mean():.4f}'


def test_silhouette_mode(spot_mesh):
    spot_mesh.reset_()
    renderer = jr.Renderer(dr_type='softras', backend='jax', image_size=64)
    renderer.transform.set_eyes_from_angles(2.732, 30, 0)
    sil = renderer.render_mesh(spot_mesh, mode='silhouettes')
    sil = np.asarray(sil)
    assert sil.shape == (1, 64, 64)
    assert sil.max() > 0.9 and sil.min() < 0.1


def test_functional_execute_path(rng):
    # Renderer(vertices, faces, textures) mirror of reference execute()
    verts = rng.uniform(-0.5, 0.5, size=(1, 12, 3)).astype(np.float32)
    faces = rng.randint(0, 12, size=(1, 8, 3)).astype(np.int32)
    tex = rng.uniform(size=(1, 8, 4, 3)).astype(np.float32)
    renderer = jr.Renderer(dr_type='softras', backend='jax', image_size=32)
    out = renderer(jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(tex))
    assert np.asarray(out).shape == (1, 3, 32, 32)


def test_anti_aliasing(spot_mesh):
    spot_mesh.reset_()
    renderer = jr.Renderer(dr_type='softras', backend='jax', image_size=32,
                           anti_aliasing=True)
    renderer.transform.set_eyes_from_angles(2.732, 30, 0)
    rgb = renderer.render_mesh(spot_mesh, mode='rgb')
    assert np.asarray(rgb).shape == (1, 3, 32, 32)


def test_save_and_reload_obj(tmp_path, spot_mesh):
    spot_mesh.reset_()
    out = str(tmp_path / 'spot_out.obj')
    spot_mesh.save_obj(out, save_texture=True, texture_res_out=8)
    assert os.path.exists(out)
    assert os.path.exists(out[:-4] + '.png')
    v, f, tex, _, _, _ = jr.load_obj(out, load_texture=True, texture_res=5,
                                     dr_type='softras')
    assert v.shape[0] == spot_mesh.num_vertices
    assert f.shape[0] == spot_mesh.num_faces


def test_gbuffer_modes(rng):
    """Renderer Gbuffer debug outputs (lighting.py:178-181)."""
    verts = rng.uniform(-0.5, 0.5, size=(1, 12, 3)).astype(np.float32)
    faces = rng.randint(0, 12, size=(1, 8, 3)).astype(np.int32)
    tex = rng.uniform(size=(1, 8, 4, 3)).astype(np.float32)
    for mode in ('normal', 'albedo'):
        renderer = jr.Renderer(dr_type='softras', backend='jax', image_size=32,
                               Gbuffer=mode)
        out = renderer(jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(tex))
        assert np.isfinite(np.asarray(out)).all()
