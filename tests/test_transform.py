import numpy as np
import jax.numpy as jnp

from jrender_tpu.transform import look_at, look, perspective, orthogonal, projection
from jrender_tpu.utils import get_points_from_angles


def test_look_at_moves_eye_to_origin():
    v = jnp.asarray(np.array([[[0.0, 0.0, 0.0]]], np.float32))
    out = look_at(v, eye=[0, 0, -3])
    # the origin is 3 units in front of the eye along +z
    np.testing.assert_allclose(np.asarray(out), [[[0, 0, 3]]], atol=1e-5)


def test_look_at_preserves_distances():
    rng = np.random.RandomState(1)
    v = jnp.asarray(rng.randn(2, 10, 3).astype(np.float32))
    out = look_at(v, eye=[1.0, 2.0, -3.0])
    d_in = np.linalg.norm(np.asarray(v[:, :1] - v[:, 1:]), axis=-1)
    d_out = np.linalg.norm(np.asarray(out[:, :1] - out[:, 1:]), axis=-1)
    np.testing.assert_allclose(d_in, d_out, rtol=1e-4)


def test_perspective_divide():
    v = jnp.asarray(np.array([[[1.0, 1.0, 2.0]]], np.float32))
    out = np.asarray(perspective(v, angle=45.0))
    np.testing.assert_allclose(out[0, 0], [0.5, 0.5, 2.0], rtol=1e-5)


def test_orthogonal():
    v = jnp.asarray(np.array([[[1.0, -2.0, 5.0]]], np.float32))
    out = np.asarray(orthogonal(v, scale=2.0))
    np.testing.assert_allclose(out[0, 0], [2.0, -4.0, 5.0], rtol=1e-6)


def test_look_matches_look_at_when_aligned():
    rng = np.random.RandomState(2)
    v = jnp.asarray(rng.randn(1, 8, 3).astype(np.float32))
    eye = [0.0, 0.0, -4.0]
    a = look_at(v, eye=eye, at=[0, 0, 0])
    b = look(v, eye=eye, direction=[0, 0, 1])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_projection_identity_camera():
    # K maps NDC so that u,v recover x/z scaled into pixels
    K = np.array([[[256.0, 0, 256], [0, 256, 256], [0, 0, 1]]], np.float32)
    R = np.eye(3, dtype=np.float32)[None]
    t = np.zeros((1, 1, 3), np.float32)
    v = jnp.asarray(np.array([[[0.0, 0.0, 2.0]]], np.float32))
    out = np.asarray(projection(v, K, R, t, orig_size=512))
    np.testing.assert_allclose(out[0, 0], [0.0, 0.0, 2.0], atol=1e-5)


def test_get_points_from_angles_scalar_and_array():
    p = get_points_from_angles(2.0, 0.0, 0.0)
    np.testing.assert_allclose(p, (0.0, 0.0, -2.0), atol=1e-7)
    arr = get_points_from_angles(jnp.asarray([2.0]), jnp.asarray([0.0]), jnp.asarray([90.0]))
    np.testing.assert_allclose(np.asarray(arr)[0], [2.0, 0.0, 0.0], atol=1e-6)
