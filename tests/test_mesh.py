import numpy as np
import jax
import jax.numpy as jnp

from jrender_tpu.structures import Mesh, join_meshes_as_scene


def simple_mesh():
    # unit right triangle + its mirror, sharing an edge
    vertices = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    return Mesh(vertices, faces, texture_type='vertex')


def test_shapes():
    m = simple_mesh()
    assert m.vertices.shape == (1, 4, 3)
    assert m.faces.shape == (1, 2, 3)
    assert m.face_vertices.shape == (1, 2, 3, 3)
    assert m.textures.shape == (1, 4, 3)


def test_surface_normals_flat():
    m = simple_mesh()
    n = np.asarray(m.surface_normals)
    # both triangles lie in z=0 plane; normals along ±z
    np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-6)


def test_vertex_normals_flat():
    m = simple_mesh()
    n = np.asarray(m.vertex_normals)
    np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-5)


def test_fill_back_doubles_faces():
    m = simple_mesh()
    m.fill_back_()
    assert m.faces.shape == (1, 4, 3)
    np.testing.assert_array_equal(np.asarray(m.faces[0, 2]), np.asarray(m.faces[0, 0])[::-1])
    m.reset_()
    assert m.faces.shape == (1, 2, 3)


def test_join_meshes():
    a, b = simple_mesh(), simple_mesh()
    j = join_meshes_as_scene([a, b])
    assert j.vertices.shape == (1, 8, 3)
    assert j.faces.shape == (1, 4, 3)
    assert int(jnp.max(j.faces)) == 7


def test_mesh_is_pytree():
    m = simple_mesh()
    leaves = jax.tree_util.tree_leaves(m)
    assert any(l.shape == (1, 4, 3) for l in leaves)

    def f(mesh):
        return jnp.sum(mesh.vertices ** 2)

    g = jax.grad(lambda v: f(Mesh(v, m.faces, texture_type='vertex')))(m.vertices)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(m.vertices), rtol=1e-6)
