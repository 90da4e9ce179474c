from .mesh import Mesh, join_meshes_as_scene, face_vertices, surface_normals_fn, vertex_normals_fn
