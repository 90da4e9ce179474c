"""Mesh regularization losses.

Parity targets:
  * LaplacianLoss -- jrender/loss/laplacian_loss.py:6-36
  * FlattenLoss   -- jrender/loss/flatten_loss.py:5-81
  * neg_iou_loss  -- jrender/loss/iou_loss.py:1-4

Host-side graph preprocessing happens once in __init__ (numpy); the
per-step math is pure JAX.  The Laplacian is applied as a dense matmul
(MXU-friendly for the mesh sizes these demos use); FlattenLoss edge
discovery uses a hash map instead of the reference's O(E*F) scan.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class LaplacianLoss:
    def __init__(self, vertex, faces, average: bool = False):
        vertex = np.asarray(vertex)
        faces = np.asarray(faces).astype(np.int32)
        self.nv = vertex.shape[0]
        self.nf = faces.shape[0]
        self.average = average

        laplacian = np.zeros([self.nv, self.nv], dtype=np.float32)
        laplacian[faces[:, 0], faces[:, 1]] = -1
        laplacian[faces[:, 1], faces[:, 0]] = -1
        laplacian[faces[:, 1], faces[:, 2]] = -1
        laplacian[faces[:, 2], faces[:, 1]] = -1
        laplacian[faces[:, 2], faces[:, 0]] = -1
        laplacian[faces[:, 0], faces[:, 2]] = -1
        r, c = np.diag_indices(laplacian.shape[0])
        laplacian[r, c] = -laplacian.sum(1)
        for i in range(self.nv):
            laplacian[i, :] /= laplacian[i, i]
        self.laplacian = jnp.asarray(laplacian)

    def __call__(self, x):
        batch_size = x.shape[0]
        x = jnp.matmul(self.laplacian, x)
        dims = tuple(range(x.ndim))[1:]
        x = jnp.sum(x ** 2, axis=dims)
        if self.average:
            return jnp.sum(x) / batch_size
        return x


class FlattenLoss:
    """Penalize dihedral angles of interior edges: sum (cos+1)^2."""

    def __init__(self, faces, average: bool = False):
        faces = np.asarray(faces).astype(np.int32)
        self.nf = faces.shape[0]
        self.average = average

        # map sorted edge -> list of opposite vertices (fast replacement for
        # the reference's nested loops, same resulting pairs)
        edge_opposites = {}
        for f in faces:
            for k in range(3):
                a, b = f[k], f[(k + 1) % 3]
                c = f[(k + 2) % 3]
                key = (min(a, b), max(a, b))
                edge_opposites.setdefault(key, []).append(int(c))

        v0s, v1s, v2s, v3s = [], [], [], []
        # reference iterates unique sorted edges from (f[:,0:2], f[:,1:3]) only;
        # it requires each edge to have exactly two adjacent faces to index v3s.
        seen = sorted(set(
            tuple(e) for e in np.sort(np.concatenate([faces[:, 0:2], faces[:, 1:3]], axis=0), axis=1)
        ))
        for (a, b) in seen:
            opp = edge_opposites.get((int(min(a, b)), int(max(a, b))), [])
            if len(opp) >= 2:
                v0s.append(int(a))
                v1s.append(int(b))
                v2s.append(opp[0])
                v3s.append(opp[1])
        self.v0s = jnp.asarray(np.array(v0s, np.int32))
        self.v1s = jnp.asarray(np.array(v1s, np.int32))
        self.v2s = jnp.asarray(np.array(v2s, np.int32))
        self.v3s = jnp.asarray(np.array(v3s, np.int32))

    def __call__(self, vertices, eps: float = 1e-6):
        batch_size = vertices.shape[0]

        v0s = vertices[:, self.v0s, :]
        v1s = vertices[:, self.v1s, :]
        v2s = vertices[:, self.v2s, :]
        v3s = vertices[:, self.v3s, :]

        a1 = v1s - v0s
        b1 = v2s - v0s
        a1l2 = jnp.sum(a1 ** 2, -1)
        b1l2 = jnp.sum(b1 ** 2, -1)
        a1l1 = jnp.sqrt(a1l2 + eps)
        b1l1 = jnp.sqrt(b1l2 + eps)
        ab1 = jnp.sum(a1 * b1, -1)
        cos1 = ab1 / (a1l1 * b1l1 + eps)
        sin1 = jnp.sqrt(1 - cos1 ** 2 + eps)
        c1 = a1 * (ab1 / (a1l2 + eps))[..., None]
        cb1 = b1 - c1
        cb1l1 = b1l1 * sin1

        a2 = v1s - v0s
        b2 = v3s - v0s
        a2l2 = jnp.sum(a2 ** 2, -1)
        b2l2 = jnp.sum(b2 ** 2, -1)
        a2l1 = jnp.sqrt(a2l2 + eps)
        b2l1 = jnp.sqrt(b2l2 + eps)
        ab2 = jnp.sum(a2 * b2, -1)
        cos2 = ab2 / (a2l1 * b2l1 + eps)
        sin2 = jnp.sqrt(1 - cos2 ** 2 + eps)
        c2 = a2 * (ab2 / (a2l2 + eps))[..., None]
        cb2 = b2 - c2
        cb2l1 = b2l1 * sin2

        cos = jnp.sum(cb1 * cb2, -1) / (cb1l1 * cb2l1 + eps)
        dims = tuple(range(cos.ndim))[1:]
        loss = jnp.sum((cos + 1) ** 2, axis=dims)
        if self.average:
            return jnp.sum(loss) / batch_size
        return loss


def neg_iou_loss(predict, target):
    dims = tuple(range(predict.ndim))[1:]
    intersect = jnp.sum(predict * target, axis=dims)
    union = jnp.sum(predict + target - predict * target, axis=dims) + 1e-6
    return 1.0 - jnp.sum(intersect / union) / intersect.size
