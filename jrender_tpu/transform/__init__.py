from .functional import look, look_at, perspective, orthogonal, projection
from .transform import Transform, Projection, Look, LookAt

__all__ = [
    'look', 'look_at', 'perspective', 'orthogonal', 'projection',
    'Transform', 'Projection', 'Look', 'LookAt',
]
