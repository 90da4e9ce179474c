from .math import normalize, dot, cross
from .angles import get_points_from_angles
