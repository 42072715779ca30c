from . import lie
from .meshes import (
    make_box,
    make_dense_plane,
    make_ellipsoid,
    make_plane,
    make_polygon_from_points,
    make_rounded_box,
    make_side_points,
    make_superquadric,
)
