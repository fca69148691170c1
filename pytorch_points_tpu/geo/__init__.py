"""Mesh/point geometry operators (reference geo_operations.py, SURVEY.md §3.2 P4)."""

from pytorch_points_tpu.geo.cage import (  # noqa: F401
    deform_with_cage,
    mean_value_coordinates,
)
from pytorch_points_tpu.geo.splatting import Camera, render_points  # noqa: F401
from pytorch_points_tpu.geo.mesh_ops import (  # noqa: F401
    cot_laplacian,
    dihedral_angles,
    edge_lengths,
    face_areas,
    face_normals,
    mean_curvature,
    mesh_edges,
    point_laplacian,
    uniform_laplacian,
    vertex_normals,
)
