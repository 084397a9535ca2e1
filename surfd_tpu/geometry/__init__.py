from .marching import Mesh, marching_tetrahedra, marching_tetrahedra_udf
from .grid import (
    GridFiller,
    estimate_surface_bias,
    estimate_surface_bias_field,
    eval_in_chunks,
    eval_in_chunks_async,
    fill_grid_dense,
    make_grad_fn,
)
from .mesh_io import read_obj, write_obj, write_ply
from .mesh_ops import (
    boundary_vertices,
    face_components,
    fill_triangle_holes,
    filter_small_components,
    keep_largest_component,
    laplacian_smooth,
    merge_duplicate_vertices,
    remove_degenerate_faces,
    remove_duplicate_faces,
    remove_unreferenced_vertices,
    smooth_borders,
    stabilize,
    vertex_normals,
)
from .metrics import chamfer_distance, f_score, hausdorff_distance
