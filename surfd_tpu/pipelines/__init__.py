from .batch import generate_meshes, generate_meshes_pipelined
from .generate import (
    MeshExtractionConfig,
    filter_faces_by_udf,
    get_mesh_from_udf,
    get_watertight_mesh_from_udf,
    make_udf_fn,
    sample_latents,
)
