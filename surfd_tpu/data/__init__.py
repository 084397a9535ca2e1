from .curriculum import (
    CurriculumState,
    SequenceSamplerComplement,
    SequenceSamplerTrain,
    WeightedDynamicSampler,
    batched,
)
from .datasets import (
    DiffusionDataset,
    UdfDataset,
    ae_batch_iterator,
    diffusion_batch_iterator,
    latent_diffusion_batch_iterator,
    precompute_latents,
    random_point_sampling,
)
from .prefetch import prefetch_iterator
from .preprocess import (
    PreprocessConfig,
    compute_udf_from_mesh,
    normalize_mesh,
    prepare_udf_sample,
    preprocess_mesh_file,
    sample_points_around_pcd,
    sample_points_on_mesh,
)
from .conditioning import (
    clip_preprocess,
    composite_on_white,
    crop_square,
    mask2bbox,
    resize_bilinear,
)
