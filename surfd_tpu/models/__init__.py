from .layers import GroupNorm32, qkv_attention, timestep_embedding
from .unet1d import UNet1D
from .mdm import MDM, make_cfg_model_fn
from .dgcnn import Dgcnn, gather_graph_feature, knn_indices
from .decoder import (
    CbnDecoder,
    ConditionalBatchNorm,
    ConditionalResnetBlock,
    CoordsEncoder,
    udf_from_logits,
)
from .attention import (
    BasicTransformerBlock,
    CrossAttention,
    FeedForward,
    GEGLU,
    LinearAttention,
    SpatialTransformer1D,
)
from .grid_ae import GridAutoencoder
from .encoder_unet import AttentionPool1D, EncoderUNet1D, make_classifier_cond_fn
