from .decoder_kernel import (
    FoldedDecoder,
    fold_decoder,
    folded_udf,
    make_fused_udf_fn,
    pallas_folded_udf,
    posenc_f32,
)
from .attention_kernel import fused_qkv_attention, pallas_qkv_attention
