from .decoder_kernel import (
    FoldedDecoder,
    fold_decoder,
    folded_udf,
    folded_udf_mixed,
    make_fused_udf_fn,
    posenc_f32,
)
