"""UDF decoder: NeRF positional encoding + conditional-batch-norm MLP.

TPU-native re-implementation of:
  * `CoordsEncoder` (/root/reference/AutoEncoder/models/coordsenc.py:7-51)
  * `CbnDecoder` / `DecoderConditionalBatchNorm` / `ConditionalBatchNorm1d` /
    `ConditionalResnetBlock1d` (/root/reference/AutoEncoder/models/cbndec.py:4-134)

This is THE hot inference path: a 512³ mesh extraction evaluates it on up to
1.34e8 query points (SURVEY.md §6). Everything is channel-last (B, N, C) so
each layer is a (N, C)×(C, C) MXU matmul; `decode_udf_logits` below is the
plain XLA path, and ops/decoder_kernel.py provides the fused Pallas variant.

Init parity matters for training dynamics and is preserved: CBN gamma/beta
projections start at weight 0 with bias 1/0 (cbndec.py:62-66), and each res
block's second conv starts at zero (cbndec.py:97).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class CoordsEncoder:
    """NeRF positional encoding: identity + sin/cos over 2^[0..max_freq_log2].

    Matches reference coordsenc.py:7-51 including concatenation order
    [x, sin(f0·x), cos(f0·x), sin(f1·x), ...]. out_dim = 3 + 3·2·num_freqs = 63.
    """

    def __init__(
        self,
        input_dims: int = 3,
        include_input: bool = True,
        max_freq_log2: int = 9,
        num_freqs: int = 10,
        log_sampling: bool = True,
    ):
        self.input_dims = input_dims
        self.include_input = include_input
        # Host floats, NOT device arrays: pre-created device constants captured
        # by jitted closures throttle all later h2d transfers on the axon
        # tunnel (see diffusion/schedule.py module doc).
        if log_sampling:
            self.freq_bands = (2.0 ** np.linspace(0.0, max_freq_log2, num_freqs)).tolist()
        else:
            self.freq_bands = np.linspace(2.0**0.0, 2.0**max_freq_log2, num_freqs).tolist()
        self.out_dim = (input_dims if include_input else 0) + input_dims * 2 * num_freqs

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        parts = [x] if self.include_input else []
        for f in self.freq_bands:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)


class ConditionalBatchNorm(nn.Module):
    """BatchNorm (affine-free) with latent-conditioned γ/β (cbndec.py:50-82).

    The γ/β projections are Dense layers on the latent (the reference's 1×1
    Conv1d on a broadcast latent is the same linear map). At inference the
    normalization uses running statistics accumulated during training.
    """

    features: int
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray, train: bool = False):
        gamma = nn.Dense(
            self.features,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
            name="gamma",
        )(cond)
        beta = nn.Dense(
            self.features,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="beta",
        )(cond)
        net = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            use_bias=False,
            use_scale=False,
            name="bn",
        )(x)
        if cond.ndim == x.ndim - 1:  # (B, D) latent broadcast over points
            gamma = gamma[:, None, :]
            beta = beta[:, None, :]
        return gamma * net + beta


class ConditionalResnetBlock(nn.Module):
    """x + fc1(relu(cbn1(fc0(relu(cbn0(x)))))), fc1 zero-init (cbndec.py:85-103)."""

    features: int

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        net = ConditionalBatchNorm(self.features, name="bn_0")(x, cond, train)
        net = nn.Dense(self.features, name="fc_0")(nn.relu(net))
        dx = ConditionalBatchNorm(self.features, name="bn_1")(net, cond, train)
        dx = nn.Dense(self.features, kernel_init=nn.initializers.zeros, name="fc_1")(
            nn.relu(dx)
        )
        return x + dx


class CbnDecoder(nn.Module):
    """(B, N, in_dim) encoded coords + (B, latent) → (B, N) UDF logit.

    Matches reference `DecoderConditionalBatchNorm.forward` (cbndec.py:35-47):
    lift → num_hidden_layers res blocks → CBN → ReLU → out projection.
    Surf-D config: in 63, hidden 512, 5 layers
    (/root/reference/AutoEncoder/cfg/deepfashion3d/deepfashion3d.yaml:14-16).
    """

    latent_dim: int
    hidden_dim: int = 512
    num_hidden_layers: int = 5
    out_dim: int = 1

    @nn.compact
    def __call__(self, coords_emb: jnp.ndarray, latent: jnp.ndarray, train: bool = False):
        net = nn.Dense(self.hidden_dim, name="fc_p")(coords_emb)
        for i in range(self.num_hidden_layers):
            net = ConditionalResnetBlock(self.hidden_dim, name=f"block_{i}")(
                net, latent, train
            )
        net = ConditionalBatchNorm(self.hidden_dim, name="bn_out")(net, latent, train)
        out = nn.Dense(self.out_dim, name="fc_out")(nn.relu(net))
        if self.out_dim == 1:
            out = out.squeeze(-1)
        return out


def udf_from_logits(logits: jnp.ndarray, max_dist: float = 0.1) -> jnp.ndarray:
    """Map decoder logits to UDF values: (1 − σ(logit)) · max_dist.

    The training target is BCE on 1 − udf/max_dist (reference
    AutoEncoder/trainers/encdec.py:157), so inference inverts it
    (sample/generate_uncond.py:96-101).
    """
    return (1.0 - nn.sigmoid(logits)) * max_dist
