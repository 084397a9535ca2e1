"""3-D grid autoencoder blocks (vestigial capability parity).

Counterpart of /root/reference/models/models.py:70-333 (`ResnetBlock`,
`AttnBlock`, Up/Downsample 3-D, `Autoencoder_Old`) — the grid-based AE
ablation Surf-D keeps around but does not use on the main path (SURVEY.md
§2.2 "3-D VAE blocks (vestigial)"). Provided for users migrating experiments
that used the grid AE; channel-last (B, D, H, W, C).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm32


class ResnetBlock3D(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(GroupNorm32()(x))
        h = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME", name="conv1")(h)
        h = nn.silu(GroupNorm32()(h))
        h = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME", name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), name="shortcut")(x)
        return x + h


class AttnBlock3D(nn.Module):
    """Single-head self-attention over all voxels (models.py:70-142)."""

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        h = GroupNorm32()(x).reshape(B, D * H * W, C)
        q = nn.Dense(C, name="q")(h)
        k = nn.Dense(C, name="k")(h)
        v = nn.Dense(C, name="v")(h)
        w = nn.softmax(jnp.einsum("btc,bsc->bts", q, k) * C**-0.5, axis=-1)
        out = jnp.einsum("bts,bsc->btc", w, v)
        out = nn.Dense(C, kernel_init=nn.initializers.zeros, name="proj_out")(out)
        return x + out.reshape(B, D, H, W, C)


class Downsample3D(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3, 3), strides=(2, 2, 2), padding="SAME")(x)


class Upsample3D(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 1), 2, 2), 2, 3)
        return nn.Conv(x.shape[-1], (3, 3, 3), padding="SAME")(x)


class GridAutoencoder(nn.Module):
    """UNet3D-style grid AE (Autoencoder_Old, models.py:292-333)."""

    base_channels: int = 32
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    latent_channels: int = 8

    def setup(self):
        bc, cm = self.base_channels, self.channel_mult
        self.conv_in = nn.Conv(bc, (3, 3, 3), padding="SAME")
        self.down_res = [ResnetBlock3D(bc * m) for m in cm]
        self.downs = [Downsample3D() for _ in cm[:-1]]
        self.mid_attn = AttnBlock3D()
        self.to_latent = nn.Conv(self.latent_channels, (1, 1, 1))
        mults = list(cm)[::-1]
        self.from_latent = nn.Conv(bc * mults[0], (3, 3, 3), padding="SAME")
        self.up_res = [ResnetBlock3D(bc * m) for m in mults]
        self.ups = [Upsample3D() for _ in mults[:-1]]
        self.out_norm = GroupNorm32()
        self.conv_out = nn.Conv(1, (3, 3, 3), padding="SAME")

    def __call__(self, x):
        return self.decode(self.encode(x))

    def encode(self, x):
        h = self.conv_in(x)
        for i, res in enumerate(self.down_res):
            h = res(h)
            if i != len(self.down_res) - 1:
                h = self.downs[i](h)
        return self.to_latent(self.mid_attn(h))

    def decode(self, z):
        h = self.from_latent(z)
        for i, res in enumerate(self.up_res):
            h = res(h)
            if i != len(self.up_res) - 1:
                h = self.ups[i](h)
        return self.conv_out(nn.silu(self.out_norm(h)))
