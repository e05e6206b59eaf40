"""Conditional generator: (latent, daily-sum condition) -> hourly fractions.

Architecture parity with the reference generator
(gan_train_cwgangp_pixelnorm.py:312-357): dense projection to a
(nhours/8, nd/8, nd/8, 256) latent grid, three [nearest-upsample x2 ->
Conv3D -> PixelNorm -> LeakyReLU] stages, a linear Conv3D head and a softmax
over the hour axis that makes per-gridpoint fractions sum to exactly 1
(conservation of the daily sum).  The latent-grid scaling subsumes the
large-domain variant (alternative_domains/..._largedomain.py:323-335).

TPU-first choices: NDHWC layout (channels-last feeds the MXU contraction
directly), all control flow static, pixelnorm/softmax in f32 while convs may
run bf16 via `ModelConfig.compute_dtype`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from prdisagg_tpu.core.config import ModelConfig
from prdisagg_tpu.ops import (
    hour_softmax,
    leaky_relu,
    pixel_norm,
    pixel_norm_mixed,
    spatial_constraint,
    upsample3d_nearest,
)
from prdisagg_tpu.ops.fused_upsample_conv import upsample2_conv3


class FusedUpsampleConv(nn.Module):
    """nearest-upsample x2 + Conv3D(3^3, SAME) as folded phase convolutions.

    Parameter layout matches nn.Conv (kernel (3,3,3,Cin,Cout), bias), so
    modules named conv{i} stay compatible with reference .h5 weight import.
    """

    features: int
    kernel_init: nn.initializers.Initializer
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return upsample2_conv3(
            x.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(self.dtype),
        )


class Generator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, latent: jax.Array, cond: jax.Array) -> jax.Array:
        """latent: (B, latent_dim); cond: (B, nd, nd, n_cond_channels).

        Returns fractions (B, nhours, nd, nd, 1), softmax over hours.
        """
        cfg = self.cfg
        init = nn.initializers.normal(stddev=cfg.init_stddev)
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        gd, gh, gw = cfg.latent_grid

        b = latent.shape[0]
        x = jnp.concatenate([latent, cond.reshape(b, -1)], axis=-1)
        x = nn.Dense(
            cfg.base_channels * gd * gh * gw,
            kernel_init=init,
            dtype=compute_dtype,
            name="latent_proj",
        )(x)
        x = leaky_relu(x, cfg.leak)
        x = x.reshape(b, gd, gh, gw, cfg.base_channels)

        for i, ch in enumerate(cfg.gen_channels):
            if cfg.fused_upsample:
                x = FusedUpsampleConv(
                    ch, kernel_init=init, dtype=compute_dtype, name=f"conv{i}"
                )(x)
            else:
                x = upsample3d_nearest(x, 2)
                x = nn.Conv(
                    ch,
                    kernel_size=(3, 3, 3),
                    padding="SAME",
                    kernel_init=init,
                    dtype=compute_dtype,
                    name=f"conv{i}",
                )(x)
            if cfg.pixelnorm_f32:
                x = pixel_norm(x.astype(jnp.float32))
                x = leaky_relu(x, cfg.leak).astype(compute_dtype)
            else:
                x = leaky_relu(pixel_norm_mixed(x), cfg.leak)
            # optional spatial sharding of activations (halo exchange by
            # XLA; cfg.spatial_axis, core/config.py) for very large domains
            x = spatial_constraint(x, cfg.spatial_axis)

        x = nn.Conv(
            1,
            kernel_size=(3, 3, 3),
            padding="SAME",
            kernel_init=init,
            dtype=compute_dtype,
            name="head",
        )(x)
        return hour_softmax(x)
