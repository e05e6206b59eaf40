"""Conditional critic (Wasserstein discriminator).

Architecture parity with the reference critic
(gan_train_cwgangp_pixelnorm.py:272-309): the daily-sum condition is
broadcast along the hour axis and concatenated as extra channel(s), then four
strided Conv3D blocks (64 VALID, then 128/256/256 SAME, all stride 2) with
LeakyReLU(0.2) + Dropout(0.25), flatten, and a linear score head.

The conditioning-channel count is a parameter so the doy/lon variants
(revision1/additional_inputs/..._doy.py:314) share this module.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from prdisagg_tpu.core.config import ModelConfig
from prdisagg_tpu.ops import leaky_relu, spatial_constraint


class Critic(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        cond: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """sample: (B, nhours, nd, nd, 1); cond: (B, nd, nd, n_cond_channels).

        Returns critic scores (B, 1).
        """
        cfg = self.cfg
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        # Keras leaves the critic at its default glorot_uniform init
        # (no explicit initializer at reference :286-304); match it
        init = nn.initializers.glorot_uniform()

        cond_b = jnp.broadcast_to(
            cond[:, None],
            (cond.shape[0], cfg.nhours, *cond.shape[1:]),
        )
        x = jnp.concatenate([sample, cond_b], axis=-1).astype(compute_dtype)

        for i, ch in enumerate(cfg.critic_channels):
            x = nn.Conv(
                ch,
                kernel_size=(3, 3, 3),
                strides=(2, 2, 2),
                padding="VALID" if i == 0 else "SAME",
                kernel_init=init,
                dtype=compute_dtype,
                name=f"conv{i}",
            )(x)
            x = leaky_relu(x, cfg.leak)
            x = nn.Dropout(rate=cfg.dropout_rate, deterministic=deterministic)(x)
            # optional spatial sharding (halo exchange; core/config.py)
            x = spatial_constraint(x, cfg.spatial_axis)

        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return nn.Dense(1, kernel_init=init, name="score")(x)
