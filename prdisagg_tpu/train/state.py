"""Training state: generator + critic params, both optimizer states, RNG.

Unlike the reference — which holds no optimizer state on disk and cannot
resume (SURVEY.md §5 checkpoint row) — the full state here is one pytree, so
checkpoint/resume is exact.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.models import Critic, Generator


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam(1e-4, beta1=0, beta2=0.9) per the WGAN-GP paper
    (reference: gan_train_cwgangp_pixelnorm.py:384-385)."""
    return optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2)


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    gen_params: Any
    critic_params: Any
    gen_opt: Any
    critic_opt: Any
    key: jax.Array
    # EMA of gen_params (TrainConfig.ema_decay > 0), else None — a None
    # field adds no pytree leaves, so the default protocol's step program
    # and existing checkpoints are unchanged
    ema_gen_params: Any = None


def create_train_state(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    seed: int | None = None,
) -> tuple[GANTrainState, Generator, Critic]:
    seed = train_cfg.seed if seed is None else seed
    from prdisagg_tpu.utils.rng import set_rng_impl

    set_rng_impl(train_cfg.rng_impl)
    gen = Generator(model_cfg)
    critic = Critic(model_cfg)

    key = jax.random.PRNGKey(seed)
    k_gen, k_critic, k_state = jax.random.split(key, 3)

    latent = jnp.zeros((1, model_cfg.latent_dim))
    cond = jnp.zeros((1, model_cfg.ndomain, model_cfg.ndomain, model_cfg.n_cond_channels))
    sample = jnp.zeros((1, model_cfg.nhours, model_cfg.ndomain, model_cfg.ndomain, 1))

    gen_params = gen.init(k_gen, latent, cond)
    critic_params = critic.init(k_critic, sample, cond)

    tx = make_optimizer(train_cfg)
    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        critic_params=critic_params,
        gen_opt=tx.init(gen_params),
        critic_opt=tx.init(critic_params),
        key=k_state,
        ema_gen_params=(jax.tree_util.tree_map(jnp.copy, gen_params)
                        if train_cfg.ema_decay > 0 else None),
    )
    return state, gen, critic


def _load_weight_file(path: str, loader_h5, cfg=None, **kw):
    from prdisagg_tpu.models.io import load_params_npz

    if path.endswith(".h5"):
        return loader_h5(path, cfg, **kw)
    return load_params_npz(path)


def infer_model_config_from_weights(
    gen_weights: str,
    critic_weights: str | None = None,
    compute_dtype: str = "bfloat16",
) -> ModelConfig:
    """Reconstruct the full ModelConfig from weight files alone.

    The critic's conv0 input channels pin n_cond_channels exactly — the one
    thing generator-weight inference cannot see (doy/lon variants) — so the
    critic, when present, is inferred first; the generator-derived ndomain
    then disambiguates the critic's (score-dim-ambiguous) domain and the
    critic supplies the stage widths.

    This is the TRAINING warm-start entry, so `compute_dtype` defaults to
    the bf16 training protocol (the pure inference loaders in models/io.py
    default float32 for reference-predict parity).
    """
    import dataclasses

    from prdisagg_tpu.models.io import (
        infer_critic_config,
        infer_generator_config,
        load_keras_critic_h5,
        load_keras_generator_h5,
    )

    critic_params = None
    n_cond = 1
    if critic_weights is not None:
        critic_params = _load_weight_file(critic_weights,
                                          load_keras_critic_h5)
        n_cond = infer_critic_config(critic_params).n_cond_channels
    gen_params = _load_weight_file(gen_weights, load_keras_generator_h5,
                                   n_cond_channels=n_cond)
    model_cfg = infer_generator_config(gen_params, n_cond_channels=n_cond)
    if critic_params is not None:
        # validates the critic against the generator-derived domain and
        # recovers the stage widths
        ccfg = infer_critic_config(critic_params, ndomain=model_cfg.ndomain)
        model_cfg = dataclasses.replace(
            model_cfg, critic_channels=ccfg.critic_channels)
    return dataclasses.replace(model_cfg, compute_dtype=compute_dtype)


def warm_start(
    model_cfg: ModelConfig | None,
    train_cfg: TrainConfig,
    gen_weights: str,
    critic_weights: str | None = None,
) -> tuple[GANTrainState, Generator, Critic]:
    """Build a training state warm-started from saved weights — the
    reference's continue-training workflow (it reloads BOTH nets from .h5
    with fresh optimizers; gan_train_cwgangp_pixelnorm.py:520-529 +
    start_epoch).

    Weight files may be native .npz exports or reference Keras .h5.  With
    model_cfg=None the full architecture is inferred from the weight files
    (:func:`infer_model_config_from_weights`).
    """
    from prdisagg_tpu.models.io import (
        load_keras_critic_h5,
        load_keras_generator_h5,
        load_params_npz,
    )

    if model_cfg is None:
        model_cfg = infer_model_config_from_weights(gen_weights,
                                                    critic_weights)

    state, gen, critic = create_train_state(model_cfg, train_cfg)
    if gen_weights.endswith(".h5"):
        gen_params = load_keras_generator_h5(gen_weights, model_cfg)
    else:
        gen_params = load_params_npz(gen_weights)
        # .h5 loads validate against the config internally; give the .npz
        # path the same immediate error instead of a cryptic XLA shape
        # mismatch inside the (possibly remotely compiled) fused step
        from prdisagg_tpu.models.io import _check_generator_shapes

        _check_generator_shapes(
            gen_params.get("params", gen_params), model_cfg, gen_weights)
    critic_params = state.critic_params
    if critic_weights is not None:
        if critic_weights.endswith(".h5"):
            critic_params = load_keras_critic_h5(critic_weights, model_cfg)
        else:
            critic_params = load_params_npz(critic_weights)
            from prdisagg_tpu.models.io import _check_critic_shapes

            _check_critic_shapes(
                critic_params.get("params", critic_params), model_cfg,
                critic_weights)

    tx = make_optimizer(train_cfg)
    state = state.replace(
        gen_params=gen_params,
        critic_params=critic_params,
        gen_opt=tx.init(gen_params),
        critic_opt=tx.init(critic_params),
    )
    return state, gen, critic
