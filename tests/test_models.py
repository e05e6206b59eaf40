import jax
import jax.numpy as jnp
import numpy as np

from prdisagg_tpu.core.config import ModelConfig
from prdisagg_tpu.models import Critic, Generator


def _init(model_cfg, seed=0):
    gen = Generator(model_cfg)
    critic = Critic(model_cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    latent = jnp.zeros((2, model_cfg.latent_dim))
    cond = jnp.zeros(
        (2, model_cfg.ndomain, model_cfg.ndomain, model_cfg.n_cond_channels)
    )
    sample = jnp.zeros((2, model_cfg.nhours, model_cfg.ndomain, model_cfg.ndomain, 1))
    return gen, gen.init(k1, latent, cond), critic, critic.init(k2, sample, cond)

# whole module is part of the quick smoke tier (VERDICT r4 item 8)
import pytest

pytestmark = pytest.mark.quick

def test_generator_output_shape_and_conservation():
    cfg = ModelConfig()
    gen, gp, _, _ = _init(cfg)
    latent = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.latent_dim))
    cond = jax.random.uniform(jax.random.PRNGKey(2), (3, 16, 16, 1))
    out = gen.apply(gp, latent, cond)
    assert out.shape == (3, 24, 16, 16, 1)
    # exact conservation: softmax fractions sum to 1 over the hour axis
    np.testing.assert_allclose(np.asarray(out.sum(axis=1)), 1.0, atol=1e-5)
    assert not np.any(np.isnan(np.asarray(out)))


def test_generator_large_domain_scaling():
    # large-domain variant: latent grid scales as ndomain//8
    # (alternative_domains/gan_train_cwgangp_pixelnorm_largedomain.py:323-335)
    cfg = ModelConfig(ndomain=64)
    assert cfg.latent_grid == (3, 8, 8)
    gen, gp, _, _ = _init(cfg)
    latent = jnp.zeros((1, cfg.latent_dim))
    cond = jnp.zeros((1, 64, 64, 1))
    out = gen.apply(gp, latent, cond)
    assert out.shape == (1, 24, 64, 64, 1)


def test_critic_output_shape_and_stride_stack():
    cfg = ModelConfig()
    _, _, critic, cp = _init(cfg)
    sample = jax.random.uniform(jax.random.PRNGKey(3), (4, 24, 16, 16, 1))
    cond = jax.random.uniform(jax.random.PRNGKey(4), (4, 16, 16, 1))
    out = critic.apply(cp, sample, cond)
    assert out.shape == (4, 1)
    # first VALID stride-2 conv: kernel (3,3,3,2,64) as in the reference
    k0 = cp["params"]["conv0"]["kernel"]
    assert k0.shape == (3, 3, 3, cfg.n_cond_channels + 1, 64)


def test_critic_multi_channel_conditioning():
    cfg = ModelConfig(n_cond_channels=3)
    _, _, critic, cp = _init(cfg)
    sample = jnp.zeros((2, 24, 16, 16, 1))
    cond = jnp.zeros((2, 16, 16, 3))
    out = critic.apply(cp, sample, cond)
    assert out.shape == (2, 1)
    assert cp["params"]["conv0"]["kernel"].shape[3] == 4


def test_generator_param_structure_matches_reference_layout():
    """Layer shapes must match the reference generator so reference .h5
    weights can be imported (gan_train_cwgangp_pixelnorm.py:312-357)."""
    cfg = ModelConfig()
    _, gp, _, _ = _init(cfg)
    p = gp["params"]
    # dense: (latent 100 + 16*16 cond) -> 256*2*2*3
    assert p["latent_proj"]["kernel"].shape == (100 + 256, 3072)
    assert p["conv0"]["kernel"].shape == (3, 3, 3, 256, 256)
    assert p["conv1"]["kernel"].shape == (3, 3, 3, 256, 128)
    assert p["conv2"]["kernel"].shape == (3, 3, 3, 128, 64)
    assert p["head"]["kernel"].shape == (3, 3, 3, 64, 1)


def test_critic_dropout_stochastic_in_train_mode():
    cfg = ModelConfig()
    _, _, critic, cp = _init(cfg)
    sample = jax.random.uniform(jax.random.PRNGKey(5), (2, 24, 16, 16, 1))
    cond = jax.random.uniform(jax.random.PRNGKey(6), (2, 16, 16, 1))
    o1 = critic.apply(cp, sample, cond, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(7)})
    o2 = critic.apply(cp, sample, cond, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(8)})
    o3 = critic.apply(cp, sample, cond)  # deterministic
    o4 = critic.apply(cp, sample, cond)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(o3), np.asarray(o4))


def test_fused_upsample_conv_equals_direct():
    """The folded phase-conv generator path is numerically identical to
    upsample+conv with the same parameters (ops/fused_upsample_conv.py):
    bit-tight in f32; within rounding in the default bf16 (the folding
    itself is exact — only conv accumulation order differs)."""
    import dataclasses

    import jax.numpy as jnp

    for dtype, atol in (("float32", 2e-6), ("bfloat16", 2e-2)):
        cfg_d = dataclasses.replace(
            ModelConfig(latent_dim=8, gen_channels=(8, 8, 8), base_channels=8,
                        critic_channels=(8, 8, 8, 8), compute_dtype=dtype),
            fused_upsample=False,
        )
        cfg_f = dataclasses.replace(cfg_d, fused_upsample=True)
        gen_d, gen_f = Generator(cfg_d), Generator(cfg_f)
        latent = jnp.asarray(np.random.RandomState(0).randn(2, 8), jnp.float32)
        cond = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 1),
                           jnp.float32)
        p = gen_d.init(jax.random.PRNGKey(0), latent, cond)
        out_d = gen_d.apply(p, latent, cond)
        out_f = gen_f.apply(p, latent, cond)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                                   atol=atol, err_msg=dtype)
