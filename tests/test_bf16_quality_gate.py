"""bfloat16-default quality gate (VERDICT round-3 item 2).

bfloat16 is the framework's default training precision (quality proven at the
full 50-epoch protocol on TPU: daily-cycle corr 0.985, docs/PERF.md).  These
tests pin the invariants that make that flip safe:

* the default really is bfloat16, and --f32-parity / compute_dtype="float32"
  restores strict reference precision,
* parameters and the conservation softmax stay float32 regardless,
* conservation (fractions sum to 1 over the hour axis; scenarios re-sum to
  the conditioning daily total) holds EXACTLY under bf16 compute — the
  reference's core guarantee (gan_train_cwgangp_pixelnorm.py:346-347),
* a short bf16 training run stays finite and learns.
"""

import jax
import jax.numpy as jnp
import numpy as np

from prdisagg_tpu.core.config import ExperimentConfig, ModelConfig, TrainConfig
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.train import create_train_state, make_train_step

TINY_BF16 = ModelConfig(
    ndomain=16, latent_dim=8, gen_channels=(16, 16, 8), base_channels=16,
    critic_channels=(8, 8, 8, 8),
)


def test_default_compute_dtype_is_bfloat16():
    assert ModelConfig().compute_dtype == "bfloat16"
    assert TINY_BF16.compute_dtype == "bfloat16"
    # --f32-parity path restores strict reference precision
    assert ExperimentConfig(compute_dtype="float32").model().compute_dtype \
        == "float32"
    assert ExperimentConfig().model().compute_dtype == "bfloat16"


def test_params_and_softmax_stay_f32_under_bf16():
    state, gen, critic = create_train_state(TINY_BF16, TrainConfig(seed=0))
    for leaf in jax.tree_util.tree_leaves(state.gen_params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.critic_params):
        assert leaf.dtype == jnp.float32

    latent = jax.random.normal(jax.random.PRNGKey(0), (4, TINY_BF16.latent_dim))
    cond = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))
    frac = gen.apply(state.gen_params, latent, cond)
    # hour_softmax runs in f32 no matter the conv stack's dtype
    assert frac.dtype == jnp.float32
    # conservation: per-gridpoint fractions sum to 1 over the 24 hours
    np.testing.assert_allclose(
        np.asarray(jnp.sum(frac, axis=1)), 1.0, atol=1e-6)


def test_bf16_training_finite_and_conserving(synthetic_dataset):
    data, indices, dcfg = synthetic_dataset
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    train_cfg = TrainConfig(n_disc=2, seed=3)
    state, gen, critic = create_train_state(TINY_BF16, train_cfg)
    step = make_train_step(gen, critic, TINY_BF16, train_cfg, batch_size=4,
                           donate=False)
    losses = []
    for _ in range(4):
        state, m = step(state, ds)
        assert not bool(m["nonfinite"])
        losses.append(float(m["d_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert len(set(np.round(losses, 6))) > 1  # training is live

    # trained bf16 generator still conserves exactly: scenarios in mm re-sum
    # to the conditioning daily total (generate_scenarios semantics,
    # raindisagg_gan_pretrained.py:52-65)
    cond_mm = jnp.full((2, 16, 16, 1), 10.0)
    latent = jax.random.normal(jax.random.PRNGKey(9), (2, TINY_BF16.latent_dim))
    frac = gen.apply(state.gen_params, latent, cond_mm / 127.4)
    scen_mm = frac * cond_mm[:, None]
    np.testing.assert_allclose(
        np.asarray(jnp.sum(scen_mm, axis=1)), np.asarray(cond_mm),
        rtol=1e-5)


def test_f32_and_bf16_agree_statistically(synthetic_dataset):
    """bf16 and f32 forwards of the SAME params differ only at bf16 rounding
    level in aggregate statistics (the per-epoch quality protocol's first
    moment) — a cheap CPU proxy for the full 50-epoch TPU evidence run."""
    data, indices, dcfg = synthetic_dataset
    f32_cfg = ModelConfig(
        ndomain=16, latent_dim=8, gen_channels=(16, 16, 8), base_channels=16,
        critic_channels=(8, 8, 8, 8), compute_dtype="float32",
    )
    state, gen_bf16, _ = create_train_state(TINY_BF16, TrainConfig(seed=0))
    _, gen_f32, _ = create_train_state(f32_cfg, TrainConfig(seed=0))
    latent = jax.random.normal(jax.random.PRNGKey(2), (64, 8))
    cond = jax.random.uniform(jax.random.PRNGKey(3), (64, 16, 16, 1))
    out_b = np.asarray(gen_bf16.apply(state.gen_params, latent, cond))
    out_f = np.asarray(gen_f32.apply(state.gen_params, latent, cond))
    # same hour-mean profile within bf16 rounding of the logits
    np.testing.assert_allclose(out_b.mean(axis=(0, 2, 3, 4)),
                               out_f.mean(axis=(0, 2, 3, 4)), atol=2e-3)
