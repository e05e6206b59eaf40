import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.train import create_train_state, make_train_step


@pytest.fixture(scope="module")
def small_setup(request):
    """Tiny model + synthetic data so the fused step compiles fast on CPU."""
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset

    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32, seed=1)
    model_cfg = ModelConfig(
        ndomain=16,
        latent_dim=8,
        gen_channels=(16, 16, 8),
        base_channels=16,
        critic_channels=(8, 8, 8, 8),
        # these tests pin exact loss semantics via unjitted external replays;
        # f32 keeps the comparisons at rtol 1e-4 (bf16 training itself is
        # covered by tests/test_bf16_quality_gate.py)
        compute_dtype="float32",
    )
    train_cfg = TrainConfig(n_disc=2, seed=0)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    state, gen, critic = create_train_state(model_cfg, train_cfg)
    return ds, state, gen, critic, model_cfg, train_cfg


@pytest.mark.quick
def test_fused_step_runs_and_updates(small_setup):
    ds, state, gen, critic, model_cfg, train_cfg = small_setup
    step = make_train_step(gen, critic, model_cfg, train_cfg, batch_size=4,
                           donate=False)
    new_state, metrics = step(state, ds)

    assert int(new_state.step) == 1
    for k in ("d_loss", "g_loss", "gp", "d_grad_norm", "g_grad_norm"):
        assert np.isfinite(float(metrics[k])), k
    assert not bool(metrics["nonfinite"])

    # both networks' params must actually change
    def changed(a, b):
        leaves_a = jax.tree_util.tree_leaves(a)
        leaves_b = jax.tree_util.tree_leaves(b)
        return any(not np.allclose(x, y) for x, y in zip(leaves_a, leaves_b))

    assert changed(state.gen_params, new_state.gen_params)
    assert changed(state.critic_params, new_state.critic_params)


def test_loss_decreases_over_steps(small_setup):
    """Smoke train: the negative critic loss (~W-distance estimate) should
    move and remain finite over a handful of fused steps."""
    ds, state, gen, critic, model_cfg, train_cfg = small_setup
    step = make_train_step(gen, critic, model_cfg, train_cfg, batch_size=4,
                           donate=False)
    losses = []
    s = state
    for _ in range(5):
        s, m = step(s, ds)
        assert not bool(m["nonfinite"])
        losses.append(float(m["d_loss"]))
    assert int(s.step) == 5
    assert all(np.isfinite(l) for l in losses)
    # gradient penalty should pull ||grad|| toward 1 => gp finite and shrinking
    # is not guaranteed in 5 steps; just require variation (training is live)
    assert len(set(np.round(losses, 6))) > 1


def test_fused_step_metrics_match_external_computation(small_setup):
    """Pin the PRODUCTION loss path: replay the fused step's exact RNG
    splits outside the step (matched dropout masks) and assert the reported
    `gp` and `d_loss` metrics equal the externally computed values
    (VERDICT round-2 item 9; reference loss semantics
    gan_train_cwgangp_pixelnorm.py:376-392,475)."""
    ds, state, gen, critic, model_cfg, _ = small_setup
    train_cfg = TrainConfig(n_disc=1, seed=0)  # one critic update => the
    # reported metrics come from the update on the UNMODIFIED initial params
    B = 4
    step = make_train_step(gen, critic, model_cfg, train_cfg, batch_size=B,
                           donate=False)
    _, metrics = step(state, ds)

    # --- external replay of critic_loss_fn's RNG tree -------------------
    _, _, k_disc0 = jax.random.split(state.key, 3)  # n_disc + 2 keys
    k_real, k_lat, k_eps, k_d1, k_d3 = jax.random.split(k_disc0, 5)

    frac_real, cond = ds.sample_real(k_real, B, None)
    latent = jax.random.normal(k_lat, (B, model_cfg.latent_dim))
    fake = gen.apply(state.gen_params, latent, cond)

    scores = critic.apply(
        state.critic_params,
        jnp.concatenate([frac_real, fake], axis=0),
        jnp.concatenate([cond, cond], axis=0),
        deterministic=False,
        rngs={"dropout": k_d1},
    )
    loss_valid = float(jnp.mean(-scores[:B]))
    loss_fake = float(jnp.mean(scores[B:]))

    eps = jax.random.uniform(k_eps, (B, 1, 1, 1, 1))
    interp = eps * frac_real + (1.0 - eps) * fake

    def critic_sum(x):
        return jnp.sum(critic.apply(
            state.critic_params, x, cond, deterministic=False,
            rngs={"dropout": k_d3},
        ))

    g = jax.grad(critic_sum)(interp)
    norms = jnp.sqrt(jnp.sum(g.reshape(B, -1) ** 2, axis=1) + 1e-12)
    gp_external = float(jnp.mean((norms - 1.0) ** 2))

    np.testing.assert_allclose(float(metrics["gp"]), gp_external, rtol=1e-4)
    # reference-reported d_loss = mean of (valid, fake) wasserstein losses
    np.testing.assert_allclose(
        float(metrics["d_loss"]), 0.5 * (loss_valid + loss_fake), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["w_distance"]), -(loss_valid + loss_fake), rtol=1e-4
    )


def test_gradient_penalty_matches_manual_computation(small_setup):
    """Validate the second-order GP term against a hand-rolled computation
    on a fixed batch (reference semantics:
    gan_train_cwgangp_pixelnorm.py:230-244,376-392)."""
    ds, state, gen, critic, model_cfg, train_cfg = small_setup

    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    frac, cond = ds.sample_real(k1, 4)
    latent = jax.random.normal(k2, (4, model_cfg.latent_dim))
    fake = gen.apply(state.gen_params, latent, cond)
    eps = jax.random.uniform(k3, (4, 1, 1, 1, 1))
    interp = eps * frac + (1 - eps) * fake

    def f(x):
        return jnp.sum(critic.apply(state.critic_params, x, cond))

    g = jax.grad(f)(interp)
    norms = jnp.sqrt(jnp.sum(g.reshape(4, -1) ** 2, axis=1))
    gp_manual = float(jnp.mean((norms - 1.0) ** 2))

    # same thing via jacobian row-norms (independent formulation)
    def f_single(x, c):
        return critic.apply(
            state.critic_params, x[None], c[None]
        )[0, 0]

    g2 = jax.vmap(jax.grad(f_single))(interp, cond)
    norms2 = jnp.sqrt(jnp.sum(g2.reshape(4, -1) ** 2, axis=1))
    gp_manual2 = float(jnp.mean((norms2 - 1.0) ** 2))

    assert np.isfinite(gp_manual)
    np.testing.assert_allclose(gp_manual, gp_manual2, rtol=1e-4)


def test_fused_gen_forward_matches_default(small_setup):
    """The fused_gen_forward restructure (one (n_disc+1)*B generator forward
    under vjp, gradient replayed after the critic scan) is semantically
    IDENTICAL to the default path — same RNG streams, same final critic
    params for the generator loss — so every metric and both updated param
    trees must match to fp tolerance (only summation order differs in the
    generator backward)."""
    ds, state, gen, critic, model_cfg, train_cfg = small_setup
    step_a = make_train_step(gen, critic, model_cfg, train_cfg, batch_size=4,
                             donate=False)
    step_b = make_train_step(gen, critic, model_cfg, train_cfg, batch_size=4,
                             donate=False, fused_gen_forward=True)
    sa, ma = step_a(state, ds)
    sb, mb = step_b(state, ds)
    for k in ("d_loss", "g_loss", "gp", "w_distance", "d_grad_norm",
              "g_grad_norm"):
        np.testing.assert_allclose(float(ma[k]), float(mb[k]), rtol=2e-4,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(sa.gen_params),
                    jax.tree_util.tree_leaves(sb.gen_params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(sa.critic_params),
                    jax.tree_util.tree_leaves(sb.critic_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_generator_tracking(small_setup):
    """TrainConfig.ema_decay > 0 maintains an EMA of the generator params in
    the fused step: after one step ema = d*init + (1-d)*new, and the live
    params are untouched.  With ema off the field stays None and the state
    pytree has exactly the default leaf count (no program change)."""
    import dataclasses

    from prdisagg_tpu.core.config import TrainConfig as TC

    ds, state0, gen, critic, model_cfg, train_cfg = small_setup
    # default: off
    assert state0.ema_gen_params is None
    cfg_ema = dataclasses.replace(train_cfg, ema_decay=0.9)
    from prdisagg_tpu.train import create_train_state

    state, gen2, critic2 = create_train_state(model_cfg, cfg_ema)
    assert state.ema_gen_params is not None
    step = make_train_step(gen2, critic2, model_cfg, cfg_ema, batch_size=4,
                           donate=False)
    init_gen = jax.device_get(state.gen_params)
    new_state, m = step(state, ds)
    assert not bool(m["nonfinite"])
    for e, p0, p1 in zip(
        jax.tree_util.tree_leaves(new_state.ema_gen_params),
        jax.tree_util.tree_leaves(init_gen),
        jax.tree_util.tree_leaves(new_state.gen_params),
    ):
        np.testing.assert_allclose(
            np.asarray(e, np.float32),
            0.9 * np.asarray(p0, np.float32)
            + 0.1 * np.asarray(p1, np.float32), rtol=2e-5, atol=1e-7)

    # off-path leaf count unchanged vs a state built with ema
    n_default = len(jax.tree_util.tree_leaves(state0))
    n_ema = len(jax.tree_util.tree_leaves(state))
    n_gen = len(jax.tree_util.tree_leaves(state0.gen_params))
    assert n_ema == n_default + n_gen


def test_hoisted_chunks_matches_one_shot():
    """TrainConfig.hoisted_chunks (the 64x64 memory lever) must produce the
    SAME step as the one-shot hoisted forward — same samples, same RNG
    streams, identical losses to fp tolerance — and reject invalid
    configurations."""
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset

    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32,
                                                 seed=3)
    model_cfg = ModelConfig(
        ndomain=16, latent_dim=8, gen_channels=(16, 16, 8),
        base_channels=16, critic_channels=(8, 8, 8, 8),
        compute_dtype="float32",
    )
    train_cfg = TrainConfig(n_disc=2, seed=7)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    state, gen, critic = create_train_state(model_cfg, train_cfg)

    step1 = make_train_step(gen, critic, model_cfg, train_cfg, batch_size=4,
                            donate=False)
    _, m1 = step1(state, ds)
    step2 = make_train_step(gen, critic, model_cfg, train_cfg, batch_size=4,
                            donate=False, hoisted_chunks=2)
    _, m2 = step2(state, ds)
    for k in ("d_loss", "g_loss", "gp", "w_distance"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5,
                                   err_msg=k)

    # config plumbing: TrainConfig.hoisted_chunks reaches the step builder
    tc_chunked = TrainConfig(n_disc=2, seed=7, hoisted_chunks=2)
    step3 = make_train_step(gen, critic, model_cfg, tc_chunked, batch_size=4,
                            donate=False)
    _, m3 = step3(state, ds)
    np.testing.assert_allclose(float(m1["d_loss"]), float(m3["d_loss"]),
                               rtol=1e-5)

    with pytest.raises(ValueError, match="must divide"):
        make_train_step(gen, critic, model_cfg, train_cfg, batch_size=4,
                        donate=False, hoisted_chunks=3)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_step(gen, critic, model_cfg, train_cfg, batch_size=4,
                        donate=False, hoisted_chunks=2,
                        fused_gen_forward=True)


def test_hoisted_chunk_samples_auto():
    """hoisted_chunk_samples caps per-chunk sample count per schedule
    stage: under the cap -> one-shot, over it -> the smallest dividing
    chunk count."""
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset

    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32,
                                                 seed=3)
    model_cfg = ModelConfig(
        ndomain=16, latent_dim=8, gen_channels=(16, 16, 8),
        base_channels=16, critic_channels=(8, 8, 8, 8),
        compute_dtype="float32",
    )
    tc = TrainConfig(n_disc=2, seed=7, hoisted_chunk_samples=8)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    state, gen, critic = create_train_state(model_cfg, tc)

    # b4: n_disc*B = 8 <= cap -> one-shot; must equal the plain step
    ref = make_train_step(gen, critic, model_cfg,
                          TrainConfig(n_disc=2, seed=7), batch_size=4,
                          donate=False)
    _, m_ref = ref(state, ds)
    s4 = make_train_step(gen, critic, model_cfg, tc, batch_size=4,
                         donate=False)
    _, m4 = s4(state, ds)
    np.testing.assert_allclose(float(m_ref["d_loss"]), float(m4["d_loss"]),
                               rtol=1e-6)
    # b8: n_disc*B = 16 > cap -> 2 chunks of 8; equals the plain step to
    # fp tolerance (identical samples, chunked summation)
    ref8 = make_train_step(gen, critic, model_cfg,
                           TrainConfig(n_disc=2, seed=7), batch_size=8,
                           donate=False)
    _, m_ref8 = ref8(state, ds)
    s8 = make_train_step(gen, critic, model_cfg, tc, batch_size=8,
                         donate=False)
    _, m8 = s8(state, ds)
    np.testing.assert_allclose(float(m_ref8["d_loss"]),
                               float(m8["d_loss"]), rtol=1e-5)
