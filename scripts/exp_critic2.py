"""Round-2 critic-side step experiments (VERDICT item 2).

Key insight from the FLOP budget: the generator forward for the fakes
(~1.34 GFLOP/sample) dwarfs the critic itself (~75 MFLOP/sample), so the 5
critic updates' cost is mostly 5 small-batch generator forwards.  Since the
generator is FROZEN during the critic updates (reference semantics:
gan_train_cwgangp_pixelnorm.py:363-392 — gen weights only change in the
generator step), all 5 fake batches can be generated in ONE 5B-batch forward
before the critic scan, with identical RNG streams => bitwise-equivalent
semantics, bigger MXU matmuls, fewer layout transforms.

Variants timed here (30 fused steps each, dependent-scalar host sync):
  base            current make_train_step
  hoist           5B pre-batched real-gather + gen forward, scan consumes slices
  hoist+unroll    same with lax.scan(unroll=n_disc)
Each in f32 and bf16.

Usage: python scripts/exp_critic2.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/prdisagg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import optax

from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.data.synthetic import make_synthetic_dataset
from prdisagg_tpu.train import create_train_state, make_train_step
from prdisagg_tpu.train.state import make_optimizer
from prdisagg_tpu.train.wgan_gp import METRIC_KEYS


def make_hoisted_step(gen, critic, model_cfg, train_cfg, batch_size,
                      unroll=1, merged3b=False, no_gp=False,
                      no_gen_update=False):
    tx = make_optimizer(train_cfg)
    n_disc = train_cfg.n_disc
    gp_weight = train_cfg.gp_weight
    latent_dim = model_cfg.latent_dim
    B = batch_size

    def critic_loss_fn(critic_params, frac_real, cond, fake, k_eps, k_d1, k_d3):
        eps = jax.random.uniform(k_eps, (B, 1, 1, 1, 1))
        interp = eps * frac_real + (1.0 - eps) * fake

        if merged3b:
            # ONE 3B forward: [real, fake, interp]; ONE vjp gives the GP
            # input-gradient (cotangent selects the interp scores)
            def apply3(x_interp):
                x = jnp.concatenate([frac_real, fake, x_interp], axis=0)
                c = jnp.concatenate([cond, cond, cond], axis=0)
                return critic.apply(critic_params, x, c,
                                    deterministic=False,
                                    rngs={"dropout": k_d1})

            scores, vjp = jax.vjp(apply3, interp)
            d_real = scores[:B]
            d_fake = scores[B:2 * B]
            if no_gp:
                gp = 0.0 * jnp.sum(scores)
            else:
                ct = jnp.zeros_like(scores).at[2 * B:].set(1.0)
                (grad_interp,) = vjp(ct)
                grad_norm = jnp.sqrt(jnp.sum(
                    jnp.square(grad_interp.reshape(B, -1)), axis=1) + 1e-12)
                gp = jnp.mean(jnp.square(grad_norm - 1.0))
        else:
            scores = critic.apply(
                critic_params,
                jnp.concatenate([frac_real, fake], axis=0),
                jnp.concatenate([cond, cond], axis=0),
                deterministic=False, rngs={"dropout": k_d1},
            )
            d_real = scores[:B]
            d_fake = scores[B:]

            def critic_sum(x):
                return jnp.sum(critic.apply(
                    critic_params, x, cond, deterministic=False,
                    rngs={"dropout": k_d3}))

            if no_gp:
                gp = 0.0 * jnp.sum(scores)
            else:
                grad_interp = jax.grad(critic_sum)(interp)
                grad_norm = jnp.sqrt(jnp.sum(
                    jnp.square(grad_interp.reshape(B, -1)), axis=1) + 1e-12)
                gp = jnp.mean(jnp.square(grad_norm - 1.0))
        loss_valid = jnp.mean(-d_real)
        loss_fake = jnp.mean(d_fake)
        loss = loss_valid + loss_fake + gp_weight * gp
        aux = {"d_loss": 0.5 * (loss_valid + loss_fake), "gp": gp,
               "w_distance": -(loss_valid + loss_fake)}
        return loss, aux

    def gen_loss_fn(gen_params, critic_params, ds, key):
        k_sample, k_d = jax.random.split(key)
        latent, cond = ds.sample_latent(k_sample, B, latent_dim, None)
        fake = gen.apply(gen_params, latent, cond)
        d_fake = critic.apply(critic_params, fake, cond,
                              deterministic=False, rngs={"dropout": k_d})
        return jnp.mean(-d_fake)

    def train_step(state, ds):
        key, key_gen, *keys_disc = jax.random.split(state.key, n_disc + 2)
        keys_disc = jnp.stack(keys_disc)
        sub = jax.vmap(lambda k: jax.random.split(k, 5))(keys_disc)
        k_real, k_lat, k_eps, k_d1, k_d3 = (sub[:, i] for i in range(5))

        # ---- hoisted: one 5B gather + one 5B generator forward ----
        frac_real, cond = jax.vmap(
            lambda k: ds.sample_real(k, B, None))(k_real)
        latent = jax.vmap(
            lambda k: jax.random.normal(k, (B, latent_dim)))(k_lat)
        nd = model_cfg.ndomain
        fake = gen.apply(
            state.gen_params,
            latent.reshape(n_disc * B, latent_dim),
            cond.reshape(n_disc * B, nd, nd, -1),
        ).reshape(frac_real.shape)
        fake = jax.lax.stop_gradient(fake)

        def critic_update(carry, xs):
            critic_params, critic_opt = carry
            fr, cd, fk, ke, k1, k3 = xs
            (_, aux), grads = jax.value_and_grad(
                critic_loss_fn, has_aux=True)(critic_params, fr, cd, fk,
                                              ke, k1, k3)
            updates, critic_opt = tx.update(grads, critic_opt, critic_params)
            critic_params = optax.apply_updates(critic_params, updates)
            aux["d_grad_norm"] = optax.global_norm(grads)
            return (critic_params, critic_opt), aux

        (critic_params, critic_opt), d_aux = jax.lax.scan(
            critic_update, (state.critic_params, state.critic_opt),
            (frac_real, cond, fake, k_eps, k_d1, k_d3), unroll=unroll)

        if no_gen_update:
            g_loss = d_aux["d_loss"][-1]
            gen_params, gen_opt = state.gen_params, state.gen_opt
            g_grads = jax.tree_util.tree_map(jnp.zeros_like, gen_params)
        else:
            g_loss, g_grads = jax.value_and_grad(gen_loss_fn)(
                state.gen_params, critic_params, ds, key_gen)
            g_updates, gen_opt = tx.update(g_grads, state.gen_opt,
                                           state.gen_params)
            gen_params = optax.apply_updates(state.gen_params, g_updates)

        metrics = {
            "d_loss": d_aux["d_loss"][-1],
            "d_loss_mean": jnp.mean(d_aux["d_loss"]),
            "gp": d_aux["gp"][-1],
            "w_distance": d_aux["w_distance"][-1],
            "d_grad_norm": d_aux["d_grad_norm"][-1],
            "g_loss": g_loss,
            "g_grad_norm": optax.global_norm(g_grads),
        }
        finite = jnp.all(jnp.stack([jnp.isfinite(v) for v in metrics.values()]))
        metrics["nonfinite"] = ~finite
        metrics["packed"] = jnp.stack(
            [metrics[k] for k in METRIC_KEYS]
            + [metrics["nonfinite"].astype(jnp.float32)])
        new_state = state.replace(
            step=state.step + 1, gen_params=gen_params,
            critic_params=critic_params, gen_opt=gen_opt,
            critic_opt=critic_opt, key=key)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def time_step(step, state, ds, n_steps=30):
    state, m = step(state, ds)
    assert not bool(m["nonfinite"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, ds)
    float(m["d_loss"])  # dependent-scalar sync
    dt = time.perf_counter() - t0
    return n_steps / dt, state


def main():
    which = sys.argv[1:] or ["base", "hoist", "hoist_unroll"]
    batch_size = 32
    data, indices, dcfg = make_synthetic_dataset(n_days=8, ny=64, nx=64,
                                                 seed=0)

    for dtype in ("float32", "bfloat16"):
        train_cfg = TrainConfig(seed=0)
        ds = DeviceDataset.from_numpy(data, indices, dcfg)
        for name in which:
            model_cfg = ModelConfig(
                compute_dtype=dtype, pixelnorm_f32="pnmix" not in name)
            kw = dict(unroll=train_cfg.n_disc)
            if "merged3b" in name:
                kw["merged3b"] = True
            if "nogp" in name:
                kw["no_gp"] = True
            if "criticonly" in name:
                kw["no_gen_update"] = True
            state, gen, critic = create_train_state(model_cfg, train_cfg)
            if name == "base":
                step = make_train_step(gen, critic, model_cfg, train_cfg,
                                       batch_size)
            elif name == "hoist":
                step = make_hoisted_step(gen, critic, model_cfg, train_cfg,
                                         batch_size, unroll=1)
            else:  # hoist_unroll[_merged3b][_pnmix][_nogp][_criticonly]
                step = make_hoisted_step(gen, critic, model_cfg, train_cfg,
                                         batch_size, **kw)
            sps, state = time_step(step, state, ds)
            print(f"{name:28s} {dtype:9s} {sps:7.1f} fused steps/s",
                  flush=True)


if __name__ == "__main__":
    main()
