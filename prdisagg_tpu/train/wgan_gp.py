"""Fused cWGAN-GP train step.

The reference drives 5 critic `train_on_batch` calls plus 1 generator call per
step from Python, crossing the host<->device boundary 6 times
(gan_train_cwgangp_pixelnorm.py:463-482).  Here the whole inner loop — data
sampling from HBM, n_disc critic updates via `lax.scan` (including the
second-order gradient-penalty autodiff), and the generator update — is ONE
jitted function.  XLA sees the full step, fuses everything, and under a data
mesh partitions the batch with gradient all-reduce over ICI.

Loss semantics (parity with gan_train_cwgangp_pixelnorm.py:360-408,452-454):
  critic:    mean(-D(real)) + mean(D(fake)) + gp_weight * mean((||g||-1)^2)
             with fake = G(z, cond_real), g = dD/d(interp),
             interp = eps*real + (1-eps)*fake, eps ~ U(0,1) per sample
  generator: mean(-D(G(z, cond), cond)) with freshly sampled cond
  reported d_loss = mean(valid_loss, fake_loss) of the last critic update
             (the quantity printed by the reference, :475)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.models import Critic, Generator
from prdisagg_tpu.train.state import GANTrainState, make_optimizer

# order of the scalar metrics in the packed vector (one host fetch instead of
# seven — each fetch costs a full RTT on the tunneled TPU platform)
METRIC_KEYS = (
    "d_loss", "d_loss_mean", "gp", "w_distance",
    "d_grad_norm", "g_loss", "g_grad_norm",
)


def unpack_metrics(packed) -> dict:
    """Packed (8,) device vector -> python dict (single host transfer)."""
    import numpy as np

    vals = np.asarray(packed)
    m = dict(zip(METRIC_KEYS, vals[:-1].tolist()))
    m["nonfinite"] = bool(vals[-1])
    return m


def _batch_sharder(mesh: Optional[Mesh], axis: str = "data") -> Callable:
    """Returns a function constraining arrays to be batch-sharded on `mesh`.

    With no mesh (single chip) it is the identity; under a mesh the
    constraint makes the XLA partitioner shard every per-sample computation
    (sampling, model fwd/bwd) along the data axis and insert the gradient
    all-reduce automatically.
    """
    if mesh is None or mesh.size == 1:
        return lambda x: x

    def shard(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return shard


def make_train_step(
    gen: Generator,
    critic: Critic,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    batch_size: int,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    steps_per_call: int = 1,
    fused_gen_forward: bool = False,
    hoisted_chunks: Optional[int] = None,
):
    """Build the fused jitted train step: (state, ds) -> (state, metrics).

    metrics: dict with d_loss (reference-reported), d_loss_mean (over the
    n_disc updates), g_loss, gp, d_grad_norm, g_grad_norm, nonfinite flag.

    steps_per_call > 1 wraps that many fused steps in one `lax.scan` —
    one host dispatch per K steps (host-loop overhead on the tunneled TPU is
    ~4 ms/dispatch); returned metrics are the last step's, with `nonfinite`
    OR-ed over the whole chunk so the NaN guard still fires.

    fused_gen_forward=True is the architecture-level restructure candidate
    (docs/PERF.md round 4): the generator-update batch joins the hoisted
    critic-side batch in ONE (n_disc+1)*B forward under `jax.vjp`, and the
    generator gradient is recovered AFTER the critic scan by replaying that
    vjp with a cotangent that is zero on the critic-side slices.  Exactly
    the reference's semantics (fresh latents, final critic params — same
    RNG streams as the default path; only fp summation order differs in the
    generator backward).  It trades a bigger generator backward
    ((n_disc+1)*B instead of B) for fewer, larger kernels — a win only if
    the step is layout/latency-bound, so it is measured, not assumed.
    """
    tx = make_optimizer(train_cfg)
    shard = _batch_sharder(mesh)
    n_disc = train_cfg.n_disc
    # memory lever (TrainConfig.hoisted_chunks): chunk the hoisted
    # (n_disc*B) generator forward; peak HLO temp scales ~1/chunks
    hoisted_chunks = (train_cfg.hoisted_chunks if hoisted_chunks is None
                      else hoisted_chunks)
    if hoisted_chunks <= 1 and train_cfg.hoisted_chunk_samples:
        # per-stage auto mode: smallest chunk count that (a) divides
        # n_disc*B and (b) keeps each chunk at or under the sample cap
        total = n_disc * batch_size
        cap = train_cfg.hoisted_chunk_samples
        hoisted_chunks = next(
            (c for c in range(max(1, -(-total // cap)), total + 1)
             if total % c == 0 and total // c <= cap), total)
    if hoisted_chunks > 1:
        if fused_gen_forward:
            raise ValueError(
                "hoisted_chunks and fused_gen_forward are mutually "
                "exclusive (the fused path needs one vjp forward)")
        if (n_disc * batch_size) % hoisted_chunks:
            raise ValueError(
                f"hoisted_chunks={hoisted_chunks} must divide "
                f"n_disc*batch_size={n_disc * batch_size}")
    gp_weight = train_cfg.gp_weight
    latent_dim = model_cfg.latent_dim
    # Pallas gather: None = auto by data size (TrainConfig.pallas_gather);
    # under a mesh it runs via shard_map on per-device batch shards
    # (ops/pallas_gather.py::gather_patches_pallas_sharded)
    allow_pallas = train_cfg.pallas_gather
    sample_mesh = mesh if (mesh is not None and mesh.size > 1) else None

    def critic_loss_fn(critic_params, frac_real, cond, fake, k_eps, k_d1,
                       k_d3):
        """One critic update's loss on PRE-SAMPLED data and PRE-GENERATED
        fakes (see the hoisting note in train_step)."""
        frac_real, cond = shard(frac_real), shard(cond)

        # one 2B critic call for real+fake (fewer, larger kernels; dropout
        # masks remain independent per sample — statistically identical to
        # two separate calls)
        scores = critic.apply(
            critic_params,
            jnp.concatenate([frac_real, fake], axis=0),
            jnp.concatenate([cond, cond], axis=0),
            deterministic=False,
            rngs={"dropout": k_d1},
        )
        d_real = scores[:batch_size]
        d_fake = scores[batch_size:]

        eps = jax.random.uniform(k_eps, (batch_size, 1, 1, 1, 1))
        eps = shard(eps)
        interp = eps * frac_real + (1.0 - eps) * fake

        def critic_sum(x):
            scores = critic.apply(
                critic_params, x, cond, deterministic=False,
                rngs={"dropout": k_d3},
            )
            return jnp.sum(scores)

        grad_interp = jax.grad(critic_sum)(interp)
        grad_norm = jnp.sqrt(
            jnp.sum(jnp.square(grad_interp.reshape(batch_size, -1)), axis=1) + 1e-12
        )
        gp = jnp.mean(jnp.square(grad_norm - 1.0))

        loss_valid = jnp.mean(-d_real)   # wasserstein_loss(y=-1, D(real))
        loss_fake = jnp.mean(d_fake)     # wasserstein_loss(y=+1, D(fake))
        loss = loss_valid + loss_fake + gp_weight * gp
        aux = {
            "d_loss": 0.5 * (loss_valid + loss_fake),
            "gp": gp,
            "w_distance": -(loss_valid + loss_fake),
        }
        return loss, aux

    def gen_loss_fn(gen_params, critic_params, ds: DeviceDataset, key):
        k_sample, k_d = jax.random.split(key)
        latent, cond = ds.sample_latent(k_sample, batch_size, latent_dim,
                                        allow_pallas, sample_mesh)
        latent, cond = shard(latent), shard(cond)
        fake = gen.apply(gen_params, latent, cond)
        d_fake = critic.apply(
            critic_params, fake, cond, deterministic=False, rngs={"dropout": k_d}
        )
        return jnp.mean(-d_fake)  # wasserstein_loss(y=-1, D(fake))

    def train_step(state: GANTrainState, ds: DeviceDataset):
        key, key_gen, *keys_disc = jax.random.split(state.key, n_disc + 2)

        # ---- hoisted critic-side data/fakes (round-2 perf, docs/PERF.md) --
        # The generator is FROZEN across the n_disc critic updates (its
        # params only change in the generator step, reference
        # gan_train_cwgangp_pixelnorm.py:363-408), and the generator forward
        # dominates each update's FLOPs (~1.34 GF/sample vs ~75 MF for the
        # critic).  So all n_disc fake batches are generated in ONE
        # (n_disc*B) forward before the scan, and the real batches gathered
        # up front — same per-update RNG streams as the scanned form, bigger
        # MXU matmuls, fewer layout transforms (+25% step rate in bf16).
        sub = [jax.random.split(k, 5) for k in keys_disc]
        frs, cds = zip(*[
            ds.sample_real(s[0], batch_size, allow_pallas, sample_mesh)
            for s in sub
        ])
        frac_real = jnp.stack(frs)                       # (n_disc, B, ...)
        cond = jnp.stack(cds)
        latent = jnp.stack([
            jax.random.normal(s[1], (batch_size, latent_dim)) for s in sub
        ])
        k_eps = jnp.stack([s[2] for s in sub])
        k_d1 = jnp.stack([s[3] for s in sub])
        k_d3 = jnp.stack([s[4] for s in sub])

        def flat(x):
            return x.reshape(n_disc * batch_size, *x.shape[2:])

        if fused_gen_forward:
            # the generator-update batch rides the hoisted forward: one
            # (n_disc+1)*B gen.apply under vjp; its residuals stay live
            # across the critic scan and the gen gradient is replayed below
            k_sample, k_d_gen = jax.random.split(key_gen)
            lat_g, cond_g = ds.sample_latent(k_sample, batch_size,
                                             latent_dim, allow_pallas,
                                             sample_mesh)
            lat_all = shard(jnp.concatenate([flat(latent), lat_g]))
            cond_all = shard(jnp.concatenate([flat(cond), cond_g]))
            fake_all, gen_vjp = jax.vjp(
                lambda p: gen.apply(p, lat_all, cond_all), state.gen_params)
            fake = jax.lax.stop_gradient(
                fake_all[: n_disc * batch_size]).reshape(
                n_disc, batch_size, *fake_all.shape[1:])
        elif hoisted_chunks > 1:
            # sequential chunked forward: same samples/RNG as the one-shot
            # hoisted forward (latents are computed above), ~1/chunks the
            # peak activation memory, B-or-larger kernels kept
            lat_f, cond_f = flat(latent), flat(cond)
            lat_c = lat_f.reshape(hoisted_chunks, -1, *lat_f.shape[1:])
            cond_c = cond_f.reshape(hoisted_chunks, -1, *cond_f.shape[1:])

            def chunk_fwd(xs):
                la, co = xs
                return gen.apply(state.gen_params, shard(la), shard(co))

            fake = jax.lax.map(chunk_fwd, (lat_c, cond_c))
            fake = jax.lax.stop_gradient(fake).reshape(
                n_disc, batch_size, *fake.shape[2:])
        else:
            fake = gen.apply(state.gen_params, shard(flat(latent)),
                             shard(flat(cond)))
            fake = jax.lax.stop_gradient(fake).reshape(
                n_disc, batch_size, *fake.shape[1:])

        def critic_update(carry, xs):
            critic_params, critic_opt = carry
            fr, cd, fk, ke, k1, k3 = xs
            (_, aux), grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
                critic_params, fr, cd, fk, ke, k1, k3
            )
            updates, critic_opt = tx.update(grads, critic_opt, critic_params)
            critic_params = optax.apply_updates(critic_params, updates)
            aux["d_grad_norm"] = optax.global_norm(grads)
            return (critic_params, critic_opt), aux

        (critic_params, critic_opt), d_aux = jax.lax.scan(
            critic_update, (state.critic_params, state.critic_opt),
            (frac_real, cond, fake, k_eps, k_d1, k_d3), unroll=n_disc,
        )

        if fused_gen_forward:
            fake_g = fake_all[n_disc * batch_size:]
            cond_g_s = cond_all[n_disc * batch_size:]

            def g_head(fk):
                d_fake = critic.apply(critic_params, fk, cond_g_s,
                                      deterministic=False,
                                      rngs={"dropout": k_d_gen})
                return jnp.mean(-d_fake)

            g_loss, cot_g = jax.value_and_grad(g_head)(fake_g)
            cot = jnp.concatenate(
                [jnp.zeros_like(fake_all[: n_disc * batch_size]), cot_g])
            (g_grads,) = gen_vjp(cot)
        else:
            g_loss, g_grads = jax.value_and_grad(gen_loss_fn)(
                state.gen_params, critic_params, ds, key_gen
            )
        g_updates, gen_opt = tx.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        if train_cfg.ema_decay > 0:
            d = train_cfg.ema_decay
            ema_gen_params = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p,
                state.ema_gen_params, gen_params)
        else:
            ema_gen_params = state.ema_gen_params

        metrics = {
            "d_loss": d_aux["d_loss"][-1],
            "d_loss_mean": jnp.mean(d_aux["d_loss"]),
            "gp": d_aux["gp"][-1],
            "w_distance": d_aux["w_distance"][-1],
            "d_grad_norm": d_aux["d_grad_norm"][-1],
            "g_loss": g_loss,
            "g_grad_norm": optax.global_norm(g_grads),
        }
        # NaN-guard flag, jit-compatible analogue of the reference's abort
        # (gan_train_cwgangp_pixelnorm.py:487-488)
        finite = jnp.all(
            jnp.stack([jnp.isfinite(v) for v in metrics.values()])
        )
        metrics["nonfinite"] = ~finite
        metrics["packed"] = jnp.stack(
            [metrics[k] for k in METRIC_KEYS]
            + [metrics["nonfinite"].astype(jnp.float32)]
        )

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            critic_params=critic_params,
            gen_opt=gen_opt,
            critic_opt=critic_opt,
            key=key,
            ema_gen_params=ema_gen_params,
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if steps_per_call <= 1:
        return jax.jit(train_step, donate_argnums=donate_argnums)

    def train_steps(state: GANTrainState, ds: DeviceDataset):
        def body(s, _):
            return train_step(s, ds)

        state, ms = jax.lax.scan(body, state, None, length=steps_per_call)
        metrics = {k: v[-1] for k, v in ms.items()}
        metrics["nonfinite"] = jnp.any(ms["nonfinite"])
        metrics["packed"] = jnp.stack(
            [metrics[k] for k in METRIC_KEYS]
            + [metrics["nonfinite"].astype(jnp.float32)]
        )
        return state, metrics

    return jax.jit(train_steps, donate_argnums=donate_argnums)
