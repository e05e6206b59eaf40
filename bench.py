"""Headline benchmark: fused cWGAN-GP train steps/sec at ndomain=16, batch 32.

One fused step = 5 critic updates (with second-order gradient penalty) + 1
generator update, i.e. exactly the work the reference does with 6 separate
`train_on_batch` host round-trips per step
(reference: gan_train_cwgangp_pixelnorm.py:463-482).

vs_baseline compares against an estimated 2.5 fused-steps/sec for the
reference TF2.1 run on a V100 (6 graph launches with feed-dict-style host
transfers each step; the reference publishes no numbers — BASELINE.md
`published: {}`).  The BASELINE north star is >=10x, i.e. vs_baseline >= 10.

Prints ONE JSON line.
"""

import json
import time

import numpy as np

REFERENCE_STEPS_PER_SEC_ESTIMATE = 2.5  # V100, see module docstring


def main():
    import jax

    from prdisagg_tpu.core.config import ModelConfig, TrainConfig
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset
    from prdisagg_tpu.train import create_train_state, make_train_step

    model_cfg = ModelConfig()          # full flagship architecture
    train_cfg = TrainConfig(seed=0)    # n_disc=5, Adam(1e-4, 0, 0.9)
    batch_size = 32

    data, indices, dcfg = make_synthetic_dataset(n_days=8, ny=64, nx=64, seed=0)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    state, gen, critic = create_train_state(model_cfg, train_cfg)

    step = make_train_step(gen, critic, model_cfg, train_cfg, batch_size)

    # warmup / compile
    state, metrics = step(state, ds)
    jax.block_until_ready(state)
    assert not bool(metrics["nonfinite"])

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, ds)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    steps_per_sec = n_steps / dt

    # secondary: inference scenarios/sec (generate_scenarios-style batch)
    n_scen = 1000
    latent = jax.random.normal(jax.random.PRNGKey(0), (n_scen, model_cfg.latent_dim))
    cond = jax.numpy.ones((n_scen, 16, 16, 1)) * (10.0 / 127.4)
    fwd = jax.jit(lambda p, l, c: gen.apply(p, l, c))
    fwd(state.gen_params, latent, cond).block_until_ready()
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = fwd(state.gen_params, latent, cond)
    out.block_until_ready()
    scen_per_sec = reps * n_scen / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "fused_wgangp_train_steps_per_sec_ndomain16_batch32",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC_ESTIMATE, 2),
        "extras": {
            "scenarios_per_sec_batch1000": round(scen_per_sec, 1),
            "device": str(jax.devices()[0]),
            "samples_per_sec": round(steps_per_sec * batch_size * 6, 1),
        },
    }))


if __name__ == "__main__":
    main()
