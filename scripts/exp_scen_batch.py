"""Inference serving throughput vs batch size (round 3).

generate_scenarios-style batched generator forwards at the default bf16
precision, one jit per batch size.  Measures scenarios/s on the real chip;
the reference's inference path predicts in batches of at most 1000
(generate_and_evaluate.py:210,551 and raindisagg_gan_pretrained.py:60).

Usage: python scripts/exp_scen_batch.py [batches...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/prdisagg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from prdisagg_tpu.core.config import ModelConfig, TrainConfig
    from prdisagg_tpu.train import create_train_state

    batches = [int(b) for b in sys.argv[1:]] or [1000, 2000, 4000, 8000]
    cfg = ModelConfig()
    state, gen, _ = create_train_state(cfg, TrainConfig(seed=0))
    fwd = jax.jit(lambda p, l, c: gen.apply(p, l, c))
    for b in batches:
        latent = jax.random.normal(jax.random.PRNGKey(0), (b, cfg.latent_dim))
        cond = jnp.ones((b, 16, 16, 1)) * (10.0 / 127.4)
        float(fwd(state.gen_params, latent, cond).sum())  # compile+sync
        reps = max(2, 8000 // b)
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            out = fwd(state.gen_params, latent, cond)
            acc = out if acc is None else acc + out
        float(acc.sum())  # dependent host fetch = hard sync
        rate = reps * b / (time.perf_counter() - t0)
        print(f"batch {b:5d}: {rate:,.0f} scenarios/s", flush=True)


if __name__ == "__main__":
    main()
