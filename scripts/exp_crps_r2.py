"""Round-2 CRPS protocol measurement (VERDICT item 5).

Times the on-device sample-scan crps_gan at reference ensemble scale
(1000 members) and spot-checks values against a host-side replay of the
round-1 per-sample semantics (same key chain -> must match ~1e-5).

Usage: python scripts/exp_crps_r2.py [n_samples] [sample_chunk]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/prdisagg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from prdisagg_tpu.api.pretrained import PretrainedGenerator
from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.eval.crps import crps_gan
from prdisagg_tpu.ops.stats import crps_ensemble
from prdisagg_tpu.train import create_train_state


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    cfg = ModelConfig()
    state, _, _ = create_train_state(cfg, TrainConfig(seed=0))
    pg = PretrainedGenerator(state.gen_params, cfg)

    rng = np.random.RandomState(0)
    reals = rng.gamma(2.0, 1.0, size=(n, 24, 16, 16)).astype(np.float32)

    # warm (compile) on a chunk-sized prefix
    _ = crps_gan(pg, reals[:chunk], n_members=1000, seed=354,
                 sample_chunk=chunk)

    t0 = time.perf_counter()
    out = crps_gan(pg, reals, n_members=1000, seed=354, sample_chunk=chunk)
    dt = time.perf_counter() - t0
    rate = n / dt

    # spot-check 3 samples against a replay of round-1 per-sample semantics
    latent_dim = cfg.latent_dim
    key = jax.random.PRNGKey(354)
    errs = []
    for i in range(3):
        key, sub = jax.random.split(key)
        latents = jax.random.normal(sub, (1000, latent_dim))
        dsum = reals[i].sum(axis=0)
        cond = jnp.asarray(dsum / 127.4)[None, ..., None]

        def chunk_fwd(lat):
            cond_b = jnp.broadcast_to(cond, (500, *cond.shape[1:]))
            return pg._gen.apply(state.gen_params, lat, cond_b)[..., 0]

        ens = jax.lax.map(chunk_fwd, latents.reshape(2, 500, latent_dim))
        ens = ens.reshape(1000, 24, 16, 16) * jnp.asarray(dsum)[None, None]
        row = jnp.mean(crps_ensemble(jnp.asarray(reals[i]), ens), axis=(1, 2))
        errs.append(float(jnp.max(jnp.abs(row - out[i]))))

    print(json.dumps({
        "metric": "gan_crps_protocol_samples_per_sec_1000members",
        "value": round(rate, 2),
        "unit": "samples/s",
        "n_samples": n,
        "sample_chunk": chunk,
        "projected_10k_minutes": round(10000 / rate / 60, 1),
        "round1_rate": 6.1,
        "speedup_vs_round1": round(rate / 6.1, 2),
        "max_abs_diff_vs_round1_semantics": max(errs),
    }))


if __name__ == "__main__":
    main()
