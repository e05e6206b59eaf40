"""Raw generator-forward throughput: where do the step's FLOPs actually go?

Measures gen.apply at the batches the fused step uses (32 for the gen update,
160 for the hoisted 5B critic-side forward), folded vs unfolded upsample-conv,
f32 vs bf16, reporting effective TFLOP/s against the analytic MAC count.

Usage: python scripts/exp_gen.py
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

from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.train import create_train_state


def gen_fwd_gflops(cfg: ModelConfig, folded: bool) -> float:
    """Analytic forward MACs*2 per sample in GFLOP."""
    gd, gh, gw = cfg.latent_grid
    total = 2 * (cfg.latent_dim + cfg.ndomain ** 2 * cfg.n_cond_channels) \
        * cfg.base_channels * gd * gh * gw
    cin = cfg.base_channels
    d, h, w = gd, gh, gw
    factor = (1 / 3.375) if folded else 1.0
    for ch in cfg.gen_channels:
        d, h, w = 2 * d, 2 * h, 2 * w
        total += 2 * d * h * w * 27 * cin * ch * factor
        cin = ch
    total += 2 * d * h * w * 27 * cin * 1  # head (always unfolded SAME conv)
    return total / 1e9


def main():
    for dtype in ("float32", "bfloat16"):
        for folded in (True, False):
            cfg = ModelConfig(compute_dtype=dtype, fused_upsample=folded)
            state, gen, _ = create_train_state(cfg, TrainConfig(seed=0))
            gf = gen_fwd_gflops(cfg, folded)
            for b in (32, 160, 500):
                fwd = jax.jit(lambda p, l, c: gen.apply(p, l, c))
                lat = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.latent_dim))
                cond = jnp.ones((b, cfg.ndomain, cfg.ndomain, 1)) * 0.1
                out = fwd(state.gen_params, lat, cond)
                float(out.sum())  # compile+sync
                reps = 30
                t0 = time.perf_counter()
                acc = None
                for _ in range(reps):
                    out = fwd(state.gen_params, lat, cond)
                    acc = out if acc is None else acc + out
                float(acc.sum())
                dt = time.perf_counter() - t0
                per = dt / reps
                print(f"folded={int(folded)} {dtype:9s} B={b:4d} "
                      f"{per * 1e3:7.2f} ms  {gf * b / per / 1e3:6.1f} TF/s "
                      f"({gf:.2f} GF/sample)", flush=True)


if __name__ == "__main__":
    main()
