"""Time the PRODUCTION make_train_step under model-config variations.

Usage: python scripts/exp_prod_step.py [dtype] [folded01] [pnf32_01]
  e.g. python scripts/exp_prod_step.py bfloat16 1 0
With no args, runs a default sweep in one process.
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

from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.data.synthetic import make_synthetic_dataset
from prdisagg_tpu.train import create_train_state, make_train_step


def run(dtype, folded, pnf32, data, indices, dcfg, batch_size=32):
    model_cfg = ModelConfig(compute_dtype=dtype, fused_upsample=folded,
                            pixelnorm_f32=pnf32)
    train_cfg = TrainConfig(seed=0)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    state, gen, critic = create_train_state(model_cfg, train_cfg)
    step = make_train_step(gen, critic, model_cfg, train_cfg, batch_size)
    state, m = step(state, ds)
    assert not bool(m["nonfinite"])
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, ds)
    float(m["d_loss"])
    sps = n / (time.perf_counter() - t0)
    print(f"dtype={dtype} folded={int(folded)} pnf32={int(pnf32)} "
          f"{sps:7.1f} fused steps/s", flush=True)


def main():
    data, indices, dcfg = make_synthetic_dataset(n_days=8, ny=64, nx=64,
                                                 seed=0)
    if len(sys.argv) > 1:
        dtype = sys.argv[1]
        folded = bool(int(sys.argv[2]))
        pnf32 = bool(int(sys.argv[3]))
        run(dtype, folded, pnf32, data, indices, dcfg)
        return
    for dtype, folded, pnf32 in (
        ("float32", True, True),
        ("bfloat16", True, True),
        ("bfloat16", True, False),
        ("bfloat16", False, False),
        ("float32", False, True),
    ):
        run(dtype, folded, pnf32, data, indices, dcfg)


if __name__ == "__main__":
    main()
