"""Architecture-level step-rate experiment: fused generator forward.

The last unmeasured step-rate lever (docs/PERF.md; every kernel-level lever
has a recorded negative): restructure the fused step so the generator
update's batch joins the hoisted critic-side batch in ONE (n_disc+1)*B
forward under vjp, with the generator gradient replayed after the critic
scan (`make_train_step(..., fused_gen_forward=True)` — semantics identical,
equivalence-tested on CPU).  Trades a bigger generator backward for fewer,
larger kernels; only wins if the step is layout/latency-bound.

Timing protocol: steps_per_call=10 (one dispatch per 10 fused steps, the
bench.py protocol) — per-dispatch tunnel overhead ~10 ms must not be
attributed to either variant.

Usage: python scripts/exp_arch_restructure.py
Appends results to artifacts/exp_arch_restructure.txt.
"""

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

REPO = os.path.join(os.path.dirname(__file__), "..")


def run(fused, ds, batch_size, lines, k=10, n_calls=10):
    model_cfg = ModelConfig()  # bf16 default protocol
    train_cfg = TrainConfig(seed=0)
    state, gen, critic = create_train_state(model_cfg, train_cfg)
    step = make_train_step(gen, critic, model_cfg, train_cfg, batch_size,
                           steps_per_call=k, fused_gen_forward=fused)
    state, m = step(state, ds)  # compile + warmup
    assert not bool(m["nonfinite"])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, m = step(state, ds)
    float(m["d_loss"])  # host fetch = sync
    sps = n_calls * k / (time.perf_counter() - t0)
    line = (f"b{batch_size} fused_gen_forward={int(fused)}: "
            f"{sps:6.1f} steps/s (bf16)")
    print(line, flush=True)
    lines.append(line)


def main():
    data, indices, dcfg = make_synthetic_dataset(n_days=8, ny=64, nx=64,
                                                 seed=0)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    lines = []
    for bs in (32, 128):
        for fused in (False, True):
            run(fused, ds, bs, lines)
    with open(os.path.join(REPO, "artifacts", "exp_arch_restructure.txt"),
              "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
