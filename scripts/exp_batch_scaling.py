"""Batch-scaling measurement for the hoisted bf16 step (docs/PERF.md round 2)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/prdisagg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.data.synthetic import make_synthetic_dataset
from prdisagg_tpu.train import create_train_state, make_train_step

data, indices, dcfg = make_synthetic_dataset(n_days=8, ny=64, nx=64, seed=0)
for b in (64, 128, 256):
    model_cfg = ModelConfig(compute_dtype="bfloat16")
    tc = TrainConfig(seed=0)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    state, gen, critic = create_train_state(model_cfg, tc)
    step = make_train_step(gen, critic, model_cfg, tc, b)
    state, m = step(state, ds); assert not bool(m["nonfinite"])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, ds)
    float(m["d_loss"])
    sps = n/(time.perf_counter()-t0)
    print(f"bf16 b{b}: {sps:.1f} steps/s = {sps*b*6:.0f} sample-updates/s", flush=True)
