"""Daily-cycle quality check of the sustained run's epoch-30 .h5 weights."""
import os, sys, glob
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/prdisagg_jax_cache"))
import numpy as np
import jax.numpy as jnp
from prdisagg_tpu.core.config import ModelConfig
from prdisagg_tpu.models.io import load_keras_generator_h5
from prdisagg_tpu.api.pretrained import PretrainedGenerator
from prdisagg_tpu.data.synthetic import make_synthetic_dataset
from prdisagg_tpu.data.sampler import DeviceDataset, sample_real_jit

h5 = sorted(glob.glob("/root/repo/artifacts/sustained_r2/trained_models/sustained_r2/gen_*_0030.h5"))[0]
cfg = ModelConfig()
params = load_keras_generator_h5(h5, cfg)
pg = PretrainedGenerator(params, cfg, seed=354)

data, indices, dcfg = make_synthetic_dataset(n_days=64, ny=128, nx=128, seed=0)
ds = DeviceDataset.from_numpy(data, indices, dcfg)
frac_r, cond = sample_real_jit(ds, jax.random.PRNGKey(42), 512)
lat = jax.random.normal(jax.random.PRNGKey(7), (512, cfg.latent_dim))
gen_frac = pg.predict_fractions(jnp.asarray(lat), cond)
g = np.asarray(gen_frac)[..., 0].mean(axis=(0, 2, 3))
r = np.asarray(frac_r)[..., 0].mean(axis=(0, 2, 3))
corr = np.corrcoef(g, r)[0, 1]
print("gen cycle :", np.round(g, 4).tolist())
print("real cycle:", np.round(r, 4).tolist())
print(f"daily-cycle corr epoch30 (hoisted step training): {corr:.4f} (round-1 anchor: 0.991)")
