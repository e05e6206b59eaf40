"""Variant coverage: doy/lon conditioning and large-domain training steps."""

import jax
import numpy as np

from prdisagg_tpu.core.config import (
    Conditioning,
    DataConfig,
    ModelConfig,
    TrainConfig,
    doy_experiment,
    large_domain_experiment,
    lon_experiment,
)
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.data.synthetic import make_synthetic_dataset
from prdisagg_tpu.train import create_train_state, make_train_step


def _tiny_model(ndomain=16, n_cond_channels=1):
    return ModelConfig(
        ndomain=ndomain, latent_dim=8, n_cond_channels=n_cond_channels,
        gen_channels=(8, 8, 8), base_channels=8, critic_channels=(8, 8, 8, 8),
    )


def test_experiment_factories():
    ld = large_domain_experiment()
    assert ld.data.ndomain == 64 and ld.data.n_thresh == 40
    assert ld.model().latent_grid == (3, 8, 8)
    assert doy_experiment().data.n_cond_channels == 3
    assert lon_experiment().data.n_cond_channels == 2


def test_doy_conditioned_train_step():
    data, indices, _ = make_synthetic_dataset(n_days=4, ny=32, nx=32, seed=5)
    dcfg = DataConfig(conditioning=Conditioning.DOY)
    doy = np.arange(1, 5, dtype=np.float32) * 30
    ds = DeviceDataset.from_numpy(data, indices, dcfg, doy=doy)
    model_cfg = _tiny_model(n_cond_channels=3)
    train_cfg = TrainConfig(n_disc=1, seed=6)
    state, gen, critic = create_train_state(model_cfg, train_cfg)
    step = make_train_step(gen, critic, model_cfg, train_cfg, batch_size=4,
                           donate=False)
    new_state, metrics = step(state, ds)
    assert not bool(metrics["nonfinite"])
    assert np.isfinite(float(metrics["d_loss"]))


def test_lon_conditioned_train_step():
    data, indices, _ = make_synthetic_dataset(n_days=4, ny=32, nx=32, seed=7)
    dcfg = DataConfig(conditioning=Conditioning.LON)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    model_cfg = _tiny_model(n_cond_channels=2)
    train_cfg = TrainConfig(n_disc=1, seed=8)
    state, gen, critic = create_train_state(model_cfg, train_cfg)
    step = make_train_step(gen, critic, model_cfg, train_cfg, batch_size=4,
                           donate=False)
    _, metrics = step(state, ds)
    assert not bool(metrics["nonfinite"])


def test_large_domain_train_step():
    # 64x64 domain variant (n_thresh=40) on a tiny model
    data, indices, _ = make_synthetic_dataset(
        n_days=2, ny=80, nx=80, seed=9, cfg=DataConfig(ndomain=64, n_thresh=40)
    )
    dcfg = DataConfig(ndomain=64, n_thresh=40)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    model_cfg = _tiny_model(ndomain=64)
    train_cfg = TrainConfig(n_disc=1, seed=10)
    state, gen, critic = create_train_state(model_cfg, train_cfg)
    step = make_train_step(gen, critic, model_cfg, train_cfg, batch_size=2,
                           donate=False)
    _, metrics = step(state, ds)
    assert not bool(metrics["nonfinite"])
