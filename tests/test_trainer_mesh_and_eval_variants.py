"""Trainer over the virtual mesh + Evaluator with conditioning variants."""

import numpy as np

from prdisagg_tpu.api import PretrainedGenerator
from prdisagg_tpu.core.config import (
    Conditioning,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.data.synthetic import make_synthetic_dataset
from prdisagg_tpu.eval import Evaluator
from prdisagg_tpu.train import create_train_state
from prdisagg_tpu.train.loop import Trainer

TINY = ModelConfig(
    ndomain=16, latent_dim=8,
    gen_channels=(8, 8, 8), base_channels=8, critic_channels=(8, 8, 8, 8),
)
TINY_DOY = ModelConfig(
    ndomain=16, latent_dim=8, n_cond_channels=3,
    gen_channels=(8, 8, 8), base_channels=8, critic_channels=(8, 8, 8, 8),
)


def test_trainer_uses_data_mesh(tmp_path):
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32, seed=6)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    exp = ExperimentConfig(
        data=dcfg,
        train=TrainConfig(n_disc=1, schedule=((1, 8),), seed=7,
                          log_every_steps=1),
        name="meshsmoke",
        model_override=TINY,
    )
    tr = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=True,
                 steps_per_epoch=2, plot_every_epochs=0)
    assert tr.mesh is not None and tr.mesh.size == 8
    hist = tr.fit(progress=False)
    assert tr.epoch == 1
    assert np.isfinite(hist["d_loss"]).all()


def test_large_domain_eval_preset(tmp_path):
    """The 64x64 variant evaluates at epoch 8 with 15 fakes/real and the
    magma_r fraction colormap (generate_and_evaluate_largedomain.py:51,205,
    237); artifact names must carry the epoch-8 stamp."""
    import dataclasses
    import glob
    import os

    from prdisagg_tpu.core.config import large_domain_experiment

    exp = large_domain_experiment()
    assert exp.eval.epoch == 8
    assert exp.eval.n_fake_per_real == 15
    assert exp.eval.fraction_cmap == "magma_r"
    assert exp.data.ndomain == 64 and exp.data.n_thresh == 40

    tiny64 = ModelConfig(
        ndomain=64, latent_dim=8,
        gen_channels=(8, 8, 8), base_channels=8, critic_channels=(8, 8, 8, 8),
    )
    exp = dataclasses.replace(exp, model_override=tiny64)
    data, indices, _ = make_synthetic_dataset(
        n_days=3, ny=96, nx=96, seed=11, cfg=exp.data
    )
    ds = DeviceDataset.from_numpy(data, indices, exp.data)
    state, _, _ = create_train_state(tiny64, TrainConfig(seed=12))
    pg = PretrainedGenerator(state.gen_params, tiny64, seed=354)
    ev = Evaluator(exp, ds, pg, workdir=str(tmp_path))
    ev.map_grids(n_conditions=1, n_fake_per_real=2)
    pngs = glob.glob(os.path.join(
        ev.plotdir, "generated_fractions_*_0008_0001_allhours.png"))
    assert len(pngs) == 1
    assert "ndomain64" in os.path.basename(pngs[0])


def test_evaluator_with_doy_conditioning(tmp_path):
    data, indices, _ = make_synthetic_dataset(n_days=4, ny=32, nx=32, seed=8)
    dcfg = DataConfig(conditioning=Conditioning.DOY)
    doy = np.arange(1, 5, dtype=np.float32) * 40
    ds = DeviceDataset.from_numpy(data, indices, dcfg, doy=doy)

    state, _, _ = create_train_state(TINY_DOY, TrainConfig(seed=9))
    pg = PretrainedGenerator(state.gen_params, TINY_DOY, seed=354)
    exp = ExperimentConfig(data=dcfg, name="doyeval", model_override=TINY_DOY)
    ev = Evaluator(exp, ds, pg, workdir=str(tmp_path))
    res = ev.sample_statistics(n_samples=12, chunk=6, make_plots=False)
    assert res["amean_gen"].shape == (12, 24)
    assert np.all(np.isfinite(res["amean_gen"]))
    pvals = ev.conditional_distribution_check(n_pairs=1, n_members=30,
                                              make_plots=False)
    assert pvals[0].shape == (24,)
