import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prdisagg_tpu.api import PretrainedGenerator
from prdisagg_tpu.core.config import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.eval import Evaluator
from prdisagg_tpu.eval.crps import analyze, crps_random_baseline, run_crps_evaluation
from prdisagg_tpu.eval.lsd import run_lsd_evaluation, spectra_of_fields
from prdisagg_tpu.train import create_train_state

SMALL_MODEL = ModelConfig(
    ndomain=16, latent_dim=8,
    gen_channels=(8, 8, 8), base_channels=8, critic_channels=(8, 8, 8, 8),
)


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory, synthetic_dataset):
    data, indices, dcfg = synthetic_dataset
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    state, _, _ = create_train_state(SMALL_MODEL, TrainConfig(seed=5))
    pg = PretrainedGenerator(state.gen_params, SMALL_MODEL, seed=354)
    exp = ExperimentConfig(
        data=dcfg, eval=EvalConfig(), name="test", model_override=SMALL_MODEL
    )
    workdir = str(tmp_path_factory.mktemp("eval"))
    return Evaluator(exp, ds, pg, workdir=workdir), workdir, pg, ds


@pytest.mark.quick
def test_map_grids_artifacts(eval_setup):
    ev, workdir, _, _ = eval_setup
    ev.map_grids(n_conditions=2, n_fake_per_real=2)
    pngs = glob.glob(os.path.join(ev.plotdir, "generated_fractions_*_allhours.png"))
    assert len(pngs) == 2
    pngs = glob.glob(os.path.join(ev.plotdir, "generated_precip_*.png"))
    assert len(pngs) == 4  # allhours + every-3rd per condition
    assert glob.glob(os.path.join(ev.datadir, "real_precip_for_mapplots_*.npy"))


@pytest.mark.quick
def test_sample_statistics(eval_setup):
    ev, workdir, _, _ = eval_setup
    res = ev.sample_statistics(n_samples=24, chunk=10)
    assert res["amean_gen"].shape == (24, 24)
    assert res["generated_samples"].shape == (24, 24, 16, 16)
    assert np.all(np.isfinite(res["amean_gen"]))
    assert os.path.exists(os.path.join(ev.datadir, "generated_samples.npy"))
    assert os.path.exists(os.path.join(ev.datadir, "real_samples.npy"))
    # fraction area means of generated fields must average 1/24 per hour
    np.testing.assert_allclose(
        res["amean_fraction_gen"].sum(axis=1), 1.0, rtol=1e-3
    )


def test_conditional_distribution_check(eval_setup):
    ev, workdir, _, _ = eval_setup
    pvals = ev.conditional_distribution_check(n_pairs=2, n_members=50,
                                              make_plots=False)
    assert len(pvals) == 2
    for p in pvals:
        assert p.shape == (24,)
        assert np.all((p >= 0) & (p <= 1))
    txts = glob.glob(os.path.join(ev.plotdir, "check_conditional_dist_*.txt"))
    assert len(txts) == 2
    # identical conditions + identical latents => identical distributions
    # (sanity of the KS harness itself)
    import scipy.stats

    x = np.random.RandomState(0).rand(100)
    assert scipy.stats.ks_2samp(x, x).pvalue == 1.0


def test_noise_line_plots(eval_setup):
    ev, workdir, _, _ = eval_setup
    ev.noise_line_plots(n_conditions=1, n_free=5, n_shared=2)
    svgs = glob.glob(os.path.join(ev.plotdir, "distribution_lineplot_*.svg"))
    assert len(svgs) == 1


def test_crps_evaluation_pipeline(eval_setup, tmp_path):
    ev, workdir, pg, ds = eval_setup
    reals = np.asarray(ds.sample_patches_raw(jax.random.PRNGKey(9), 4))
    baseline = np.asarray(ds.sample_patches_raw(jax.random.PRNGKey(10), 16))
    res = run_crps_evaluation(pg, reals, baseline, n_members=16,
                              outdir=str(tmp_path))
    assert res["gan"].shape == (4, 24)
    assert res["random"].shape == (4, 24)
    assert np.all(np.isfinite(res["gan"]))
    with open(tmp_path / "crps_results.json") as f:
        js = json.load(f)
    assert "gan" in js and "ttest_p_gan_vs_random" in js
    assert (tmp_path / "crps_results_n_sample4.pkl").exists()


def test_crps_gan_chunked_matches_per_sample(eval_setup):
    """The round-2 on-device sample scan must be bit-compatible with the
    round-1 per-sample host loop (same key-split chain => same latents =>
    same ensembles), including the padded ragged tail, and invariant to
    sample_chunk."""
    from prdisagg_tpu.eval.crps import crps_gan
    from prdisagg_tpu.ops.stats import crps_ensemble

    ev, workdir, pg, ds = eval_setup
    reals = np.asarray(ds.sample_patches_raw(jax.random.PRNGKey(11), 5))

    out_a = crps_gan(pg, reals, n_members=8, member_batch=4,
                     sample_chunk=2, seed=7)   # 5 = 2 + 2 + padded tail
    out_b = crps_gan(pg, reals, n_members=8, member_batch=4,
                     sample_chunk=5, seed=7)
    np.testing.assert_allclose(out_a, out_b, rtol=1e-5, atol=1e-7)

    # round-1 semantics replayed by hand (host-side key chain)
    latent_dim = pg.cfg.latent_dim
    key = jax.random.PRNGKey(7)
    manual = []
    for i in range(len(reals)):
        key, sub = jax.random.split(key)
        latents = jax.random.normal(sub, (8, latent_dim))
        dsum = reals[i].sum(axis=0)
        cond = jnp.asarray(dsum / 127.4)[None, ..., None]
        cond_b = jnp.broadcast_to(cond, (8, *cond.shape[1:]))
        frac = pg._gen.apply(pg.params, latents, cond_b)[..., 0]
        ens = np.asarray(frac) * dsum[None, None]
        crps = crps_ensemble(jnp.asarray(reals[i]), jnp.asarray(ens))
        manual.append(np.asarray(jnp.mean(crps, axis=(1, 2))))
    np.testing.assert_allclose(out_a, np.stack(manual), rtol=1e-4, atol=1e-6)


def test_crps_gan_dp_matches_single_device(eval_setup):
    """crps_gan under a data-parallel mesh must equal the single-device
    result EXACTLY: the key-split chain is precomputed (sample i gets split
    i+1 either way) and the per-sample math is untouched — shard_map only
    changes which device scores which sample.  Covers a ragged tail and a
    sample_chunk that is not a mesh multiple (rounded up, pads after every
    real sample)."""
    from prdisagg_tpu.eval.crps import crps_gan
    from prdisagg_tpu.parallel import make_mesh

    ev, workdir, pg, ds = eval_setup
    reals = np.asarray(ds.sample_patches_raw(jax.random.PRNGKey(13), 11))

    single = crps_gan(pg, reals, n_members=8, member_batch=4,
                      sample_chunk=6, seed=7)
    pg_dp = PretrainedGenerator(pg.params, pg.cfg, seed=354,
                                mesh=make_mesh(8))
    dp = crps_gan(pg_dp, reals, n_members=8, member_batch=4,
                  sample_chunk=6, seed=7)  # chunk 6 -> rounded to 8
    assert dp.shape == single.shape == (11, 24)
    np.testing.assert_array_equal(dp, single)


def test_crps_random_baseline_identity():
    # ensemble == every member equals obs -> crps == 0
    obs = np.ones((2, 24, 4, 4), dtype=np.float32)
    ens = np.ones((8, 24, 4, 4), dtype=np.float32)
    out = crps_random_baseline(obs, ens)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_lsd_evaluation(eval_setup, tmp_path):
    ev, workdir, pg, ds = eval_setup
    real = np.asarray(ds.sample_patches_raw(jax.random.PRNGKey(11), 4))
    gen = np.asarray(ds.sample_patches_raw(jax.random.PRNGKey(12), 4))
    rf = np.asarray(ds.sample_patches_raw(jax.random.PRNGKey(13), 4))
    dists = run_lsd_evaluation(real, gen, rf, n_samples=4,
                               outdir=str(tmp_path), plotdir=str(tmp_path),
                               make_plot=True)
    n = 4 * 24
    assert dists["real"].shape == (n * n - n,)
    assert "gen_rainfarm" in dists and "between_gen_rainfarm_real" in dists
    assert (tmp_path / "log_spectral_distances_real_n4.npy").exists()
    assert (tmp_path / "log_spectral_distances_n4.svg").exists()
    sp = spectra_of_fields(real)
    assert sp.shape[0] == n

    # device reduction: same medians (exact order statistics on device),
    # subsample + summary artifacts instead of the full populations
    dev_dir = tmp_path / "device"
    dev = run_lsd_evaluation(real, gen, rf, n_samples=4,
                             outdir=str(dev_dir), plotdir=str(dev_dir),
                             make_plot=True, reduction="device")
    for k, v in dists.medians.items():
        np.testing.assert_allclose(dev.medians[k], v, rtol=2e-5)
    assert (dev_dir / "log_spectral_distances_real_n4_subsample.npy").exists()
    assert (dev_dir / "log_spectral_distances_summary_n4.json").exists()
    assert (dev_dir / "log_spectral_distances_n4.svg").exists()
    assert not (dev_dir / "log_spectral_distances_real_n4.npy").exists()


def test_analyze_bootstrap():
    rng = np.random.RandomState(0)
    gan = rng.rand(50, 24) * 0.5
    rnd = rng.rand(50, 24) * 0.5 + 0.3  # gan clearly better
    res = analyze(gan, rnd, outdir="/tmp/prdisagg_test_analyze", n_bootstrap=200)
    assert res["gan"] < res["random"]
    assert res["ttest_p_gan_vs_random"] < 0.01
    assert res["bootstrap_diff"]["lower"] < res["bootstrap_diff"]["mean"] \
        < res["bootstrap_diff"]["upper"]
