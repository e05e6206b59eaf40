import os

import h5py
import jax
import numpy as np
import pytest

from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.api import PretrainedGenerator
from prdisagg_tpu.models.io import (
    load_keras_critic_h5,
    load_keras_generator_h5,
    load_params_npz,
    save_keras_critic_h5,
    save_keras_generator_h5,
    save_params_npz,
)
from prdisagg_tpu.train import create_train_state

TINY = ModelConfig(
    ndomain=16, latent_dim=8,
    gen_channels=(8, 8, 8), base_channels=8, critic_channels=(8, 8, 8, 8),
)


@pytest.mark.quick
def test_npz_roundtrip(tmp_path):
    state, gen, _ = create_train_state(TINY, TrainConfig())
    p = str(tmp_path / "gen.npz")
    save_params_npz(p, state.gen_params)
    loaded = load_params_npz(p)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.gen_params),
        jax.tree_util.tree_leaves(loaded),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _write_fake_keras_h5(path, layer_weights):
    """Emulate the Keras .h5 weight layout: nested groups with kernel:0/bias:0
    datasets under layer-name groups inside model_weights/sequential."""
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights").create_group("sequential")
        for name, (k, b) in layer_weights.items():
            lg = g.create_group(name).create_group(name)
            lg.create_dataset("kernel:0", data=k)
            lg.create_dataset("bias:0", data=b)


def test_keras_h5_generator_import(tmp_path):
    cfg = ModelConfig()  # full reference architecture
    rng = np.random.RandomState(0)
    gd, gh, gw = cfg.latent_grid
    n_in = cfg.latent_dim + 16 * 16
    n_out = 256 * gd * gh * gw
    layers = {
        "dense": (rng.randn(n_in, n_out).astype("f4"), rng.randn(n_out).astype("f4")),
        "conv3d": (rng.randn(3, 3, 3, 256, 256).astype("f4"), rng.randn(256).astype("f4")),
        "conv3d_1": (rng.randn(3, 3, 3, 256, 128).astype("f4"), rng.randn(128).astype("f4")),
        "conv3d_2": (rng.randn(3, 3, 3, 128, 64).astype("f4"), rng.randn(64).astype("f4")),
        "conv3d_3": (rng.randn(3, 3, 3, 64, 1).astype("f4"), rng.randn(1).astype("f4")),
    }
    p = str(tmp_path / "gen.h5")
    _write_fake_keras_h5(p, layers)

    params = load_keras_generator_h5(p, cfg)["params"]
    np.testing.assert_array_equal(
        np.asarray(params["latent_proj"]["kernel"]), layers["dense"][0]
    )
    np.testing.assert_array_equal(
        np.asarray(params["conv1"]["kernel"]), layers["conv3d_1"][0]
    )
    np.testing.assert_array_equal(
        np.asarray(params["head"]["bias"]), layers["conv3d_3"][1]
    )

    # imported params must drive the Flax generator
    pg = PretrainedGenerator({"params": params}, cfg)
    out = pg.generate_scenarios(10 * np.ones((16, 16, 1)), 2)
    assert out.shape == (2, 24, 16, 16)


def test_keras_h5_critic_import(tmp_path):
    cfg = ModelConfig()
    rng = np.random.RandomState(1)
    layers = {
        "conv3d": (rng.randn(3, 3, 3, 2, 64).astype("f4"), rng.randn(64).astype("f4")),
        "conv3d_1": (rng.randn(3, 3, 3, 64, 128).astype("f4"), rng.randn(128).astype("f4")),
        "conv3d_2": (rng.randn(3, 3, 3, 128, 256).astype("f4"), rng.randn(256).astype("f4")),
        "conv3d_3": (rng.randn(3, 3, 3, 256, 256).astype("f4"), rng.randn(256).astype("f4")),
        "dense": (rng.randn(2 * 1 * 1 * 256, 1).astype("f4"), rng.randn(1).astype("f4")),
    }
    p = str(tmp_path / "disc.h5")
    _write_fake_keras_h5(p, layers)
    params = load_keras_critic_h5(p, cfg)["params"]
    assert np.asarray(params["conv3"]["kernel"]).shape == (3, 3, 3, 256, 256)
    assert np.asarray(params["score"]["kernel"]).shape == (512, 1)


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_keras_h5_generator_export_roundtrip(tmp_path):
    """save_keras_generator_h5 -> load_keras_generator_h5 is the identity
    (VERDICT round-2 item 7; reference contract
    gan_train_cwgangp_pixelnorm.py:520-521)."""
    state, _, _ = create_train_state(TINY, TrainConfig())
    p = str(tmp_path / "gen.h5")
    save_keras_generator_h5(p, state.gen_params, TINY)
    loaded = load_keras_generator_h5(p, TINY)
    _assert_trees_equal(state.gen_params, loaded)


def test_keras_h5_critic_export_roundtrip(tmp_path):
    state, _, _ = create_train_state(TINY, TrainConfig())
    p = str(tmp_path / "disc.h5")
    save_keras_critic_h5(p, state.critic_params, TINY)
    loaded = load_keras_critic_h5(p, TINY)
    _assert_trees_equal(state.critic_params, loaded)


def test_weight_exports_are_atomic(tmp_path):
    """A failed (or SIGKILLed) export must never corrupt an existing
    weights file: the supervisor kills process groups mid-export, and a
    truncated gen_*.h5 crashed protocol epoch-curve scoring on every
    relaunch (round-4 review).  Writers go through tmp+os.replace, and
    leftover tmp names do not match the `gen_*.h5` export glob."""
    from unittest import mock

    state, _, _ = create_train_state(TINY, TrainConfig())
    p = str(tmp_path / "gen_0001.h5")
    save_keras_generator_h5(p, state.gen_params, TINY)
    good = open(p, "rb").read()

    with mock.patch("h5py.File", side_effect=OSError("disk full")):
        with pytest.raises(OSError):
            save_keras_generator_h5(p, state.gen_params, TINY)
    assert open(p, "rb").read() == good  # untouched by the failed write

    pnpz = str(tmp_path / "gen_0001.npz")
    save_params_npz(pnpz, state.gen_params)
    goodz = open(pnpz, "rb").read()
    with mock.patch("numpy.savez", side_effect=OSError("disk full")):
        with pytest.raises(OSError):
            save_params_npz(pnpz, state.gen_params)
    assert open(pnpz, "rb").read() == goodz

    # a crash BETWEEN tmp-write and rename leaves only *.tmp-<pid> files,
    # which the protocol's export glob (gen_*.h5) must not match
    import fnmatch

    stray = [f for f in os.listdir(tmp_path)
             if fnmatch.fnmatch(f, "gen_*.h5") and ".tmp-" in f]
    assert stray == []


def test_keras_h5_export_group_structure(tmp_path):
    """The exported file must emulate TF-2.1 Keras `model.save` nesting:
    model_weights/<layer>/... groups, layer_names / weight_names attrs
    (the reference nets nest all weighted layers in a Sequential,
    gan_train_cwgangp_pixelnorm.py:284-305,325-352)."""
    state, _, _ = create_train_state(TINY, TrainConfig())
    p = str(tmp_path / "gen.h5")
    save_keras_generator_h5(p, state.gen_params, TINY)
    with h5py.File(p, "r") as f:
        backend = f.attrs["backend"]
        if isinstance(backend, bytes):
            backend = backend.decode()
        assert backend == "tensorflow"
        assert "keras_version" in f.attrs
        mw = f["model_weights"]
        layer_names = list(mw.attrs["layer_names"])
        assert b"sequential" in layer_names
        # every listed layer has a group
        for name in layer_names:
            assert name.decode() in mw
        seq = mw["sequential"]
        wn = [n.decode() for n in seq.attrs["weight_names"]]
        # Keras creation order: dense first, then conv3d .. conv3d_3,
        # kernel before bias; nested-model paths repeat the inner model name
        # (model_weights/sequential/sequential/<layer>/<w>:0) like TF's writer
        assert wn[0] == "sequential/dense/kernel:0"
        assert wn[1] == "sequential/dense/bias:0"
        assert wn[2] == "sequential/conv3d/kernel:0"
        assert wn[-2] == "sequential/conv3d_3/kernel:0"
        assert wn[-1] == "sequential/conv3d_3/bias:0"
        for name in wn:
            assert name in seq, name
            assert seq[name].dtype == np.float32
        # a loadable TF-2.1-style model_config rides along (ADVICE round-2;
        # real-TF validation in tests/test_keras_load_model.py)
        import json

        cfg_json = json.loads(f.attrs["model_config"])
        assert cfg_json["class_name"] == "Model"
        names = [l["name"] for l in cfg_json["config"]["layers"]]
        assert names == ["input_1", "input_2", "flatten", "concatenate",
                         "sequential"]


@pytest.mark.quick
def test_generate_scenarios_semantics():
    state, gen, _ = create_train_state(TINY, TrainConfig())
    pg = PretrainedGenerator(state.gen_params, TINY)

    cond = 10.0 * np.ones((16, 16, 1), dtype=np.float32)
    scen = pg.generate_scenarios(cond, 5)
    assert scen.shape == (5, 24, 16, 16)
    assert not np.any(np.isnan(scen))
    assert scen.min() >= 0
    # conservation: hourly sums reproduce the daily condition exactly
    np.testing.assert_allclose(scen.sum(axis=1), 10.0, rtol=1e-4)

    # 2-D cond (no channel dim) also accepted
    scen2 = pg.generate_scenarios(cond[..., 0], 3)
    assert scen2.shape == (3, 24, 16, 16)

    # different calls use different latents
    assert not np.allclose(scen[0], scen[1])


def test_normalize_cond_rejects_wrong_spatial_dims():
    """A (nd, nd, 3) array fed to a 1-channel generator must fail loudly
    at normalization, not as a shape error deep inside the forward (the
    channel-add heuristic would otherwise turn it into a nonsense
    (nd, nd, 3, 1) 'stack')."""
    import pytest

    state, gen, _ = create_train_state(TINY, TrainConfig())
    pg = PretrainedGenerator(state.gen_params, TINY)

    with pytest.raises(ValueError, match="does not end in"):
        pg.generate_scenarios(np.ones((16, 16, 3), np.float32), 2)
    with pytest.raises(ValueError, match="does not end in"):
        pg.generate_scenarios_batch(np.ones((4, 16, 12, 1), np.float32), 2)
    # legit shapes still pass through
    assert pg.generate_scenarios_batch(
        np.ones((2, 16, 16), np.float32) * 5.0, 2).shape == (2, 2, 24, 16, 16)


def test_warm_compiles_without_consuming_the_key_chain():
    """warm() pre-compiles request shapes ('max' = the max_batch chunk
    shape, ints at their rounded device shape) on throwaway inputs: a
    warmed generator replays the exact same scenarios as an unwarmed one
    with the same seed (the key chain is untouched)."""
    state, _, _ = create_train_state(TINY, TrainConfig(seed=9))
    warmed = PretrainedGenerator(state.gen_params, TINY, seed=13,
                                 max_batch=8)
    secs = warmed.warm(("max", 3))
    assert secs >= 0.0
    plain = PretrainedGenerator(state.gen_params, TINY, seed=13, max_batch=8)
    cond = 10.0 * np.ones((16, 16, 1), dtype=np.float32)
    np.testing.assert_array_equal(
        warmed.generate_scenarios(cond, 3), plain.generate_scenarios(cond, 3))
    # capped: an over-max entry warms the chunk shape, not a bigger one
    assert warmed.warm((10_000,)) >= 0.0


def test_generate_scenarios_nonuniform_cond_conserves():
    state, _, _ = create_train_state(TINY, TrainConfig())
    pg = PretrainedGenerator(state.gen_params, TINY)
    rng = np.random.RandomState(3)
    cond = rng.gamma(2.0, 5.0, size=(16, 16, 1)).astype(np.float32)
    scen = pg.generate_scenarios(cond, 4)
    np.testing.assert_allclose(
        scen.sum(axis=1),
        np.broadcast_to(cond[None, ..., 0], (4, 16, 16)),
        rtol=1e-3, atol=1e-4,
    )


def test_plot_scenarios_figure():
    state, _, _ = create_train_state(TINY, TrainConfig())
    pg = PretrainedGenerator(state.gen_params, TINY)
    scen = pg.generate_scenarios(5.0 * np.ones((16, 16, 1)), 2)
    fig = pg.plot_scenarios(scen)
    assert len(fig.axes) >= 2 * 24


def test_architecture_inference_from_weights(tmp_path):
    """cfg=None loaders reconstruct the ModelConfig from weight shapes —
    variant weights (tiny, large-domain, doy) load without flags."""
    from prdisagg_tpu.models.io import infer_generator_config

    for cfg, nc in (
        (TINY, 1),
        (ModelConfig(ndomain=32, latent_dim=12, gen_channels=(8, 8, 8),
                     base_channels=8, critic_channels=(8, 8, 8, 8)), 1),
        (ModelConfig(ndomain=16, latent_dim=8, n_cond_channels=3,
                     gen_channels=(8, 8, 8), base_channels=8,
                     critic_channels=(8, 8, 8, 8)), 3),
    ):
        state, _, _ = create_train_state(cfg, TrainConfig(seed=30))
        inferred = infer_generator_config(state.gen_params, nc)
        assert inferred.ndomain == cfg.ndomain
        assert inferred.latent_dim == cfg.latent_dim
        assert inferred.gen_channels == cfg.gen_channels
        assert inferred.base_channels == cfg.base_channels

    # end to end: npz and h5 round trips with cfg=None
    state, _, _ = create_train_state(TINY, TrainConfig(seed=31))
    npz = str(tmp_path / "gen.npz")
    h5 = str(tmp_path / "gen.h5")
    save_params_npz(npz, state.gen_params)
    save_keras_generator_h5(h5, state.gen_params, TINY)
    for pg in (PretrainedGenerator.from_npz(npz),
               PretrainedGenerator.from_keras_h5(h5)):
        assert pg.cfg.ndomain == 16 and pg.cfg.latent_dim == 8
        out = pg.generate_scenarios(10 * np.ones((16, 16, 1)), 2)
        assert out.shape == (2, 24, 16, 16)


def test_inference_entry_points_default_float32(tmp_path):
    """The reference's predict path is implicit f32
    (raindisagg_gan_pretrained.py:60): PretrainedGenerator and the weight-
    file config inference default to float32 so loading published f32
    weights reproduces reference outputs bit-level; bfloat16 stays the
    TRAINING default (ADVICE round 3)."""
    from prdisagg_tpu.models.io import (
        infer_critic_config,
        infer_generator_config,
    )
    from prdisagg_tpu.train.state import infer_model_config_from_weights

    state, _, _ = create_train_state(TINY, TrainConfig(seed=77))
    assert PretrainedGenerator(state.gen_params).cfg.compute_dtype == \
        "float32"
    assert infer_generator_config(
        state.gen_params).compute_dtype == "float32"
    assert infer_critic_config(
        state.critic_params).compute_dtype == "float32"
    # training default unchanged
    assert ModelConfig().compute_dtype == "bfloat16"
    # the TRAINING warm-start inference keeps the training default
    gp = str(tmp_path / "gen.npz")
    cp = str(tmp_path / "disc.npz")
    save_params_npz(gp, state.gen_params)
    save_params_npz(cp, state.critic_params)
    assert infer_model_config_from_weights(gp, cp).compute_dtype == \
        "bfloat16"


def test_critic_config_inference(tmp_path):
    """infer_critic_config reconstructs EVERYTHING from critic weights —
    including n_cond_channels, which generator inference cannot see
    (VERDICT round-3 item 7; reference continue-training workflow
    gan_train_cwgangp_pixelnorm.py:520-521)."""
    from prdisagg_tpu.models.io import infer_critic_config

    for cfg in (
        TINY,
        ModelConfig(ndomain=32, latent_dim=12, gen_channels=(8, 8, 8),
                    base_channels=8, critic_channels=(8, 16, 16, 8)),
        ModelConfig(ndomain=16, latent_dim=8, n_cond_channels=3,
                    gen_channels=(8, 8, 8), base_channels=8,
                    critic_channels=(8, 8, 8, 8)),
    ):
        state, _, _ = create_train_state(cfg, TrainConfig(seed=40))
        inferred = infer_critic_config(state.critic_params)
        assert inferred.ndomain == cfg.ndomain
        assert inferred.n_cond_channels == cfg.n_cond_channels
        assert inferred.critic_channels == cfg.critic_channels

    # cfg-free .h5 load validates against the inferred architecture
    state, _, _ = create_train_state(TINY, TrainConfig(seed=41))
    p = str(tmp_path / "disc.h5")
    save_keras_critic_h5(p, state.critic_params, TINY)
    loaded = load_keras_critic_h5(p)  # no config at all
    _assert_trees_equal(state.critic_params, loaded)


def test_warm_start_infers_architecture(tmp_path):
    """warm_start(model_cfg=None) rebuilds the full config from BOTH weight
    files; the critic's conv0 channels disambiguate doy-variant weights."""
    from prdisagg_tpu.train.state import warm_start

    doy_cfg = ModelConfig(ndomain=16, latent_dim=8, n_cond_channels=3,
                          gen_channels=(8, 8, 8), base_channels=8,
                          critic_channels=(8, 8, 8, 8))
    state, _, _ = create_train_state(doy_cfg, TrainConfig(seed=42))
    gp = str(tmp_path / "gen.h5")
    cp = str(tmp_path / "disc.h5")
    save_keras_generator_h5(gp, state.gen_params, doy_cfg)
    save_keras_critic_h5(cp, state.critic_params, doy_cfg)

    new_state, gen, critic = warm_start(None, TrainConfig(seed=0), gp, cp)
    assert gen.cfg.n_cond_channels == 3       # from the critic's conv0
    assert gen.cfg.latent_dim == 8            # NOT 8 + 16*16*2
    assert gen.cfg.ndomain == 16
    _assert_trees_equal(state.gen_params, new_state.gen_params)
    _assert_trees_equal(state.critic_params, new_state.critic_params)

    # warm-started nets must run a forward pass
    out = gen.apply(new_state.gen_params,
                    np.zeros((2, 8), "f4"), np.zeros((2, 16, 16, 3), "f4"))
    assert out.shape == (2, 24, 16, 16, 1)


def test_warm_start_inference_mismatch_raises(tmp_path):
    from prdisagg_tpu.train.state import warm_start

    s16, _, _ = create_train_state(TINY, TrainConfig(seed=43))
    big = ModelConfig(ndomain=32, latent_dim=8, gen_channels=(8, 8, 8),
                      base_channels=8, critic_channels=(8, 8, 8, 8))
    s32, _, _ = create_train_state(big, TrainConfig(seed=44))
    gp = str(tmp_path / "gen16.h5")
    cp = str(tmp_path / "disc32.h5")
    save_keras_generator_h5(gp, s16.gen_params, TINY)
    save_keras_critic_h5(cp, s32.critic_params, big)
    with pytest.raises(ValueError, match="ndomain"):
        warm_start(None, TrainConfig(seed=0), gp, cp)


def test_plot_scenarios_hour_label_modes():
    """Default reproduces the reference's off-by-one panel indexing
    (panel 0 labeled 00:00 shows hour 23, raindisagg_gan_pretrained.py:80);
    hour_labels="aligned" opts into correct alignment (docs/DESIGN.md §8)."""
    import matplotlib

    matplotlib.use("agg")
    from prdisagg_tpu.api.pretrained import plot_scenarios

    scen = np.zeros((1, 24, 4, 4), dtype=np.float32)
    for h in range(24):
        scen[0, h] = h + 1.0  # identify each hour by its constant value

    def first_panel(fig):  # first axes that actually holds an image
        ax = next(a for a in fig.axes if a.images)
        return np.asarray(ax.images[0].get_array())

    fig_ref = plot_scenarios(scen)
    assert first_panel(fig_ref)[0, 0] == 24.0  # hour 23 under 00:00 label

    fig_al = plot_scenarios(scen, hour_labels="aligned")
    assert first_panel(fig_al)[0, 0] == 1.0  # hour 0 under the 00:00 label

    with pytest.raises(ValueError, match="hour_labels"):
        plot_scenarios(scen, hour_labels="bogus")


@pytest.mark.quick
def test_generate_scenarios_chunked_matches_single_forward():
    """Requests above max_batch are served in equal-shape chunks (padded
    tail) and must equal the single-forward result exactly — one jitted
    program, no HBM blowup for large scenario counts (round 3; the
    reference leans on Keras predict's internal batching the same way)."""
    state, _, _ = create_train_state(TINY, TrainConfig())
    cond = 10.0 * np.ones((16, 16, 1), dtype=np.float32)
    latent = np.random.RandomState(5).randn(10, TINY.latent_dim).astype("f4")

    pg_one = PretrainedGenerator(state.gen_params, TINY)
    pg_chunk = PretrainedGenerator(state.gen_params, TINY, max_batch=4)
    scen_one = pg_one.generate_scenarios(cond, 10, latent=latent)
    scen_chunk = pg_chunk.generate_scenarios(cond, 10, latent=latent)
    np.testing.assert_allclose(scen_chunk, scen_one, rtol=1e-6, atol=1e-7)
    # conservation still exact through the padded tail chunk
    np.testing.assert_allclose(scen_chunk.sum(axis=1), 10.0, rtol=1e-4)


def test_default_max_batch_scales_with_domain():
    """The default per-forward cap is the measured 8000 ceiling ONLY at the
    16x16 flagship; larger domains scale it by the ~ndomain^2 activation
    footprint with 4x headroom — a 64x64 f32 forward at the naively
    scaled batch 500 AOT-OOMed the v5e (round 4, 24.2G vs 15.75G HBM:
    ~48 MB HLO temp per sample), and 2.5x headroom (batch 200) still
    ResourceExhausted at run time next to a resident training state."""
    import dataclasses

    assert PretrainedGenerator({}, TINY).max_batch == 8000  # bf16 ceiling
    # the f32 inference DEFAULT halves it: f32 batch-8000 compiles to
    # 23.81G of 15.75G HBM (found live by scripts/exp_serve_bench.py)
    f32 = dataclasses.replace(TINY, compute_dtype="float32")
    assert PretrainedGenerator({}, f32).max_batch == 4000
    big = dataclasses.replace(TINY, ndomain=64)
    assert PretrainedGenerator({}, big).max_batch == 125
    assert PretrainedGenerator({}, dataclasses.replace(TINY, ndomain=32)) \
        .max_batch == 500
    # an explicit cap always wins
    assert PretrainedGenerator({}, big, max_batch=77).max_batch == 77


def test_generate_scenarios_batch_matches_per_request():
    """K conditions flattened into one (K*n)-batch forward must reproduce
    the per-request results exactly (same latents) — the multi-request
    serving path that rides the batch-8000 throughput peak, incl. through
    the max_batch chunking."""
    state, _, _ = create_train_state(TINY, TrainConfig())
    rng = np.random.RandomState(11)
    conds = rng.gamma(2.0, 5.0, size=(3, 16, 16, 1)).astype(np.float32)
    latent = rng.randn(12, TINY.latent_dim).astype("f4")

    pg = PretrainedGenerator(state.gen_params, TINY)
    batched = pg.generate_scenarios_batch(conds, 4, latent=latent)
    assert batched.shape == (3, 4, 24, 16, 16)
    for k in range(3):
        single = pg.generate_scenarios(conds[k], 4,
                                       latent=latent[4 * k:4 * (k + 1)])
        np.testing.assert_allclose(batched[k], single, rtol=1e-6, atol=1e-7)
    # conservation per request
    np.testing.assert_allclose(
        batched.sum(axis=2),
        np.broadcast_to(conds[:, None, ..., 0], (3, 4, 16, 16)),
        rtol=1e-3, atol=1e-4)
    # 3-D conds (no channel dim) + chunked path agree with single-forward
    pg_chunk = PretrainedGenerator(state.gen_params, TINY, max_batch=5)
    b2 = pg_chunk.generate_scenarios_batch(conds[..., 0], 4, latent=latent)
    np.testing.assert_allclose(b2, batched, rtol=1e-6, atol=1e-7)


def test_pretrained_generator_pins_params_on_device():
    """Weight-file loaders hand back host numpy trees; the API must pin
    them on device at construction — a host tree passed to the jitted
    predict re-uploads every weight on every call (through the tunneled
    TPU this made the 10k CRPS protocol 3x slower, round 4)."""
    state, _, _ = create_train_state(TINY, TrainConfig(seed=9))
    host_params = jax.device_get(state.gen_params)
    leaves = jax.tree_util.tree_leaves(host_params)
    assert all(isinstance(x, np.ndarray) for x in leaves)
    pg = PretrainedGenerator(host_params, TINY)
    assert all(isinstance(x, jax.Array)
               for x in jax.tree_util.tree_leaves(pg.params))


def test_mesh_serving_matches_single_device():
    """Data-parallel serving (PretrainedGenerator(mesh=...)): the scenario
    batch is sharded over the mesh axis with params replicated — per-sample
    math is untouched, so the result must match the single-device path,
    including non-divisible scenario counts (padded to a mesh multiple) and
    chunked requests (max_batch rounded to a mesh multiple).  SURVEY §2.2:
    DP over ICI is the TPU-native replacement for the reference's
    single-GPU predict."""
    from prdisagg_tpu.parallel import make_mesh

    state, _, _ = create_train_state(TINY, TrainConfig())
    mesh = make_mesh(8)
    rng = np.random.RandomState(7)
    cond = rng.uniform(1.0, 30.0, (16, 16, 1)).astype(np.float32)
    latent = rng.randn(10, TINY.latent_dim).astype("f4")

    pg = PretrainedGenerator(state.gen_params, TINY)
    pg_dp = PretrainedGenerator(state.gen_params, TINY, mesh=mesh)
    # n=10 is not a multiple of 8: the pad-and-slice path must be exact
    scen = pg.generate_scenarios(cond, 10, latent=latent)
    scen_dp = pg_dp.generate_scenarios(cond, 10, latent=latent)
    np.testing.assert_allclose(scen_dp, scen, rtol=1e-6, atol=1e-7)

    # chunked + mesh: an explicit max_batch is rounded to a mesh multiple
    pg_dp_chunk = PretrainedGenerator(state.gen_params, TINY, max_batch=7,
                                      mesh=mesh)
    assert pg_dp_chunk.max_batch == 8
    scen_chunk = pg_dp_chunk.generate_scenarios(cond, 10, latent=latent)
    np.testing.assert_allclose(scen_chunk, scen, rtol=1e-6, atol=1e-7)


def test_mesh_serving_actually_shards():
    """The forward under a mesh must BE data-parallel: the fraction batch
    comes back sharded over all mesh devices (not replicated on one)."""
    from prdisagg_tpu.parallel import make_mesh

    state, _, _ = create_train_state(TINY, TrainConfig())
    mesh = make_mesh(8)
    pg = PretrainedGenerator(state.gen_params, TINY, mesh=mesh)
    latent = np.zeros((16, TINY.latent_dim), np.float32)
    cond = np.full((16, 16, 16, 1), 0.1, np.float32)
    out = pg.predict_fractions(latent, cond)
    assert len(out.sharding.device_set) == 8
    # batch axis sharded: each device holds 16/8 = 2 rows
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(2, *out.shape[1:])}


def test_mesh_serving_batch_api_matches():
    """generate_scenarios_batch under a mesh equals the no-mesh result."""
    from prdisagg_tpu.parallel import make_mesh

    state, _, _ = create_train_state(TINY, TrainConfig())
    rng = np.random.RandomState(11)
    conds = rng.uniform(1.0, 30.0, (3, 16, 16)).astype(np.float32)
    latent = rng.randn(3 * 5, TINY.latent_dim).astype("f4")
    pg = PretrainedGenerator(state.gen_params, TINY)
    pg_dp = PretrainedGenerator(state.gen_params, TINY, mesh=make_mesh(8))
    a = pg.generate_scenarios_batch(conds, 5, latent=latent)
    b = pg_dp.generate_scenarios_batch(conds, 5, latent=latent)
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)


def test_wire_dtype_f16_halves_fetch_and_stays_close():
    """wire_dtype='float16' casts the fractions ON DEVICE before the host
    fetch (bulk serving is fetch-bound through the tunnel, docs/PERF.md):
    outputs must match the f32 path to f16 quantization (~1e-3 relative)
    and conservation must hold to ~5e-4 relative; the response dtype stays
    float32 (the rescale upcasts)."""
    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    rng = np.random.RandomState(5)
    cond = rng.gamma(2.0, 5.0, (TINY.ndomain, TINY.ndomain)).astype(
        np.float32)
    f32 = PretrainedGenerator(state.gen_params, TINY, seed=7)
    f16 = PretrainedGenerator(state.gen_params, TINY, seed=7,
                              wire_dtype="float16")
    a = f32.generate_scenarios(cond, 4)
    b = f16.generate_scenarios(cond, 4)
    assert b.dtype == np.float32  # wire dtype never leaks into the API
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(
        b.sum(axis=1), np.broadcast_to(cond, b.sum(axis=1).shape),
        rtol=5e-3)
    # the raw fetch really is f16 (half the wire bytes)
    lat = np.zeros((2, TINY.latent_dim), np.float32)
    cnd = np.zeros((2, TINY.ndomain, TINY.ndomain, 1), np.float32)
    assert np.asarray(f16.predict_fractions(lat, cnd)).dtype == np.float16
    assert np.asarray(f32.predict_fractions(lat, cnd)).dtype == np.float32


def test_wire_dtype_validated():
    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    with pytest.raises(ValueError, match="wire_dtype"):
        PretrainedGenerator(state.gen_params, TINY, wire_dtype="bfloat16")
    # "float32" normalizes to the default exact path
    pg = PretrainedGenerator(state.gen_params, TINY, wire_dtype="float32")
    assert pg.wire_dtype is None
