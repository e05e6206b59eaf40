"""Real-TensorFlow validation of the Keras .h5 export (ADVICE round-2
medium finding): the exported files must open via
`tf.keras.models.load_model(path, custom_objects={'PixelNormalization': ...},
compile=False)` — exactly how the reference ecosystem loads the published
weights (raindisagg_gan_pretrained.py:43-45, generate_and_evaluate.py:155) —
and the loaded Keras model must reproduce the Flax model's outputs.

Skipped when tensorflow is not installed (it is not a dependency of the
framework; the structural h5py round-trip tests in test_api_and_io.py cover
the no-TF path).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from prdisagg_tpu.core.config import ModelConfig, TrainConfig  # noqa: E402
from prdisagg_tpu.models.io import (  # noqa: E402
    save_keras_critic_h5,
    save_keras_generator_h5,
)
from prdisagg_tpu.train import create_train_state  # noqa: E402

# f32 so Flax vs TF agree to float tolerance (bf16 is a compute-dtype policy,
# not a weight format)
TINY = ModelConfig(
    ndomain=16, latent_dim=8, gen_channels=(8, 8, 8), base_channels=8,
    critic_channels=(8, 8, 8, 8), compute_dtype="float32",
)


class PixelNormalization(tf.keras.layers.Layer):
    """The custom layer a reference-ecosystem user registers at load time
    (semantics of gan_train_cwgangp_pixelnorm.py:249-270, re-expressed)."""

    def call(self, x):
        return x / tf.sqrt(
            tf.reduce_mean(tf.square(x), axis=-1, keepdims=True) + 1.0e-8)

    def get_config(self):
        return super().get_config()


CUSTOM = {"PixelNormalization": PixelNormalization}


@pytest.fixture(scope="module")
def state_and_models():
    return create_train_state(TINY, TrainConfig(seed=7))


def test_generator_h5_loads_and_matches_flax(tmp_path, state_and_models):
    state, gen, _ = state_and_models
    path = str(tmp_path / "gen.h5")
    save_keras_generator_h5(path, state.gen_params, TINY)

    m = tf.keras.models.load_model(path, custom_objects=CUSTOM, compile=False)

    rng = np.random.RandomState(0)
    lat = rng.randn(4, TINY.latent_dim).astype("f4")
    cond = rng.rand(4, 16, 16, 1).astype("f4")
    keras_out = m.predict([lat, cond], verbose=0)
    flax_out = np.asarray(gen.apply(state.gen_params, lat, cond))
    assert keras_out.shape == flax_out.shape == (4, 24, 16, 16, 1)
    np.testing.assert_allclose(keras_out, flax_out, rtol=1e-4, atol=1e-6)
    # conservation survives the round trip through Keras
    np.testing.assert_allclose(keras_out.sum(axis=1), 1.0, atol=1e-5)


def test_critic_h5_loads_and_matches_flax(tmp_path, state_and_models):
    state, _, critic = state_and_models
    path = str(tmp_path / "disc.h5")
    save_keras_critic_h5(path, state.critic_params, TINY)

    m = tf.keras.models.load_model(path, custom_objects=CUSTOM, compile=False)

    rng = np.random.RandomState(1)
    sample = rng.rand(4, 24, 16, 16, 1).astype("f4")
    cond = rng.rand(4, 16, 16, 1).astype("f4")
    keras_out = m.predict([sample, cond], verbose=0)  # dropout inactive
    flax_out = np.asarray(
        critic.apply(state.critic_params, sample, cond, deterministic=True))
    assert keras_out.shape == flax_out.shape == (4, 1)
    np.testing.assert_allclose(keras_out, flax_out, rtol=1e-4, atol=1e-5)


def test_variant_generator_h5_loads(tmp_path):
    """doy-conditioned (3-channel) variant config also round-trips through
    load_model — the model_config is parameterized, not hard-coded."""
    cfg = ModelConfig(ndomain=16, latent_dim=8, n_cond_channels=3,
                      gen_channels=(8, 8, 8), base_channels=8,
                      critic_channels=(8, 8, 8, 8), compute_dtype="float32")
    state, gen, _ = create_train_state(cfg, TrainConfig(seed=8))
    path = str(tmp_path / "gen_doy.h5")
    save_keras_generator_h5(path, state.gen_params, cfg)
    m = tf.keras.models.load_model(path, custom_objects=CUSTOM, compile=False)
    rng = np.random.RandomState(2)
    lat = rng.randn(2, 8).astype("f4")
    cond = rng.rand(2, 16, 16, 3).astype("f4")
    keras_out = m.predict([lat, cond], verbose=0)
    flax_out = np.asarray(gen.apply(state.gen_params, lat, cond))
    np.testing.assert_allclose(keras_out, flax_out, rtol=1e-4, atol=1e-6)
