import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prdisagg_tpu.ops import (
    fractions_and_condition,
    hour_softmax,
    pixel_norm,
    upsample3d_nearest,
)

# whole module is part of the quick smoke tier (VERDICT r4 item 8)
pytestmark = pytest.mark.quick

def test_pixel_norm_matches_reference_math():
    # reference: x / sqrt(mean(x^2, ch) + 1e-8)
    # (gan_train_cwgangp_pixelnorm.py:249-270 uses sqrt(mean+eps) with the
    # eps added to the mean before sqrt)
    x = np.random.RandomState(0).randn(2, 3, 4, 4, 8).astype(np.float32)
    got = np.asarray(pixel_norm(jnp.asarray(x)))
    want = x / np.sqrt(np.mean(x**2, axis=-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hour_softmax_conserves_exactly():
    x = jnp.asarray(np.random.RandomState(1).randn(4, 24, 16, 16, 1) * 5)
    frac = hour_softmax(x)
    sums = jnp.sum(frac, axis=1)
    np.testing.assert_allclose(np.asarray(sums), 1.0, atol=1e-6)
    assert frac.dtype == jnp.float32
    assert np.all(np.asarray(frac) >= 0)


def test_hour_softmax_f32_even_for_bf16_input():
    x = jnp.ones((2, 24, 8, 8, 1), dtype=jnp.bfloat16)
    frac = hour_softmax(x)
    assert frac.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(jnp.sum(frac, axis=1)), 1.0, atol=1e-6)


def test_upsample3d_nearest():
    x = jnp.arange(2 * 3 * 2 * 2 * 1, dtype=jnp.float32).reshape(2, 3, 2, 2, 1)
    up = upsample3d_nearest(x, 2)
    assert up.shape == (2, 6, 4, 4, 1)
    # every 2x2x2 block equals the source voxel
    x_np = np.asarray(x)
    up_np = np.asarray(up)
    for d in range(6):
        for i in range(4):
            for j in range(4):
                np.testing.assert_array_equal(
                    up_np[:, d, i, j, 0], x_np[:, d // 2, i // 2, j // 2, 0]
                )


def test_fractions_and_condition():
    rng = np.random.RandomState(2)
    patches = rng.gamma(1.0, 2.0, size=(5, 24, 16, 16, 1)).astype(np.float32) + 1e-3
    frac, cond = fractions_and_condition(jnp.asarray(patches), norm_scale=127.4)
    assert frac.shape == patches.shape
    assert cond.shape == (5, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(jnp.sum(frac, axis=1)), 1.0, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cond), patches.sum(axis=1) / 127.4, rtol=1e-5
    )
    assert np.asarray(frac).min() >= 0
    assert np.asarray(frac).max() <= 1.0 + 1e-5


def test_fractions_zero_daily_sum_is_safe():
    patches = jnp.zeros((1, 24, 4, 4, 1))
    frac, cond = fractions_and_condition(patches, norm_scale=127.4)
    assert not np.any(np.isnan(np.asarray(frac)))
    np.testing.assert_array_equal(np.asarray(frac), 0.0)


def test_pixel_norm_mixed_matches_pixel_norm():
    """pixel_norm_mixed == pixel_norm exactly for f32, and for bf16 the
    f32-accumulated statistic keeps the result within bf16 rounding."""
    from prdisagg_tpu.ops import pixel_norm, pixel_norm_mixed

    rng = np.random.RandomState(5)
    x = rng.randn(2, 6, 4, 4, 16).astype(np.float32) * 3
    np.testing.assert_array_equal(
        np.asarray(pixel_norm_mixed(jnp.asarray(x))),
        np.asarray(pixel_norm(jnp.asarray(x))),
    )
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    got = np.asarray(pixel_norm_mixed(xb), dtype=np.float32)
    want = np.asarray(pixel_norm(jnp.asarray(x)))
    assert got.dtype == np.float32 and pixel_norm_mixed(xb).dtype == jnp.bfloat16
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
