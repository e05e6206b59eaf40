"""Pallas patch-gather kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from prdisagg_tpu.ops.pallas_gather import gather_patches_pallas


def test_interpret_gather_exact():
    rng = np.random.RandomState(0)
    data = rng.rand(4, 24, 48, 40).astype(np.float32)
    idx = np.array(
        [[0, 0, 5], [2, 16, 16], [3, 32, 24], [1, 8, 0]], dtype=np.int32
    )
    out = gather_patches_pallas(jnp.asarray(data), jnp.asarray(idx), 16,
                                interpret=True)
    assert out.shape == (4, 24, 16, 16)
    for i, (t, y, x) in enumerate(idx):
        np.testing.assert_array_equal(
            np.asarray(out[i]), data[t, :, y : y + 16, x : x + 16]
        )


def test_interpret_gather_matches_xla_path():
    from prdisagg_tpu.core.config import DataConfig
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset

    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=48, nx=48, seed=1)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    idx = ds.indices[: min(6, ds.n_samples)]
    xla = np.asarray(ds._gather_patches(idx, allow_pallas=False))[..., 0]
    pal = np.asarray(
        gather_patches_pallas(ds.data, idx, dcfg.ndomain, interpret=True)
    )
    np.testing.assert_array_equal(xla, pal)


def test_sharded_gather_on_8_device_mesh():
    """shard_map'd Pallas gather (interpret mode) on the virtual CPU mesh:
    per-device batch shards, replicated data, exact equality with the XLA
    path (VERDICT round-2 item 4)."""
    import pytest

    from prdisagg_tpu.ops.pallas_gather import gather_patches_pallas_sharded
    from prdisagg_tpu.parallel import make_mesh

    rng = np.random.RandomState(3)
    data = rng.rand(4, 24, 64, 128).astype(np.float32)  # nx lane-aligned
    ts = rng.randint(0, 4, size=16)
    ys = rng.randint(0, 6, size=16) * 8                  # sublane-aligned
    xs = rng.randint(0, 112, size=16)
    idx = np.stack([ts, ys, xs], axis=1).astype(np.int32)

    mesh = make_mesh(8)
    out = gather_patches_pallas_sharded(
        jnp.asarray(data), jnp.asarray(idx), 16, mesh, interpret=True
    )
    assert out.shape == (16, 24, 16, 16)
    for i, (t, y, x) in enumerate(idx):
        np.testing.assert_array_equal(
            np.asarray(out[i]), data[t, :, y : y + 16, x : x + 16]
        )

    with pytest.raises(ValueError, match="not divisible"):
        gather_patches_pallas_sharded(
            jnp.asarray(data), jnp.asarray(idx[:12]), 16, mesh,
            interpret=True,
        )


def test_sampler_pallas_gate_off_tpu():
    """On the CPU test backend the sampler must choose the XLA path."""
    from prdisagg_tpu.core.config import DataConfig
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset

    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32, seed=2)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    assert not ds._pallas_gather_ok()
    frac, cond = ds.sample_real(jax.random.PRNGKey(0), 4)
    assert frac.shape == (4, 24, 16, 16, 1)


def test_pallas_upsample_conv_interpret_matches_xla():
    """Pallas folded upsample-conv (interpret mode): forward + both
    gradients must match the XLA phase-conv formulation.  (On v5e the
    kernel measured SLOWER than the XLA phase convs at every generator
    stage — kept as a documented, correct alternative; docs/PERF.md.)"""
    from prdisagg_tpu.ops.fused_upsample_conv import upsample2_conv3
    from prdisagg_tpu.ops.pallas_upsample_conv import (
        upsample2_conv3_pallas_interpret,
    )

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 6, 4, 4, 8).astype("f4"))
    k = jnp.asarray(rng.randn(3, 3, 3, 8, 8).astype("f4") * 0.1)
    b = jnp.asarray(rng.randn(8).astype("f4"))

    ref = upsample2_conv3(x, k, b)
    got = upsample2_conv3_pallas_interpret(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    def loss_ref(x, k, b):
        return jnp.sum(jnp.sin(upsample2_conv3(x, k, b)))

    def loss_pal(x, k, b):
        return jnp.sum(jnp.sin(upsample2_conv3_pallas_interpret(x, k, b)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(x, k, b)
    for a_, b_ in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)
