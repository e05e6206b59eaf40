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
