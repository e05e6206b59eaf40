"""On-device patch sampler: the TPU-native replacement for the reference's
host-side `view_as_windows` gather + GeneratorEnqueuer multiprocessing queue
(gan_train_cwgangp_pixelnorm.py:143-212,440-449).

The radar tensor lives in HBM once; every train step draws random index
triples with `jax.random`, gathers (nhours, nd, nd) windows with a vmapped
`dynamic_slice`, and applies the fraction/condition transform — all inside the
jitted step, zero host involvement.

Conditioning variants (SURVEY.md C20):
  base: cond = normalized daily sum (1 channel)
  doy:  + sin/cos(2*pi*doy/365) channels from a per-day sidecar array
  lon:  + normalized patch x-index channel
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from prdisagg_tpu.core.config import Conditioning, DataConfig
from prdisagg_tpu.ops import fractions_and_condition


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceDataset:
    """HBM-resident dataset: radar tensor + valid patch indices.

    All fields are jax arrays so the whole object threads through jit/pjit as
    a pytree; static config lives in aux data.
    """

    data: jax.Array            # (days, nhours, ny, nx) float32
    indices: jax.Array         # (S, 3) int32 rows (tidx, yidx, xidx)
    doy: Optional[jax.Array]   # (days,) float32 day-of-year sidecar, or None
    # (days, ny, nx) precomputed daily sums: cond-only draws (the generator
    # update's condition half) gather from this 1/24-size tensor instead of
    # full hourly patches — 24x fewer HBM bytes per cond sample (VERDICT
    # round-3 item 9; reference gathers full windows either way,
    # gan_train_cwgangp_pixelnorm.py:177-193)
    dsum: Optional[jax.Array]
    cfg: DataConfig

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.data, self.indices, self.doy, self.dsum), self.cfg

    @classmethod
    def tree_unflatten(cls, cfg, children):
        data, indices, doy, dsum = children
        return cls(data=data, indices=indices, doy=doy, dsum=dsum, cfg=cfg)

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_numpy(
        cls,
        data: np.ndarray,
        indices: np.ndarray,
        cfg: DataConfig,
        doy: Optional[np.ndarray] = None,
    ) -> "DeviceDataset":
        if cfg.conditioning == Conditioning.DOY and doy is None:
            raise ValueError("doy conditioning requires the day-of-year sidecar")
        data = np.asarray(data, dtype=np.float32)
        # On TPU, pad the x (lane) dimension to a multiple of 128 so the
        # Pallas DMA gather's dynamic lane roll stays tile-aligned.  The pad
        # region is never gathered (valid x offsets satisfy x + nd <= nx).
        if (
            jax.default_backend() == "tpu"
            and cfg.stride % 8 == 0
            and data.shape[-1] % 128 != 0
        ):
            pad = 128 - data.shape[-1] % 128
            data = np.pad(data, ((0, 0), (0, 0), (0, 0), (0, pad)))
        dev_data = jnp.asarray(data)
        return cls(
            data=dev_data,
            indices=jnp.asarray(indices, dtype=jnp.int32),
            doy=None if doy is None else jnp.asarray(doy, dtype=jnp.float32),
            dsum=jnp.sum(dev_data, axis=1),
            cfg=cfg,
        )

    @property
    def n_samples(self) -> int:
        return self.indices.shape[0]

    # -- sampling ------------------------------------------------------------
    def _pallas_gather_ok(self) -> bool:
        """The Pallas DMA gather needs y offsets aligned to the f32 sublane
        tiling (8) — guaranteed by the valid-index sweep when the stride is a
        multiple of 8 — and a lane-aligned row width (nx % 128 == 0, ensured
        by from_numpy padding).  Measured 2.7x faster than the XLA gather on
        v5e."""
        return (
            jax.default_backend() == "tpu"
            and self.cfg.stride % 8 == 0
            and self.data.shape[-1] % 128 == 0
        )

    def _use_pallas(self, allow) -> bool:
        """allow: True / False / None (auto).  Auto uses Pallas only for
        large tensors — XLA's gather lowering materializes a copy of the
        data operand per gather site, which OOMs HBM for multi-GB datasets,
        while the Pallas DMA reads in place."""
        if allow is False or not self._pallas_gather_ok():
            return False
        if allow is True:
            return True
        return self.data.size * self.data.dtype.itemsize > 256 * 1024 ** 2

    def _gather_patches(self, idx: jax.Array, allow_pallas=None,
                        mesh=None) -> jax.Array:
        """idx: (B, 3) int32 -> (B, nhours, nd, nd, 1) hourly mm patches.

        With `mesh` (size > 1), the Pallas path runs under shard_map with
        the batch partitioned along the data axis and the tensor replicated,
        so multi-GB HBM datasets compose with data parallelism."""
        nd = self.cfg.ndomain
        nh = self.cfg.nhours

        if self._use_pallas(allow_pallas):
            if mesh is not None and mesh.size > 1:
                from prdisagg_tpu.ops.pallas_gather import (
                    gather_patches_pallas_sharded,
                )

                return gather_patches_pallas_sharded(
                    self.data, idx, nd, mesh)[..., None]
            from prdisagg_tpu.ops.pallas_gather import gather_patches_pallas

            return gather_patches_pallas(self.data, idx, nd)[..., None]

        def one(t, y, x):
            return jax.lax.dynamic_slice(
                self.data, (t, 0, y, x), (1, nh, nd, nd)
            )[0]

        patches = jax.vmap(one)(idx[:, 0], idx[:, 1], idx[:, 2])
        return patches[..., None]

    def _extra_cond_channels(self, idx: jax.Array) -> list[jax.Array]:
        """Broadcast per-patch scalars into (B, nd, nd, 1) condition maps."""
        cfg = self.cfg
        nd = cfg.ndomain
        b = idx.shape[0]
        extras = []
        if cfg.conditioning == Conditioning.DOY:
            doy = self.doy[idx[:, 0]]  # (B,)
            angle = 2.0 * jnp.pi * doy / 365.0
            for ch in (jnp.sin(angle), jnp.cos(angle)):
                extras.append(jnp.broadcast_to(ch[:, None, None, None], (b, nd, nd, 1)))
        elif cfg.conditioning == Conditioning.LON:
            # normalized x-index, matching the reference's
            # (x - min_lonidx) / max_lonidx normalization
            # (gan_train_cwgangp_pixelnorm_lon.py:126-129,175-178)
            xs = self.indices[:, 2]
            min_lon = jnp.min(xs).astype(jnp.float32)
            max_lon = jnp.max(xs).astype(jnp.float32)
            lon = (idx[:, 2].astype(jnp.float32) - min_lon) / jnp.maximum(max_lon, 1.0)
            extras.append(jnp.broadcast_to(lon[:, None, None, None], (b, nd, nd, 1)))
        return extras

    def sample_patches_raw(
        self, key: jax.Array, n_batch: int, allow_pallas=None
    ) -> jax.Array:
        """Random raw hourly-mm patches (B, nh, nd, nd) — no fraction
        transform; used by RainFARM calibration
        (rainfarm/rainfarm_calibrate.py:76-83)."""
        ix = jax.random.randint(key, (n_batch,), 0, self.n_samples)
        return self._gather_patches(self.indices[ix], allow_pallas)[..., 0]

    def sample_real(self, key: jax.Array, n_batch: int,
                    allow_pallas=None, mesh=None):
        """Random (fractions, condition) batch — reference
        `generate_real_samples` semantics (gan_train_cwgangp_pixelnorm.py:143-174).

        `allow_pallas=False` forces the XLA gather; under a mesh the Pallas
        path runs via shard_map on per-device batch shards.

        Returns (frac (B, nh, nd, nd, 1), cond (B, nd, nd, n_cond_channels)).
        """
        ix = jax.random.randint(key, (n_batch,), 0, self.n_samples)
        idx = self.indices[ix]
        patches = self._gather_patches(idx, allow_pallas, mesh)
        frac, cond = fractions_and_condition(
            patches, self.cfg.norm_scale, self.cfg.frac_eps
        )
        cond = jnp.concatenate([cond, *self._extra_cond_channels(idx)], axis=-1) \
            if self.cfg.conditioning != Conditioning.BASE else cond
        return frac, cond

    def sample_cond(self, key: jax.Array, n_batch: int,
                    allow_pallas=None, mesh=None) -> jax.Array:
        """Random conditions only — reference `generate_latent_points`'s
        condition half (gan_train_cwgangp_pixelnorm.py:177-193).

        Gathers (nd, nd) windows from the precomputed daily-sum tensor
        instead of full (nhours, nd, nd) patches: identical values (the
        condition IS the hour-sum), 24x fewer HBM bytes.  Index draw uses
        the same key stream as :meth:`sample_real`, so the sampled
        conditions match the full-patch path draw-for-draw.
        """
        if self.dsum is None:  # restored from an old checkpointed pytree
            _, cond = self.sample_real(key, n_batch, allow_pallas, mesh)
            return cond
        ix = jax.random.randint(key, (n_batch,), 0, self.n_samples)
        idx = self.indices[ix]
        nd = self.cfg.ndomain

        def one(t, y, x):
            return jax.lax.dynamic_slice(self.dsum, (t, y, x), (1, nd, nd))[0]

        dsum = jax.vmap(one)(idx[:, 0], idx[:, 1], idx[:, 2])[..., None]
        cond = dsum / self.cfg.norm_scale
        if self.cfg.conditioning != Conditioning.BASE:
            cond = jnp.concatenate(
                [cond, *self._extra_cond_channels(idx)], axis=-1)
        return cond

    def sample_latent(self, key: jax.Array, n_batch: int, latent_dim: int,
                      allow_pallas=None, mesh=None):
        """(latent, cond) pair for generator updates."""
        k_lat, k_cond = jax.random.split(key)
        latent = jax.random.normal(k_lat, (n_batch, latent_dim))
        return latent, self.sample_cond(k_cond, n_batch, allow_pallas, mesh)


@partial(jax.jit, static_argnames=("n_batch",))
def sample_real_jit(ds: DeviceDataset, key: jax.Array, n_batch: int):
    return ds.sample_real(key, n_batch)
