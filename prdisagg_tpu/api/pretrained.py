"""Inference API on a trained generator — the reference's only importable
surface, preserved exactly (raindisagg_gan_pretrained.py:52-90):

  generate_scenarios(cond, n_scenarios) : (nd, nd, 1) daily sums in mm
      -> (n_scenarios, 24, nd, nd) hourly mm scenarios whose per-gridpoint
      time-sum equals the input daily sum (softmax conservation).
  plot_scenarios(scenarios) : n x 24 map grid, LogNorm(0.01, 50), shared
      colorbar.

Semantics parity: condition divided by norm_scale=127.4 before the network,
latents ~ N(0,1), fractions rescaled by cond * norm_scale back to mm/h.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from prdisagg_tpu.core.config import ModelConfig
from prdisagg_tpu.models import Generator
from prdisagg_tpu.models.io import (
    load_keras_generator_h5,
    load_params_npz,
    save_params_npz,
)

NORM_SCALE = 127.4


def _bucket(n: int) -> int:
    """Smallest b >= n with b in {2^k, 1.5*2^k}: bounds the set of
    compiled batch shapes; padding stays under 50% (worst case is just
    above a power of two: 2^k + 1 -> 1.5 * 2^k)."""
    p = 1
    while p < n:
        p <<= 1
    if p > 1 and 3 * p // 4 >= n:
        return 3 * p // 4
    return p


@partial(jax.jit, static_argnames=("gen", "wire_dtype"))
def _apply_generator(gen, params, latent, cond, wire_dtype=None):
    """Shared jitted forward for every PretrainedGenerator instance.

    flax Modules are frozen dataclasses (hashable pytrees of config), so
    equal-config instances hit ONE trace here — the paper protocol's epoch
    curve constructs a PretrainedGenerator per export and a per-instance
    `jax.jit(lambda ...)` re-traced the same program 50+ times.

    `wire_dtype` casts the output fractions ON DEVICE before the host
    fetch: bulk scenario serving is fetch-bound (24.6 KB/scenario f32
    through the ~8-10 MB/s tunnel, docs/PERF.md session 11), and fractions
    live in [0, 1] where float16's ~1e-3 relative quantization costs
    ~5e-4 relative conservation error — an opt-in 2x wire win."""
    out = gen.apply(params, latent, cond)
    return out if wire_dtype is None else out.astype(wire_dtype)


class PretrainedGenerator:
    """A trained generator + jitted predict, loadable from native .npz or the
    reference's Keras .h5 checkpoints."""

    def __init__(self, params, cfg: Optional[ModelConfig] = None,
                 norm_scale: float = NORM_SCALE, seed: int = 0,
                 max_batch: Optional[int] = None, mesh=None,
                 wire_dtype: Optional[str] = None):
        """`max_batch` caps the per-forward device batch: larger requests
        are served in chunks (batch 8000 is the single-chip HBM ceiling at
        the flagship architecture under bf16 forwards and also its
        throughput peak, ~29k scenarios/s — docs/PERF.md; at the f32
        inference default the ceiling halves to 4000, see below; the
        reference relies on Keras `predict`'s internal batching the same
        way, raindisagg_gan_pretrained.py:60).

        The default (None) scales that measured 16x16 ceiling with the
        domain's activation footprint (~ndomain^2) plus 4x headroom:
        a 64x64 f32 forward at batch 500 — the naive scaled equivalent —
        AOT-OOMed the v5e (24.2G of HLO temp vs 15.75G HBM, round-4
        large-domain run: ~48 MB temp PER SAMPLE, worse than the ~nd^2
        model), and batch 200 (2.5x headroom) still ResourceExhausted at
        run time next to a resident training state, so larger domains get
        max_batch 8000*(16/nd)^2/4 (125 at 64).

        Precision: inference defaults to float32 — the reference's predict
        path is implicit f32 (raindisagg_gan_pretrained.py:60) and published
        weights expect it; bfloat16 is the TRAINING default only.  Pass a
        cfg with compute_dtype="bfloat16" for throughput-first serving.

        `mesh` (a 1-D `jax.sharding.Mesh`, e.g. `parallel.make_mesh()`)
        turns on data-parallel serving: params are replicated, the scenario
        batch is sharded over the mesh axis, and XLA runs the forward SPMD —
        per-sample math is unchanged, so sharded output equals single-device
        output.  Per-device batch becomes max_batch/mesh.size, so serving
        throughput scales with chips (the reference is single-GPU predict;
        SURVEY §2.2 names DP over ICI as the TPU-native replacement).

        `wire_dtype="float16"` casts the output fractions on device before
        the device->host fetch — bulk serving is fetch-bound (docs/PERF.md
        session 11), so halving wire bytes ~doubles bulk export throughput
        at ~5e-4 relative conservation error (fractions are in [0, 1],
        where f16 quantization is benign).  Default None keeps the exact
        f32 reference predict path."""
        self.cfg = cfg or ModelConfig(compute_dtype="float32")
        self.mesh = mesh
        # validate cheap arguments BEFORE any device work: device_put below
        # uploads the full weight tree through the ~10 MB/s tunnel (and on a
        # wedged backend hangs forever), so a trivially detectable bad
        # argument must not cost an upload first
        if wire_dtype not in (None, "float32", "float16"):
            raise ValueError(
                f"wire_dtype must be None/'float32'/'float16', "
                f"got {wire_dtype!r}")
        self.wire_dtype = None if wire_dtype == "float32" else wire_dtype
        # pin the weights on device ONCE: .h5/.npz loaders hand back host
        # numpy trees, and a host tree passed to a jitted predict re-uploads
        # every weight on EVERY call — through the tunneled TPU that turned
        # the 10k-sample CRPS protocol from ~8 to ~27 minutes (round 4;
        # docs/PERF.md)
        if mesh is not None:
            from prdisagg_tpu.parallel.mesh import replicate

            self.params = replicate(params, mesh)
        else:
            self.params = jax.device_put(params)
        self.norm_scale = norm_scale
        if max_batch is None:
            # The 8000 ceiling at 16x16 was measured under bf16 forwards
            # (~12 GB program HBM); f32 — today's inference DEFAULT for
            # reference predict parity — doubles the col-expansion temps
            # (measured: f32 batch-8000 compiles to 23.81 GB of 15.75 GB,
            # found live by scripts/exp_serve_bench.py), so its cap halves.
            # The nd>16 rule was derived FROM f32 OOM measurements
            # (~48 MB HLO temp/sample at 64x64) and already carries 4x
            # headroom, so it stays dtype-blind.
            nd = self.cfg.ndomain
            f32 = self.cfg.compute_dtype not in ("bfloat16",)
            if nd <= 16:
                max_batch = 4000 if f32 else 8000
            else:
                max_batch = max(32, int(8000 * (16 / nd) ** 2 / 4))
        if mesh is not None:  # chunks must divide evenly over the mesh axis
            max_batch = max(mesh.size, max_batch - max_batch % mesh.size)
        self.max_batch = max_batch
        self._gen = Generator(self.cfg)
        self._predict = lambda p, l, c: _apply_generator(
            self._gen, p, l, c, self.wire_dtype)
        self._key = jax.random.PRNGKey(seed)

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_npz(cls, path: str, cfg: Optional[ModelConfig] = None,
                 n_cond_channels: int = 1, **kw):
        """cfg=None infers the architecture from the stored weight shapes."""
        from prdisagg_tpu.models.io import infer_generator_config

        params = load_params_npz(path)
        cfg = cfg or infer_generator_config(params, n_cond_channels)
        return cls(params, cfg, **kw)

    @classmethod
    def from_keras_h5(cls, path: str, cfg: Optional[ModelConfig] = None,
                      n_cond_channels: int = 1, **kw):
        """cfg=None infers the architecture from the stored weight shapes."""
        from prdisagg_tpu.models.io import infer_generator_config

        params = load_keras_generator_h5(path, cfg, n_cond_channels)
        cfg = cfg or infer_generator_config(params, n_cond_channels)
        return cls(params, cfg, **kw)

    def save_npz(self, path: str) -> None:
        save_params_npz(path, self.params)

    # -- hot reload --------------------------------------------------------------
    def load_weights_file(self, path: str):
        """Read a weight file (.h5 Keras or .npz native) into a host param
        tree for THIS generator's architecture — the load half of a hot
        reload, safe to run off the compute path (pure disk/CPU work)."""
        if path.endswith((".h5", ".hdf5")):
            return load_keras_generator_h5(path, self.cfg)
        return load_params_npz(path)

    def reload_params(self, params) -> None:
        """Swap in new weights without retracing or recompiling.

        The jitted forward is specialized to the param tree's structure,
        shapes, and dtypes — an equal-spec swap (e.g. the next training
        epoch of the same architecture) reuses every cached executable, so
        a serving daemon picks up fresh weights in milliseconds instead of
        a restart + cold compile (30 s-10 min through the tunneled TPU).
        The reference's only "reload" is rerunning the loading script
        (raindisagg_gan_pretrained.py:43-49).

        Validates structure and leaf shapes/dtypes BEFORE touching
        `self.params`: a mismatched tree raises and the generator keeps
        serving the old weights.  The swap itself is one atomic attribute
        assignment — an in-flight forward uses whichever tree it already
        grabbed, never a mix."""
        cur_leaves, cur_tree = jax.tree_util.tree_flatten(self.params)
        new_leaves, new_tree = jax.tree_util.tree_flatten(params)
        if cur_tree != new_tree:
            raise ValueError(
                f"param tree structure mismatch: serving {cur_tree}, "
                f"got {new_tree} — reload requires the same architecture")
        paths = jax.tree_util.tree_leaves_with_path(self.params)
        bad = [
            f"{jax.tree_util.keystr(kp)}: serving "
            f"{jnp.shape(cur)}/{jnp.result_type(cur)}, got "
            f"{jnp.shape(new)}/{jnp.result_type(new)}"
            for (kp, cur), new in zip(paths, new_leaves)
            if jnp.shape(cur) != jnp.shape(new)
            or jnp.result_type(cur) != jnp.result_type(new)
        ]
        if bad:
            raise ValueError("param leaf mismatch (reload requires "
                             "identical shapes/dtypes):\n  "
                             + "\n  ".join(bad))
        if self.mesh is not None:
            from prdisagg_tpu.parallel.mesh import replicate

            self.params = replicate(params, self.mesh)
        else:
            self.params = jax.device_put(params)

    # -- warmup ----------------------------------------------------------------
    def warm(self, batch_sizes=("max",)) -> float:
        """Compile (or load from the persistent cache) the jitted forward
        for the given request sizes BEFORE serving traffic.

        Each entry is ``"max"`` — the `max_batch` chunk shape, which every
        over-cap request chunks into (`predict_fractions`) —,
        ``"buckets:N"`` — every micro-batching bucket size {2^k, 1.5*2^k}
        up to N (the fused shapes `generate_scenarios_multi` pads to) —,
        or an int n, warmed at the exact device shape a size-n request
        runs (rounded up to the mesh quantum, capped at `max_batch`).
        Without this, the first request of each new shape pays the
        compile mid-request: cold remote compiles through the tunneled
        TPU run 30 s-10 min (docs/PERF.md), which a serving SLA cannot
        absorb.  Returns the total warm seconds.  Uses throwaway zero
        inputs; the generator's key chain is not consumed."""
        import time

        quantum = self.mesh.size if self.mesh is not None else 1
        sizes = []
        for b in batch_sizes:
            if b == "max":
                sizes.append(self.max_batch)
            elif isinstance(b, str) and b.startswith("buckets"):
                _, _, lim = b.partition(":")
                lim = min(int(lim) if lim else 16, self.max_batch)
                p = 1
                while p <= lim:
                    sizes.append(p)
                    if 3 * p // 2 <= lim and p > 1:
                        sizes.append(3 * p // 2)
                    p <<= 1
            else:
                sizes.append(min(int(b), self.max_batch))
        targets = [max(1, -(-n // quantum) * quantum) for n in sizes]
        t0 = time.perf_counter()
        for n in sorted(set(targets)):
            lat = jnp.zeros((n, self.cfg.latent_dim), jnp.float32)
            cnd = jnp.zeros(
                (n, self.cfg.ndomain, self.cfg.ndomain,
                 self.cfg.n_cond_channels), jnp.float32)
            out = self._device_forward(lat, cnd)
            # fetch one dependent scalar: on the tunneled platform
            # block_until_ready returns before execution finishes
            np.asarray(out[0, 0, 0, 0, 0])
        return time.perf_counter() - t0

    # -- inference ------------------------------------------------------------
    def _normalize_cond(self, cond: np.ndarray) -> np.ndarray:
        """Channel-aware conditioning normalization.

        Channel 0 is the daily precipitation sum in mm, divided by
        norm_scale (reference raindisagg_gan_pretrained.py:54); any extra
        variant channels — doy sin/cos, normalized lon index — arrive
        already in their natural ranges (exactly what the training sampler
        feeds, data/sampler.py::_extra_cond_channels) and pass through
        untouched.  Accepts any leading dims; a missing channel axis is
        added for the base 1-channel case."""
        if cond.ndim == 2 or (cond.ndim == 3
                              and self.cfg.n_cond_channels == 1
                              and cond.shape[-1] != 1):
            # (nd, nd) map or (K, nd, nd) stack of base maps
            cond = cond[..., None]
        if cond.shape[-1] != self.cfg.n_cond_channels:
            raise ValueError(
                f"cond has {cond.shape[-1]} channels where this generator "
                f"needs {self.cfg.n_cond_channels} (channel 0 = daily sums "
                f"in mm; extra channels per the variant's scheme, "
                "data/sampler.py)")
        nd = self.cfg.ndomain
        if cond.shape[-3:-1] != (nd, nd):
            # catches e.g. a (nd, nd, 3) array fed to a 1-channel generator,
            # which the heuristic above would otherwise expand into a
            # nonsense (nd, nd, 3, 1) "stack" that fails far downstream
            raise ValueError(
                f"cond shape {cond.shape} does not end in "
                f"({nd}, {nd}, {self.cfg.n_cond_channels}) — expected one "
                f"conditioning map or a (K, ...) stack of them")
        norm = cond.astype(np.float32).copy()
        norm[..., 0] /= self.norm_scale
        return norm

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _device_forward(self, lat, cnd, params=None) -> jax.Array:
        """One jitted forward; batch-sharded SPMD when a mesh is configured
        (inputs placed with a batch-axis NamedSharding — the GSPMD
        partitioner propagates it through the whole forward).  `params`
        lets chunked callers pin one weight snapshot across their chunks
        (see predict_fractions)."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            from prdisagg_tpu.parallel.mesh import batch_spec

            lat = jax.device_put(
                lat, NamedSharding(self.mesh, batch_spec(lat.ndim)))
            cnd = jax.device_put(
                cnd, NamedSharding(self.mesh, batch_spec(cnd.ndim)))
        return self._predict(self.params if params is None else params,
                             lat, cnd)

    def predict_fractions(self, latent, cond_batch) -> jax.Array:
        """Raw generator output: (B, nhours, nd, nd, 1) fractions.

        Batches above `max_batch` run as equal-shape chunks (the last chunk
        zero-padded and sliced) so one jitted program serves any request
        size without exceeding HBM; under a mesh every device batch is also
        padded to a multiple of the mesh size."""
        latent = jnp.asarray(latent)
        cond_batch = jnp.asarray(cond_batch)
        n = latent.shape[0]
        mb = self.max_batch
        quantum = self.mesh.size if self.mesh is not None else 1
        # ONE weight snapshot per request: a concurrent hot reload
        # (reload_params) swaps self.params atomically, and an over-cap
        # request chunked over max_batch must not mix weight versions
        # across its chunks
        params = self.params

        def run(lat, cnd, target):
            pad = target - lat.shape[0]
            if pad:  # keep the jitted shape; drop the padded rows after
                lat = jnp.concatenate([lat, jnp.zeros((pad, *lat.shape[1:]),
                                                      lat.dtype)])
                cnd = jnp.concatenate([cnd, jnp.zeros((pad, *cnd.shape[1:]),
                                                      cnd.dtype)])
            out = self._device_forward(lat, cnd, params)
            return out[:target - pad] if pad else out

        if n <= mb:
            return run(latent, cond_batch, -(-n // quantum) * quantum)
        outs = [run(latent[i0:i0 + mb], cond_batch[i0:i0 + mb], mb)
                for i0 in range(0, n, mb)]
        return jnp.concatenate(outs)

    def generate_scenarios(
        self, cond: np.ndarray, n_scenarios: int,
        latent: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Reference semantics (raindisagg_gan_pretrained.py:52-65).

        cond: (nd, nd) or (nd, nd, C) daily precipitation sums in mm
        (channel 0; variant generators take their extra conditioning
        channels after it).  Returns (n_scenarios, nhours, nd, nd) hourly
        precipitation in mm.
        """
        cond_norm = self._normalize_cond(np.asarray(cond, dtype=np.float32))
        if latent is None:
            latent = jax.random.normal(
                self._next_key(), (n_scenarios, self.cfg.latent_dim)
            )
        cond_batch = jnp.broadcast_to(
            jnp.asarray(cond_norm)[None], (n_scenarios, *cond_norm.shape)
        )
        fractions = np.asarray(self.predict_fractions(latent, cond_batch))
        fractions = fractions.squeeze(-1)
        # fractions -> mm/h: multiply by the (unnormalized) daily sum
        return fractions * cond_norm[..., 0][None, None] * self.norm_scale

    def generate_scenarios_batch(
        self, conds: np.ndarray, n_scenarios: int,
        latent: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Serve MANY conditions in one fused forward.

        conds: (K, nd, nd) or (K, nd, nd, C) daily precipitation sums in mm
        (channel 0; variant generators take their extra channels after it).
        Returns (K, n_scenarios, nhours, nd, nd) hourly precipitation in mm
        — row k equals ``generate_scenarios(conds[k], n_scenarios)`` up to
        the latent draw.

        The reference serves one condition per predict call at batch 1000
        (raindisagg_gan_pretrained.py:52-65); flattening K requests into one
        (K*n)-batch rides the measured batch-8000 throughput peak (~2x the
        1000-batch rate, docs/PERF.md) while `max_batch` chunking keeps HBM
        bounded for any K.
        """
        cond_norm = self._normalize_cond(
            np.asarray(conds, dtype=np.float32))   # (K, nd, nd, C)
        k = cond_norm.shape[0]
        if latent is None:
            latent = jax.random.normal(
                self._next_key(), (k * n_scenarios, self.cfg.latent_dim)
            )
        cond_batch = jnp.repeat(jnp.asarray(cond_norm), n_scenarios, axis=0)
        fractions = np.asarray(
            self.predict_fractions(latent, cond_batch)).squeeze(-1)
        fractions = fractions.reshape(k, n_scenarios, *fractions.shape[1:])
        return (fractions
                * cond_norm[..., 0][:, None, None] * self.norm_scale)

    def generate_scenarios_multi(
        self, conds: list, n_list: list,
    ) -> list:
        """Serve HETEROGENEOUS requests in one fused forward.

        conds: list of daily-sum maps, each (nd, nd) or (nd, nd, 1) in mm;
        n_list: per-request scenario counts.  Returns a list of
        (n_i, nhours, nd, nd) arrays — request i's scenarios.

        This is the device side of the serving daemon's dynamic
        micro-batching: K concurrent small requests cost one dispatch
        (~10 ms through the tunnel each if served one at a time,
        docs/PERF.md) and fill the chip's batch dimension.  One latent
        draw covers the fused batch, so each request still gets
        independent N(0,1) latents, but the exact
        values depend on how requests were batched together (unlike the
        sequential per-request key chain).

        Fused totals under `max_batch` are zero-padded up to a bucket size
        in {2^k, 1.5*2^k} (< 50% padding): arbitrary request mixes would
        otherwise each compile their own forward shape — 30 s-10 min per
        shape through the tunnel — where the bucket set is ~2 log2(
        max_batch) shapes total.  Padded rows are sliced off; per-sample
        outputs don't depend on batch-dim padding."""
        if len(conds) != len(n_list) or not conds:
            raise ValueError("conds and n_list must be equal-length and "
                             "non-empty")
        norm, counts = [], []
        for cond, n in zip(conds, n_list):
            norm.append(self._normalize_cond(
                np.asarray(cond, dtype=np.float32)))
            counts.append(int(n))
        total = sum(counts)
        target = min(_bucket(total), self.max_batch)
        # draw the latents at the padded shape directly (stays on device —
        # a host round-trip here would cost ~28 ms of tunnel RTT per fused
        # batch, most of the dispatch saving this path exists to capture)
        latent = jax.random.normal(
            self._next_key(), (max(target, total), self.cfg.latent_dim))
        cond_batch = np.repeat(np.stack(norm), counts, axis=0)
        if target > total:  # pad conds to the bucket shape; sliced below
            cond_batch = np.concatenate(
                [cond_batch, np.zeros((target - total,
                                       *cond_batch.shape[1:]),
                                      cond_batch.dtype)])
        fractions = np.asarray(self.predict_fractions(
            latent, jnp.asarray(cond_batch)))[:total].squeeze(-1)
        outs, i0 = [], 0
        for cn, n in zip(norm, counts):
            outs.append(fractions[i0:i0 + n]
                        * cn[..., 0][None, None] * self.norm_scale)
            i0 += n
        return outs

    def plot_scenarios(self, scenarios: np.ndarray,
                       hour_labels: str = "reference"):
        return plot_scenarios(scenarios, hour_labels=hour_labels)


def generate_scenarios(gen: PretrainedGenerator, cond, n_scenarios: int):
    """Free-function form of the reference API."""
    return gen.generate_scenarios(cond, n_scenarios)


def plot_scenarios(scenarios: np.ndarray, hour_labels: str = "reference"):
    """n x 24 map grid, parity with raindisagg_gan_pretrained.py:68-90.

    hour_labels="reference" (default) reproduces the reference's off-by-one
    panel indexing bug-for-bug: panel ``jplot`` shows ``scenarios[:,
    jplot-1]`` under the label ``{jplot:02d}:00``, so the column labeled
    00:00 displays hour 23 (raindisagg_gan_pretrained.py:80 uses
    ``plotidx-1`` with 1-based plotidx; documented in docs/DESIGN.md §8).
    hour_labels="aligned" shows hour ``jplot`` under label ``{jplot:02d}:00``.
    """
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import LogNorm

    if hour_labels not in ("reference", "aligned"):
        raise ValueError(f"unknown hour_labels {hour_labels!r}")
    shift = -1 if hour_labels == "reference" else 0
    scenarios = np.asarray(scenarios)
    nrows = len(scenarios)
    fig = plt.figure(figsize=(24, nrows))
    plt.axis("off")
    im = None
    for iplot in range(nrows):
        for jplot in range(24):
            ax = plt.subplot(nrows, 24, iplot * 24 + jplot + 1)
            if iplot == 0:
                ax.annotate(
                    f"{jplot:02d}:00", xy=(0.5, 1), xytext=(0, 5),
                    xycoords="axes fraction", textcoords="offset points",
                    size="large", ha="center", va="baseline",
                )
            im = plt.imshow(
                scenarios[iplot, jplot + shift, :, :],
                cmap=plt.cm.gist_earth_r, norm=LogNorm(vmin=0.01, vmax=50),
            )
            plt.axis("off")
    fig.subplots_adjust(right=0.93)
    cbar_ax = fig.add_axes([0.93, 0.15, 0.007, 0.7])
    cbar = fig.colorbar(im, cax=cbar_ax)
    cbar.set_label("fraction of daily precipitation", fontsize=16)
    cbar.ax.tick_params(labelsize=16)
    return fig
