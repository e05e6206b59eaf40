"""Weight import/export.

* Native format: flat ``.npz`` of the Flax param pytree.
* Reference-compat import: reads the Keras ``.h5`` files the reference saves
  every epoch (``gen_{params}_{epoch:04d}.h5`` / ``disc_...h5``,
  gan_train_cwgangp_pixelnorm.py:520-521) into Flax pytrees.  Keras Conv3D
  kernels are (kd, kh, kw, in, out) and Dense kernels (in, out) — identical
  to flax.linen layouts, so the mapping is purely structural:

    generator: dense -> latent_proj, conv3d/_1/_2 -> conv0..2, conv3d_3 -> head
    critic:    conv3d..conv3d_3 -> conv0..3, dense -> score
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

from prdisagg_tpu.core.config import ModelConfig


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(path: str, params) -> None:
    np.savez(path, **_flatten(params))


def load_params_npz(path: str):
    import jax.numpy as jnp

    with np.load(path) as f:
        flat = {k: jnp.asarray(f[k]) for k in f.files}
    return _unflatten(flat)


# ---------------------------------------------------------------------------
# Keras .h5 import
# ---------------------------------------------------------------------------

_LAYER_RE = re.compile(r"^(dense|conv3d)(?:_(\d+))?$")


def _collect_keras_layers(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Walk an .h5 file collecting {layer_name: {kernel, bias}} for every
    dense/conv3d layer, regardless of group nesting."""
    import h5py

    layers: Dict[str, Dict[str, np.ndarray]] = {}

    def visit(name, obj):
        if not isinstance(obj, h5py.Dataset):
            return
        parts = name.split("/")
        leaf = parts[-1].split(":")[0]
        if leaf not in ("kernel", "bias"):
            return
        layer = next(
            (p for p in reversed(parts[:-1]) if _LAYER_RE.match(p)), None
        )
        if layer is None:
            return
        layers.setdefault(layer, {})[leaf] = np.asarray(obj)

    with h5py.File(path, "r") as f:
        f.visititems(visit)
    return layers


def _sorted_by_kind(layers: Dict[str, Dict[str, np.ndarray]], kind: str):
    """Keras auto-names layers kind, kind_1, kind_2, ... in creation order."""
    found: list[Tuple[int, str]] = []
    for name in layers:
        m = _LAYER_RE.match(name)
        if m and m.group(1) == kind:
            found.append((int(m.group(2) or 0), name))
    return [layers[name] for _, name in sorted(found)]


def _as_param(w):
    import jax.numpy as jnp

    return {"kernel": jnp.asarray(w["kernel"]), "bias": jnp.asarray(w["bias"])}


# ---------------------------------------------------------------------------
# Keras .h5 export (reference ecosystem contract: readme.md:73 — the published
# weights are Keras .h5; the reference writes them per epoch at
# gan_train_cwgangp_pixelnorm.py:520-521)
# ---------------------------------------------------------------------------
#
# Both reference models wrap every weighted layer in a nested
# tf.keras.Sequential named "sequential" (gan_train_cwgangp_pixelnorm.py:
# 284-305 critic, 325-352 generator), so a real TF-2.1 `model.save()` puts the
# weights at  model_weights/sequential/<layer>/<weight>:0  with the layer list
# in the `layer_names` attr and per-group `weight_names` attrs.  We emulate
# that layout with h5py directly — no TF dependency.

_KERAS_VERSION = b"2.2.4-tf"  # the keras version string TF 2.1.0 writes
_GEN_TOP_LAYERS = [b"input_1", b"input_2", b"flatten", b"concatenate",
                   b"sequential"]
_CRITIC_TOP_LAYERS = [b"input_1", b"reshape", b"lambda", b"input_2",
                      b"concatenate", b"sequential"]


def _keras_name_pairs_generator(cfg: ModelConfig):
    """[(flax param name, keras layer name), ...] in Keras creation order."""
    pairs = [("latent_proj", "dense")]
    for i in range(len(cfg.gen_channels)):
        pairs.append((f"conv{i}", "conv3d" if i == 0 else f"conv3d_{i}"))
    pairs.append(("head", f"conv3d_{len(cfg.gen_channels)}"))
    return pairs


def _keras_name_pairs_critic(cfg: ModelConfig):
    pairs = []
    for i in range(len(cfg.critic_channels)):
        pairs.append((f"conv{i}", "conv3d" if i == 0 else f"conv3d_{i}"))
    pairs.append(("score", "dense"))
    return pairs


def _write_keras_h5(path: str, params, pairs, top_layers) -> None:
    import h5py

    if "params" in params and isinstance(params["params"], dict):
        params = params["params"]

    with h5py.File(path, "w") as f:
        f.attrs["keras_version"] = _KERAS_VERSION
        f.attrs["backend"] = b"tensorflow"
        mw = f.create_group("model_weights")
        mw.attrs["layer_names"] = np.array(top_layers, dtype="S")
        mw.attrs["backend"] = b"tensorflow"
        mw.attrs["keras_version"] = _KERAS_VERSION
        for name in top_layers:
            g = mw.create_group(name.decode())
            if name != b"sequential":
                g.attrs["weight_names"] = np.array([], dtype="S1")
        seq = mw["sequential"]
        weight_names = []
        for flax_name, keras_name in pairs:
            layer = params[flax_name]
            for wname in ("kernel", "bias"):
                full = f"{keras_name}/{wname}:0"
                weight_names.append(full.encode())
                seq.create_dataset(
                    full, data=np.asarray(layer[wname], dtype=np.float32)
                )
        seq.attrs["weight_names"] = np.array(weight_names, dtype="S")


def save_keras_generator_h5(path: str, params, cfg: ModelConfig) -> None:
    """Flax Generator params -> reference-layout Keras .h5
    (round-trips through :func:`load_keras_generator_h5`)."""
    _write_keras_h5(path, params, _keras_name_pairs_generator(cfg),
                    _GEN_TOP_LAYERS)


def save_keras_critic_h5(path: str, params, cfg: ModelConfig) -> None:
    """Flax Critic params -> reference-layout Keras .h5."""
    _write_keras_h5(path, params, _keras_name_pairs_critic(cfg),
                    _CRITIC_TOP_LAYERS)


def infer_generator_config(
    params, n_cond_channels: int = 1, nhours: int = 24
) -> ModelConfig:
    """Reconstruct the ModelConfig from a generator param pytree.

    The architecture is fully determined by the weight shapes given the
    conditioning-channel count: base channels = conv0's Cin, stage widths =
    conv biases, and ndomain/latent_dim fall out of the dense kernel
    (out = base * (nhours/8) * (nd/8)^2, in = latent_dim + nd^2 * C).

    CAUTION: the conditioning-channel count itself is NOT inferable — the
    dense in-dim only constrains latent_dim + nd^2*C, so doy/lon weights
    loaded with the default n_cond_channels=1 produce a structurally valid
    but semantically wrong config (extra channels absorbed into latent_dim).
    Pass the variant's channel count explicitly for non-base conditioning."""
    p = params["params"] if "params" in params and isinstance(
        params["params"], dict) else params
    stages = sorted((k for k in p if re.fullmatch(r"conv\d+", k)),
                    key=lambda s: int(s[4:]))
    gen_channels = tuple(int(np.asarray(p[c]["bias"]).shape[0])
                         for c in stages)
    base = int(np.asarray(p["conv0"]["kernel"]).shape[-2])
    in_dim, out_dim = (int(s) for s in np.asarray(
        p["latent_proj"]["kernel"]).shape)
    gd = nhours // 8
    grid2 = out_dim // (base * gd)
    nd = 8 * int(round(grid2 ** 0.5))
    if base * gd * (nd // 8) ** 2 != out_dim:
        raise ValueError(f"cannot infer ndomain from dense out dim {out_dim}")
    latent_dim = in_dim - nd * nd * n_cond_channels
    if latent_dim <= 0:
        raise ValueError(
            f"dense in dim {in_dim} inconsistent with ndomain {nd} and "
            f"{n_cond_channels} conditioning channels")
    return ModelConfig(
        ndomain=nd, nhours=nhours, latent_dim=latent_dim,
        n_cond_channels=n_cond_channels, gen_channels=gen_channels,
        base_channels=base,
    )


def load_keras_generator_h5(path: str, cfg: Optional[ModelConfig] = None,
                            n_cond_channels: int = 1):
    """Reference generator .h5 -> Flax Generator params pytree.

    With cfg=None the architecture is inferred from the stored shapes."""
    layers = _collect_keras_layers(path)
    dense = _sorted_by_kind(layers, "dense")
    convs = _sorted_by_kind(layers, "conv3d")
    n_stages = len(convs) - 1 if cfg is None else len(cfg.gen_channels)
    if len(dense) != 1 or len(convs) != n_stages + 1:
        raise ValueError(
            f"unexpected generator layout in {path}: "
            f"{len(dense)} dense, {len(convs)} conv3d layers"
        )
    params = {"latent_proj": _as_param(dense[0])}
    for i in range(n_stages):
        params[f"conv{i}"] = _as_param(convs[i])
    params["head"] = _as_param(convs[-1])
    if cfg is None:
        cfg = infer_generator_config(params, n_cond_channels)
    _check_generator_shapes(params, cfg, path)
    return {"params": params}


def load_keras_critic_h5(path: str, cfg: ModelConfig):
    """Reference critic .h5 -> Flax Critic params pytree."""
    layers = _collect_keras_layers(path)
    dense = _sorted_by_kind(layers, "dense")
    convs = _sorted_by_kind(layers, "conv3d")
    if len(dense) != 1 or len(convs) != len(cfg.critic_channels):
        raise ValueError(
            f"unexpected critic layout in {path}: "
            f"{len(dense)} dense, {len(convs)} conv3d layers"
        )
    params = {f"conv{i}": _as_param(convs[i]) for i in range(len(convs))}
    params["score"] = _as_param(dense[0])
    return {"params": params}


def _check_generator_shapes(params, cfg: ModelConfig, path: str) -> None:
    gd, gh, gw = cfg.latent_grid
    want_in = cfg.latent_dim + cfg.ndomain * cfg.ndomain * cfg.n_cond_channels
    want_out = cfg.base_channels * gd * gh * gw
    got = params["latent_proj"]["kernel"].shape
    if got != (want_in, want_out):
        raise ValueError(
            f"{path}: dense kernel {got} does not match config "
            f"({want_in}, {want_out}) — wrong ndomain/conditioning?"
        )
