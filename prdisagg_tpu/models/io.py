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

import os
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
    # atomic: a supervisor SIGKILL mid-write must never leave a truncated
    # archive that poisons every subsequent resume/load (same rationale as
    # _write_keras_h5)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as fh:
        np.savez(fh, **_flatten(params))
    os.replace(tmp, path)


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
# weights at  model_weights/sequential/sequential/<layer>/<weight>:0  with the
# layer list in the `layer_names` attr and per-group `weight_names` attrs.  We
# emulate that layout with h5py directly — no TF dependency — and also write a
# root `model_config` JSON in the TF-2.1 (Keras 2) format so
# `tf.keras.models.load_model(path, custom_objects={'PixelNormalization': ...},
# compile=False)` reconstructs a working model, exactly how the reference
# ecosystem opens the published weights (generate_and_evaluate.py:155,
# raindisagg_gan_pretrained.py:43-45).  Verified against Keras 3's legacy
# loader (tests/test_keras_load_model.py).
#
# Two deliberate config deviations, both widening loadability with identical
# numerics (docs/DESIGN.md §8):
# * the generator's trailing debug Lambda (check_numerics — an identity on
#   finite values, gan_train_cwgangp_pixelnorm.py:349-350) is omitted: Keras
#   lambdas deserialize from marshaled Python bytecode, which is unsafe and
#   version-locked;
# * the critic's Lambda(repeat_elements, axis=1) broadcast
#   (gan_train_cwgangp_pixelnorm.py:278-279) is emitted as an equivalent
#   UpSampling3D(size=(nhours, 1, 1)) — nearest-neighbour repeat == the same
#   broadcast — KEEPING the layer name "lambda" so the weight-group layout
#   stays byte-identical to the reference's files.

_KERAS_VERSION = b"2.2.4-tf"  # the keras version string TF 2.1.0 writes
_GEN_TOP_LAYERS = [b"input_1", b"input_2", b"flatten", b"concatenate",
                   b"sequential"]
_CRITIC_TOP_LAYERS = [b"input_1", b"reshape", b"lambda", b"input_2",
                      b"concatenate", b"sequential"]


def _layer(class_name: str, name: str, inbound=None, **config):
    config = {"name": name, "trainable": True, "dtype": "float32", **config}
    out = {"name": name, "class_name": class_name, "config": config}
    if inbound is not None:
        out["inbound_nodes"] = [[[src, 0, 0, {}] for src in inbound]]
    return out


def _input_layer(name: str, shape):
    return {
        "name": name, "class_name": "InputLayer",
        "config": {"batch_input_shape": [None, *shape], "dtype": "float32",
                   "sparse": False, "name": name},
        "inbound_nodes": [],
    }


def _conv3d(name: str, filters: int, padding: str, strides=(1, 1, 1)):
    return {"class_name": "Conv3D", "config": {
        "name": name, "trainable": True, "dtype": "float32",
        "filters": filters, "kernel_size": [3, 3, 3],
        "strides": list(strides), "padding": padding,
        "data_format": "channels_last", "dilation_rate": [1, 1, 1],
        "activation": "linear", "use_bias": True}}


def _leaky(name: str, alpha: float):
    return {"class_name": "LeakyReLU", "config": {
        "name": name, "trainable": True, "dtype": "float32", "alpha": alpha}}


def _model_config_generator(cfg: ModelConfig) -> dict:
    """TF-2.1-style functional model config of the reference generator
    (gan_train_cwgangp_pixelnorm.py:312-357), parameterized by ModelConfig."""
    gd, gh, gw = cfg.latent_grid
    n_nodes = cfg.base_channels * gd * gh * gw
    seq = [
        {"class_name": "Dense", "config": {
            "name": "dense", "trainable": True, "dtype": "float32",
            "units": n_nodes, "activation": "linear", "use_bias": True}},
        _leaky("leaky_re_lu", cfg.leak),
        {"class_name": "Reshape", "config": {
            "name": "reshape_seq", "trainable": True, "dtype": "float32",
            "target_shape": [gd, gh, gw, cfg.base_channels]}},
    ]
    for i, c in enumerate(cfg.gen_channels):
        sfx = "" if i == 0 else f"_{i}"
        seq += [
            {"class_name": "UpSampling3D", "config": {
                "name": f"up_sampling3d{sfx}", "trainable": True,
                "dtype": "float32", "size": [2, 2, 2],
                "data_format": "channels_last"}},
            _conv3d(f"conv3d{sfx}", c, "same"),
            {"class_name": "PixelNormalization", "config": {
                "name": f"pixel_normalization{sfx}", "trainable": True,
                "dtype": "float32"}},
            _leaky(f"leaky_re_lu_{i + 1}", cfg.leak),
        ]
    seq += [
        _conv3d(f"conv3d_{len(cfg.gen_channels)}", 1, "same"),
        {"class_name": "Softmax", "config": {
            "name": "softmax", "trainable": True, "dtype": "float32",
            "axis": 1}},
    ]
    nd, ncc = cfg.ndomain, cfg.n_cond_channels
    return {"class_name": "Model", "config": {
        "name": "model",
        "layers": [
            _input_layer("input_1", (cfg.latent_dim,)),
            _input_layer("input_2", (nd, nd, ncc)),
            _layer("Flatten", "flatten", inbound=["input_2"],
                   data_format="channels_last"),
            _layer("Concatenate", "concatenate",
                   inbound=["input_1", "flatten"], axis=-1),
            {"name": "sequential", "class_name": "Sequential",
             "config": {"name": "sequential", "layers": seq},
             "inbound_nodes": [[["concatenate", 0, 0, {}]]]},
        ],
        "input_layers": [["input_1", 0, 0], ["input_2", 0, 0]],
        "output_layers": [["sequential", 0, 0]],
    }}


def _model_config_critic(cfg: ModelConfig) -> dict:
    """TF-2.1-style functional model config of the reference critic
    (gan_train_cwgangp_pixelnorm.py:272-309); the repeat_elements Lambda is
    emitted as an equivalent UpSampling3D named 'lambda' (module note)."""
    seq = []
    for i, c in enumerate(cfg.critic_channels):
        sfx = "" if i == 0 else f"_{i}"
        seq += [
            _conv3d(f"conv3d{sfx}", c, "valid" if i == 0 else "same",
                    strides=(2, 2, 2)),
            _leaky(f"leaky_re_lu{sfx}", cfg.leak),
            {"class_name": "Dropout", "config": {
                "name": f"dropout{sfx}", "trainable": True,
                "dtype": "float32", "rate": cfg.dropout_rate}},
        ]
    seq += [
        _layer("Flatten", "flatten_seq", data_format="channels_last"),
        {"class_name": "Dense", "config": {
            "name": "dense", "trainable": True, "dtype": "float32",
            "units": 1, "activation": "linear", "use_bias": True}},
    ]
    nd, nh, ncc = cfg.ndomain, cfg.nhours, cfg.n_cond_channels
    return {"class_name": "Model", "config": {
        "name": "model",
        "layers": [
            _input_layer("input_1", (nd, nd, ncc)),
            _layer("Reshape", "reshape", inbound=["input_1"],
                   target_shape=[1, nd, nd, ncc]),
            _layer("UpSampling3D", "lambda", inbound=["reshape"],
                   size=[nh, 1, 1], data_format="channels_last"),
            _input_layer("input_2", (nh, nd, nd, 1)),
            _layer("Concatenate", "concatenate",
                   inbound=["input_2", "lambda"], axis=-1),
            {"name": "sequential", "class_name": "Sequential",
             "config": {"name": "sequential", "layers": seq},
             "inbound_nodes": [[["concatenate", 0, 0, {}]]]},
        ],
        "input_layers": [["input_2", 0, 0], ["input_1", 0, 0]],
        "output_layers": [["sequential", 0, 0]],
    }}


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


def _write_keras_h5(path: str, params, pairs, top_layers,
                    model_config: Optional[dict] = None) -> None:
    import json

    import h5py

    if "params" in params and isinstance(params["params"], dict):
        params = params["params"]

    # Write to a sibling tmp file and os.replace into place: `cli supervise`
    # SIGKILLs the process group on a stall, and a half-written gen_*.h5
    # would crash PretrainedGenerator.from_keras_h5 on EVERY protocol
    # relaunch (stage-3 globs all exports), turning one stall into a
    # permanently stuck resume.  POSIX rename makes the export all-or-nothing.
    tmp = f"{path}.tmp-{os.getpid()}"
    with h5py.File(tmp, "w") as f:
        f.attrs["keras_version"] = _KERAS_VERSION
        f.attrs["backend"] = b"tensorflow"
        if model_config is not None:
            f.attrs["model_config"] = json.dumps(model_config).encode()
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
                # nested-model weight paths carry the inner model's name,
                # exactly like TF's own writer:
                # model_weights/sequential/sequential/<layer>/<w>:0
                full = f"sequential/{keras_name}/{wname}:0"
                weight_names.append(full.encode())
                seq.create_dataset(
                    full, data=np.asarray(layer[wname], dtype=np.float32)
                )
        seq.attrs["weight_names"] = np.array(weight_names, dtype="S")
    os.replace(tmp, path)


def save_keras_generator_h5(path: str, params, cfg: ModelConfig) -> None:
    """Flax Generator params -> reference-layout Keras .h5.

    Round-trips through :func:`load_keras_generator_h5`, and carries a full
    TF-2.1-style `model_config`, so `tf.keras.models.load_model(path,
    custom_objects={'PixelNormalization': ...}, compile=False)` works the
    same way the reference ecosystem loads the published weights
    (raindisagg_gan_pretrained.py:43-45)."""
    _write_keras_h5(path, params, _keras_name_pairs_generator(cfg),
                    _GEN_TOP_LAYERS, _model_config_generator(cfg))


def save_keras_critic_h5(path: str, params, cfg: ModelConfig) -> None:
    """Flax Critic params -> reference-layout Keras .h5 (with a loadable
    `model_config`; see :func:`save_keras_generator_h5`)."""
    _write_keras_h5(path, params, _keras_name_pairs_critic(cfg),
                    _CRITIC_TOP_LAYERS, _model_config_critic(cfg))


def infer_generator_config(
    params, n_cond_channels: int = 1, nhours: int = 24,
    compute_dtype: str = "float32",
) -> ModelConfig:
    """Reconstruct the ModelConfig from a generator param pytree.

    `compute_dtype` defaults to float32: weight-file inference serves the
    reference-parity load path (reference predicts implicit f32,
    raindisagg_gan_pretrained.py:60), not the bf16 TRAINING default —
    training callers (CLI --infer-arch) override it explicitly.

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
    default_latent = ModelConfig.__dataclass_fields__["latent_dim"].default
    if latent_dim != default_latent:
        import warnings

        warnings.warn(
            f"inferred latent_dim={latent_dim} differs from the default "
            f"{default_latent}: if these are doy/lon-variant weights, their "
            f"extra conditioning channels have been absorbed into latent_dim "
            f"— pass the variant's n_cond_channels explicitly "
            f"(got n_cond_channels={n_cond_channels})",
            stacklevel=2,
        )
    return ModelConfig(
        ndomain=nd, nhours=nhours, latent_dim=latent_dim,
        n_cond_channels=n_cond_channels, gen_channels=gen_channels,
        base_channels=base, compute_dtype=compute_dtype,
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


def _critic_spatial_dims(ndomain: int, nhours: int, n_stages: int):
    """(hour, y, x) spatial dims after the critic's conv stack: stage 0 is
    k=3 stride-2 VALID, later stages stride-2 SAME
    (gan_train_cwgangp_pixelnorm.py:286-301)."""
    dims = [nhours, ndomain, ndomain]
    for i in range(n_stages):
        if i == 0:
            dims = [(d - 3) // 2 + 1 for d in dims]
        else:
            dims = [(d + 1) // 2 for d in dims]
        if min(dims) < 1:
            return None
    return dims


def infer_critic_config(params, nhours: int = 24,
                        ndomain: Optional[int] = None,
                        compute_dtype: str = "float32") -> ModelConfig:
    """Reconstruct the ModelConfig from a critic param pytree.

    `compute_dtype` defaults to float32 for the same reason as
    :func:`infer_generator_config` — weight-file inference is the
    reference-parity path; training callers override explicitly.

    Unlike the generator (see :func:`infer_generator_config`), the critic's
    weights pin the conditioning-channel count exactly: conv0's input
    channels are 1 + n_cond_channels.  The stage widths are the conv biases.
    ndomain is recovered from the score head's input dim; because the
    stride-2 stack collapses small domains to the same spatial size, several
    ndomain values can be consistent (e.g. 8 and 16 both flatten to the same
    volume after 4 stages) — pass `ndomain` to select/validate a known
    domain; otherwise the reference default (16) wins when consistent, else
    the largest consistent candidate.
    """
    p = params["params"] if "params" in params and isinstance(
        params["params"], dict) else params
    stages = sorted((k for k in p if re.fullmatch(r"conv\d+", k)),
                    key=lambda s: int(s[4:]))
    critic_channels = tuple(int(np.asarray(p[c]["bias"]).shape[0])
                            for c in stages)
    in_ch = int(np.asarray(p["conv0"]["kernel"]).shape[-2])
    n_cond_channels = in_ch - 1
    if n_cond_channels < 1:
        raise ValueError(f"conv0 input channels {in_ch} < 2")
    score_in = int(np.asarray(p["score"]["kernel"]).shape[0])
    candidates = []
    for nd in range(8, 1025, 8):
        dims = _critic_spatial_dims(nd, nhours, len(stages))
        if dims is not None and \
                int(np.prod(dims)) * critic_channels[-1] == score_in:
            candidates.append(nd)
    if not candidates:
        raise ValueError(
            f"cannot infer ndomain: no multiple of 8 yields score in-dim "
            f"{score_in} with channels {critic_channels}")
    if ndomain is not None:
        if ndomain not in candidates:
            raise ValueError(
                f"ndomain={ndomain} inconsistent with critic weights "
                f"(score in-dim {score_in} allows {candidates})")
        nd = ndomain
    else:
        default_nd = ModelConfig.__dataclass_fields__["ndomain"].default
        nd = default_nd if default_nd in candidates else candidates[-1]
    return ModelConfig(
        ndomain=nd, nhours=nhours,
        n_cond_channels=n_cond_channels,
        critic_channels=critic_channels,
        compute_dtype=compute_dtype,
    )


def load_keras_critic_h5(path: str, cfg: Optional[ModelConfig] = None,
                         nhours: int = 24):
    """Reference critic .h5 -> Flax Critic params pytree.

    With cfg=None the architecture is inferred from the stored shapes
    (:func:`infer_critic_config`) purely to VALIDATE them — symmetric with
    the generator path, so the reference's continue-training workflow
    (gan_train_cwgangp_pixelnorm.py:520-521 reloads BOTH nets from .h5)
    needs no hand-written config.  Returns the params pytree either way; a
    provided cfg is validated against the weight shapes.
    """
    layers = _collect_keras_layers(path)
    dense = _sorted_by_kind(layers, "dense")
    convs = _sorted_by_kind(layers, "conv3d")
    n_stages = len(convs) if cfg is None else len(cfg.critic_channels)
    if len(dense) != 1 or len(convs) != n_stages:
        raise ValueError(
            f"unexpected critic layout in {path}: "
            f"{len(dense)} dense, {len(convs)} conv3d layers"
        )
    params = {f"conv{i}": _as_param(convs[i]) for i in range(len(convs))}
    params["score"] = _as_param(dense[0])
    check_cfg = cfg if cfg is not None else infer_critic_config(
        params, nhours=nhours)
    _check_critic_shapes(params, check_cfg, path)
    return {"params": params}


def _check_critic_shapes(params, cfg: ModelConfig, path: str) -> None:
    got_in = int(np.asarray(params["conv0"]["kernel"]).shape[-2])
    want_in = 1 + cfg.n_cond_channels
    if got_in != want_in:
        raise ValueError(
            f"{path}: conv0 input channels {got_in} != {want_in} "
            f"(1 sample + {cfg.n_cond_channels} conditioning)")
    dims = _critic_spatial_dims(cfg.ndomain, cfg.nhours,
                                len(cfg.critic_channels))
    want_score = None if dims is None else \
        int(np.prod(dims)) * cfg.critic_channels[-1]
    got_score = int(np.asarray(params["score"]["kernel"]).shape[0])
    if got_score != want_score:
        raise ValueError(
            f"{path}: score in-dim {got_score} does not match config "
            f"({want_score}) — wrong ndomain/channels?")


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
