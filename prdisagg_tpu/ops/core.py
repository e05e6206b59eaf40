"""Pure compute ops shared by models, sampler and evaluation.

Everything here is shape-polymorphic, jit-safe, and written against the VPU/MXU
cost model: elementwise chains XLA fuses for free, reductions stay on the hour
axis (small, static), and nothing introduces data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HOUR_AXIS = 1  # layout is (batch, hour, y, x, channel) throughout the framework


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


def pixel_norm(x: jax.Array, eps: float = 1.0e-8) -> jax.Array:
    """Pixelwise feature-vector normalization (ProGAN-style).

    x / sqrt(mean(x^2, channel_axis) + eps) — behavioural parity with the
    reference's PixelNormalization layer
    (gan_train_cwgangp_pixelnorm.py:249-270), computed with rsqrt so XLA emits
    a single fused VPU chain instead of sqrt+divide.
    """
    mean_sq = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(mean_sq + eps)


def pixel_norm_mixed(x: jax.Array, eps: float = 1.0e-8) -> jax.Array:
    """pixel_norm with f32 accumulation but no full-tensor f32 round-trip.

    For bf16 activation stacks: the mean-of-squares reduction and rsqrt run
    in float32 (accuracy of the statistic), while the normalized product
    stays in the input dtype — avoiding the two full-tensor casts per stage
    that the strict-f32 path pays (measured on v5e, see docs/PERF.md).
    Identical to :func:`pixel_norm` for float32 inputs.
    """
    mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
    return x * jax.lax.rsqrt(mean_sq + eps).astype(x.dtype)


def hour_softmax(x: jax.Array, axis: int = HOUR_AXIS) -> jax.Array:
    """Softmax over the hour axis: per-gridpoint fractions of the daily sum.

    This is the conservation mechanism — fractions at each gridpoint sum to
    exactly 1 over the 24 hours, so generated hourly fields always re-sum to
    the conditioning daily total (reference:
    gan_train_cwgangp_pixelnorm.py:346-347).  Computed in float32 regardless
    of input dtype so bf16 conv stacks cannot break conservation.
    """
    out = jax.nn.softmax(x.astype(jnp.float32), axis=axis)
    return out


def upsample3d_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbour x`factor` upsampling of the (hour, y, x) volume.

    Equivalent to Keras UpSampling3D(size=(2,2,2))
    (gan_train_cwgangp_pixelnorm.py:330).  Implemented as reshape+broadcast —
    XLA lowers this to a pure layout change feeding the following conv, with
    no gather.
    """
    b, d, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :, None, :],
        (b, d, factor, h, factor, w, factor, c),
    )
    return x.reshape(b, d * factor, h * factor, w * factor, c)


def spatial_constraint(x: jax.Array, axis: "str | None",
                       y_dim: int = 2) -> jax.Array:
    """Constrain a (..., y, x, C) activation to be sharded along `axis` on
    its y dimension (halo exchanges are inserted by the XLA partitioner for
    the surrounding convs).  No-op when axis is None or y is too small to
    shard.  Must run under `jax.sharding.set_mesh(mesh)`."""
    if axis is None:
        return x
    from jax.sharding import PartitionSpec as P

    # honor the "too small to shard" promise: late critic stages shrink y to
    # a few pixels; constraining them to an over-sharded spec would force XLA
    # into degenerate halo exchanges.  The ambient mesh (set_mesh/use_mesh)
    # carries the axis size at trace time.
    mesh = jax.sharding.get_abstract_mesh()
    if axis in getattr(mesh, "shape", {}) and x.shape[y_dim] < mesh.shape[axis]:
        return x
    spec = [None] * x.ndim
    spec[y_dim] = axis
    return jax.lax.with_sharding_constraint(x, P(*spec))


def fractions_and_condition(
    patches: jax.Array,
    norm_scale: float,
    eps: float = 1e-12,
) -> tuple[jax.Array, jax.Array]:
    """Convert hourly mm patches into (fractions, normalized daily sum).

    patches: (..., nhours, ny, nx, 1) hourly precipitation in mm.
    Returns (fractions in [0,1] summing to ~1 over hours, cond / norm_scale)
    mirroring the reference's last preprocessing step
    (gan_train_cwgangp_pixelnorm.py:159-166), with an explicit epsilon guard
    for all-dry gridpoints (the reference divides unguarded).
    """
    cond = jnp.sum(patches, axis=-4)  # sum over hour axis -> (..., ny, nx, 1)
    frac = patches / jnp.maximum(cond[..., None, :, :, :], eps)
    return frac, cond / norm_scale
