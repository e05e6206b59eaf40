from prdisagg_tpu.ops.core import (
    pixel_norm,
    pixel_norm_mixed,
    hour_softmax,
    upsample3d_nearest,
    leaky_relu,
    spatial_constraint,
    fractions_and_condition,
)

__all__ = [
    "pixel_norm",
    "pixel_norm_mixed",
    "hour_softmax",
    "upsample3d_nearest",
    "leaky_relu",
    "spatial_constraint",
    "fractions_and_condition",
]
