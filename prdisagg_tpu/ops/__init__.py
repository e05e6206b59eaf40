from prdisagg_tpu.ops.core import (
    pixel_norm,
    hour_softmax,
    upsample3d_nearest,
    leaky_relu,
    fractions_and_condition,
)

__all__ = [
    "pixel_norm",
    "hour_softmax",
    "upsample3d_nearest",
    "leaky_relu",
    "fractions_and_condition",
]
