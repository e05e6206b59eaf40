from prdisagg_tpu.baselines.rainfarm.core import (
    estimate_alpha,
    estimate_beta,
    downscale_spatiotemporal,
    downscale_ensemble,
)

__all__ = [
    "estimate_alpha",
    "estimate_beta",
    "downscale_spatiotemporal",
    "downscale_ensemble",
]
