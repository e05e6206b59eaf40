"""RNG implementation selection.

TPU measurement (v5e, fused step batch 32): the default threefry2x32
generator costs ~17% of step time in dropout-mask/latent generation; the
hardware-friendly `rbg` generator recovers it (49.5 -> 57.8 steps/s).
`TrainConfig.rng_impl` selects the implementation; keys are created after
this is applied so the whole program uses one generator family.
"""

from __future__ import annotations

import jax


def set_rng_impl(impl: str) -> None:
    """Set jax's default PRNG implementation ('threefry2x32' or 'rbg').

    Must run before the keys it should affect are created.  Idempotent.
    """
    current = jax.config.jax_default_prng_impl
    if current != impl:
        jax.config.update("jax_default_prng_impl", impl)
