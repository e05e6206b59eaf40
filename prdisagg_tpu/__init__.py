"""prdisagg_tpu — a TPU-native (JAX/XLA/pjit/Flax) framework for stochastic
temporal disaggregation of precipitation with conditional WGAN-GP.

Re-designed from scratch with the capabilities of `sipposip/pr-disagg-radar-gan`
(reference mounted at /root/reference), but built TPU-first:

* the generator / critic are Flax modules compiled by XLA:TPU,
* the full cWGAN-GP inner loop (n_disc critic updates + 1 generator update,
  including the second-order gradient-penalty autodiff) fuses into ONE jitted
  train step,
* the patch sampler is an on-device gather from an HBM-resident radar tensor
  (no host input pipeline at all),
* data parallelism runs over a `jax.sharding.Mesh` with XLA-inserted
  collectives over ICI.

Subpackages
-----------
core       typed configs + params-string codec (reference filename parity)
ops        pure compute ops (pixelnorm, hour-softmax, upsampling, statistics)
models     Flax Generator / Critic + weight import/export
data       ingest pipeline, valid-index scan, HBM device sampler, synthetic fixtures
train      fused WGAN-GP train step, training loop, checkpointing, metrics
parallel   device meshes and sharding policies
api        pretrained-generator inference API (generate_scenarios / plot_scenarios)
eval       evaluation suite (map grids, ECDF, daily cycle, KS, CRPS, LSD)
baselines  RainFARM stochastic-downscaling baseline (JAX FFT)
utils      plotting and misc helpers
"""

__version__ = "0.1.0"
