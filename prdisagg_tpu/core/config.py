"""Typed configuration for every pipeline stage.

The reference encodes its configuration as module-level constants repeated in
every script plus a params string baked into every artifact filename
(reference: gan_train_cwgangp_pixelnorm.py:51-114).  Here the same knobs live
in frozen dataclasses, and :func:`DataConfig.params_string` reproduces the
reference filename codec exactly so artifacts stay name-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


class Conditioning:
    """Conditioning-channel variants of the model.

    BASE: condition = normalized daily sum only (1 channel).
    DOY:  + sin/cos of day-of-year (3 channels)
          (reference: revision1/additional_inputs/gan_train_cwgangp_pixelnorm_doy.py:135).
    LON:  + normalized x-index of the patch (2 channels)
          (reference: revision1/additional_inputs/gan_train_cwgangp_pixelnorm_lon.py:136).
    """

    BASE = "base"
    DOY = "doy"
    LON = "lon"

    N_CHANNELS = {BASE: 1, DOY: 3, LON: 2}


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset / patch-extraction configuration.

    Defaults replicate the reference training setup
    (reference: gan_train_cwgangp_pixelnorm.py:51-64).
    """

    startdate: str = "20090101"
    enddate: str = "20161231"
    ndomain: int = 16          # patch size in gridpoints
    stride: int = 16           # stride of the valid-box sweep
    tres: int = 1              # temporal resolution in hours
    tp_thresh_daily: float = 5.0   # mm threshold on the daily sum
    n_thresh: int = 20         # min number of gridpoints above threshold
    norm_scale: float = 127.4  # 99.9th percentile of 2010 daily sums
    conditioning: str = Conditioning.BASE
    # Epsilon guarding the hourly/daily-sum division.  The reference divides
    # unguarded (gan_train_cwgangp_pixelnorm.py:162-163) and survives only
    # because valid radar patches are never exactly dry; we make the guard
    # explicit so synthetic/edge data cannot produce NaN fractions.
    frac_eps: float = 1e-12

    @property
    def nhours(self) -> int:
        return 24 // self.tres

    @property
    def n_cond_channels(self) -> int:
        return Conditioning.N_CHANNELS[self.conditioning]

    def params_string(self) -> str:
        """Reference filename codec (gan_train_cwgangp_pixelnorm.py:113)."""
        tp = self.tp_thresh_daily
        tp_str = str(int(tp)) if float(tp).is_integer() else str(tp)
        return (
            f"{self.startdate}-{self.enddate}-tp_thresh_daily{tp_str}"
            f"_n_thresh{self.n_thresh}_ndomain{self.ndomain}_stride{self.stride}"
        )

    def data_filename(self) -> str:
        """Reformatted-tensor filename (reformat_data.py:91)."""
        return f"{self.startdate}-{self.enddate}_tres{self.tres}.npy"

    def indices_filename(self) -> str:
        """Valid-index pickle filename (compute_valid_indices.py:99)."""
        return f"valid_indices_smhi_radar_{self.params_string()}.pkl"

    def doy_filename(self) -> str:
        """Day-of-year sidecar filename (reformat_data_make_timelist.py:62)."""
        return f"{self.startdate}-{self.enddate}_tres{self.tres}_doy.npy"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Generator / critic architecture.

    Defaults replicate the reference networks
    (generator: gan_train_cwgangp_pixelnorm.py:312-357,
    critic: gan_train_cwgangp_pixelnorm.py:272-309).  The generator's initial
    latent grid scales with ndomain//8 which subsumes the large-domain variant
    (alternative_domains/gan_train_cwgangp_pixelnorm_largedomain.py:323-335).
    """

    ndomain: int = 16
    nhours: int = 24
    latent_dim: int = 100
    n_cond_channels: int = 1
    gen_channels: Tuple[int, ...] = (256, 128, 64)
    base_channels: int = 256        # channels of the initial latent grid
    critic_channels: Tuple[int, ...] = (64, 128, 256, 256)
    leak: float = 0.2
    dropout_rate: float = 0.25
    init_stddev: float = 0.02
    # Numerical policy: parameters and the conservation softmax ALWAYS stay
    # float32; conv/matmul inputs run in the compute dtype on the MXU.
    # bfloat16 is the default training protocol (+28% step rate on v5e;
    # quality proven at the full 50-epoch protocol: conservation exact,
    # daily-cycle corr 0.985 — docs/PERF.md round 2, artifacts/
    # bf16_50epoch_quality.txt).  Use "float32" (CLI: --f32-parity) for
    # strict reference-protocol runs — the reference trains implicit f32
    # (gan_train_cwgangp_pixelnorm.py:384-392).
    compute_dtype: str = "bfloat16"
    # True: pixel_norm on a full-f32 tensor (strict round-1 policy).
    # False: f32 accumulation only, activations stay in compute_dtype —
    # removes two full-tensor casts per generator stage (bf16 throughput).
    pixelnorm_f32: bool = True
    # Fold nearest-upsample+Conv3D into 8 low-res phase convs (bit-exact,
    # 3.375x fewer MACs; ops/fused_upsample_conv.py).  Same param layout.
    fused_upsample: bool = True
    # Spatial (context-parallel analogue) sharding: name of a mesh axis to
    # shard the y spatial dimension of conv activations over — the XLA
    # partitioner inserts halo exchanges over ICI.  The extension point for
    # domains far beyond 64x64 (SURVEY §5 long-context row); apply the model
    # inside `jax.sharding.set_mesh(mesh)`.  None = replicated (default).
    spatial_axis: Optional[str] = None

    def __post_init__(self):
        if self.ndomain % 8 != 0:
            raise ValueError("ndomain must be a multiple of 8 "
                             "(generator upsamples 3x by factor 2)")
        if self.nhours % 8 != 0:
            raise ValueError("nhours must be a multiple of 8")

    @property
    def latent_grid(self) -> Tuple[int, int, int]:
        """Shape of the generator's initial (hours, y, x) latent grid."""
        return (self.nhours // 8, self.ndomain // 8, self.ndomain // 8)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """cWGAN-GP optimization settings.

    Defaults replicate the reference (Adam(1e-4, 0, 0.9) per WGAN-GP paper,
    n_disc=5, GP weight 10, schedule ((50, 32),);
    gan_train_cwgangp_pixelnorm.py:67-74,384-392).
    """

    n_disc: int = 5
    gp_weight: float = 10.0
    learning_rate: float = 1e-4
    beta1: float = 0.0
    beta2: float = 0.9
    # ((n_epochs, batch_size), ...) increasing-batch-size schedule
    schedule: Tuple[Tuple[int, int], ...] = ((50, 32),)
    seed: int = 0
    # 'rbg' is ~17% faster per fused step on TPU v5e than the default
    # 'threefry2x32' (dropout-mask + latent generation cost); see utils/rng.py
    rng_impl: str = "rbg"
    # Pallas DMA patch gather inside the train step: True / False / None=auto.
    # Measured on v5e: slightly slower than the XLA gather for the 6 small
    # per-step gathers on small tensors, 2.7x faster for bulk gathers, and
    # REQUIRED for multi-GB HBM datasets — XLA materializes a copy of the
    # data operand per gather site (6x => OOM at 2.8 GB data; the Pallas DMA
    # reads in place, 63 steps/s).  Auto picks Pallas when the device tensor
    # exceeds 256 MB.
    pallas_gather: Optional[bool] = None
    # Memory lever for big domains: split the hoisted (n_disc*B) generator
    # forward into this many sequential chunks (lax.map).  Identical
    # outputs modulo fp summation order; peak HLO-temp scales ~1/chunks.
    # At 64x64 the one-shot f32 b64 forward alone overflows HBM
    # (docs/PERF.md 64x64 lever table) — chunks=n_disc restores B-sized
    # forwards without giving up the hoisting structure.  1 = off.
    hoisted_chunks: int = 1
    # Schedule-friendly alternative: cap the per-chunk SAMPLE count
    # instead of fixing the chunk count, so a batch schedule like
    # ((4,32),(4,128)) runs its b32 stage one-shot and its b128 stage
    # chunked from ONE config (each stage's chunk count is the smallest
    # divisor of n_disc*batch keeping chunks <= this many samples).
    # None = off; ignored when hoisted_chunks > 1 is set explicitly.
    hoisted_chunk_samples: Optional[int] = None
    # Orbax full-state checkpoint cadence.  Every-epoch Orbax + dual-format
    # exports dragged sustained throughput to ~30 steps/s on a 1-core host
    # (docs/PERF.md round 2) — the reference only writes .h5 weights per
    # epoch (gan_train_cwgangp_pixelnorm.py:520-521); 10 keeps exact-resume
    # granularity without self-harming the loop.
    checkpoint_every_epochs: int = 10
    log_every_steps: int = 50
    # data-parallel mesh size; None = use all local devices
    n_data_devices: Optional[int] = None
    # Exponential moving average of the generator params, updated once per
    # fused step; 0.0 = off (the reference protocol).  The reference's
    # quality wanders after its peak epoch and is handled by picking an
    # epoch by eye (generate_and_evaluate.py:49-52); an EMA generator
    # (Karras et al. 2018 progressive-GAN practice) smooths that wander.
    # When on, per-epoch exports include gen_ema_*.h5 alongside the live
    # weights and evaluation can select either.
    ema_decay: float = 0.0

    @property
    def total_epochs(self) -> int:
        return sum(n for n, _ in self.schedule)


def parse_schedule(spec: str) -> Tuple[Tuple[int, int], ...]:
    """Parse an increasing-batch-size schedule string
    "EPOCHS:BATCH[,EPOCHS:BATCH...]" (e.g. "20:32,30:128") into the
    TrainConfig.schedule tuple (reference schedule semantics:
    gan_train_cwgangp_pixelnorm.py:73-74,526-529)."""
    try:
        out = tuple(
            (int(e), int(b))
            for e, b in (stage.split(":") for stage in spec.split(","))
        )
    except ValueError as err:
        raise ValueError(
            f"bad schedule {spec!r}; expected EPOCHS:BATCH[,EPOCHS:BATCH...]"
        ) from err
    if not out or any(e <= 0 or b <= 0 for e, b in out):
        raise ValueError(f"bad schedule {spec!r}: epochs/batch must be >= 1")
    return out


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation-suite settings (generate_and_evaluate.py:30-57,
    generate_and_evaluate_crps.py:161-162)."""

    seed: int = 354
    epoch: int = 20
    eval_startdate: str = "20170101"
    eval_enddate: str = "20181231"
    n_map_conditions: int = 20
    n_fake_per_real: int = 10
    n_stat_samples: int = 10_000
    n_line_free_noise: int = 100
    n_line_shared_noise: int = 10
    n_ks_members: int = 1000
    n_ks_conditions: int = 20
    n_crps_samples: int = 10_000
    n_crps_members: int = 1000
    n_lsd_samples: int = 1000
    plot_format: str = "png"
    # colormap of the 0..1 fraction panels in the map grids: the base eval
    # uses Greys (generate_and_evaluate.py:243), the large-domain variant
    # magma_r (generate_and_evaluate_largedomain.py:237)
    fraction_cmap: str = "Greys"


@dataclasses.dataclass(frozen=True)
class RainFarmConfig:
    """RainFARM baseline settings (rainfarm/rainfarm_calibrate.py:18,67-69)."""

    seed: int = 334
    n_calib: int = 5000
    n_repeat: int = 10
    ds_t_factor: int = 24


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """Bundle of all stage configs for one experiment."""

    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    rainfarm: RainFarmConfig = dataclasses.field(default_factory=RainFarmConfig)
    name: str = "wgancp_pixelnorm"
    # set to override the derived architecture (e.g. shrunken test models)
    model_override: Optional[ModelConfig] = None
    # None = ModelConfig default (bfloat16); "float32" = strict reference
    # precision (CLI --f32-parity)
    compute_dtype: Optional[str] = None

    def model(self) -> ModelConfig:
        if self.model_override is not None:
            return self.model_override
        kw = {} if self.compute_dtype is None else {
            "compute_dtype": self.compute_dtype}
        return ModelConfig(
            ndomain=self.data.ndomain,
            nhours=self.data.nhours,
            n_cond_channels=self.data.n_cond_channels,
            **kw,
        )


def production_train_config(**overrides) -> TrainConfig:
    """Measured-production training defaults.

    The plain `TrainConfig()` replicates the reference protocol exactly
    (flat ((50, 32)) schedule, no EMA) for parity runs.  This preset turns
    on everything that measured strictly better at protocol scale on the
    chip (docs/PERF.md rounds 3-4):

    * the reference's own (commented-out) increasing-batch-size schedule
      ((20, 32), (30, 128)) — 1.8x the sample-update throughput tail AND
      better daily-cycle correlation (0.9967 vs 0.9851 flat) at equal
      sample-update budgets (gan_train_cwgangp_pixelnorm.py:73-74);
    * ema_decay=0.999 — the EMA-selected checkpoint beat the raw pick on
      EVERY battery metric (CRPS 0.836 vs 1.073, LSD gen-real 6.36 vs
      7.47, corr 0.9965 vs 0.9843) and its quality curve stays flat over
      50 epochs where the raw curve collapses — replacing the reference's
      pick-an-early-epoch-by-eye workaround
      (generate_and_evaluate.py:49-52).

    Any keyword overrides win (e.g. seed=...).
    """
    kw: dict = dict(schedule=((20, 32), (30, 128)), ema_decay=0.999)
    kw.update(overrides)
    return TrainConfig(**kw)


def smoke_model_config(ndomain: int = 16, n_cond_channels: int = 1,
                       compute_dtype: Optional[str] = None) -> ModelConfig:
    """Shrunken architecture for smoke tests and pipeline rehearsals
    (cli train --model-preset tiny).  NOT a benchmark or parity config —
    it exists so end-to-end file-contract drills don't pay flagship-width
    compute on CPU."""
    kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
    return ModelConfig(
        ndomain=ndomain, n_cond_channels=n_cond_channels,
        latent_dim=8, gen_channels=(8, 8, 8), base_channels=8,
        critic_channels=(8, 8, 8, 8), **kw)


def large_domain_experiment() -> ExperimentConfig:
    """The 64x64 large-domain variant
    (alternative_domains/gan_train_cwgangp_pixelnorm_largedomain.py:59,65)."""
    return ExperimentConfig(
        data=DataConfig(ndomain=64, n_thresh=40),
        # evaluated at epoch 8 with 15 fakes per real and the magma_r
        # fraction colormap (generate_and_evaluate_largedomain.py:51,205,237)
        eval=EvalConfig(epoch=8, n_fake_per_real=15, fraction_cmap="magma_r"),
        name="wgancp_pixelnorm_largedomain",
    )


def doy_experiment() -> ExperimentConfig:
    """Day-of-year conditioning variant (revision1/additional_inputs)."""
    return ExperimentConfig(
        data=DataConfig(conditioning=Conditioning.DOY),
        name="wgancp_pixelnorm_doy",
    )


def lon_experiment() -> ExperimentConfig:
    """Longitude conditioning variant (revision1/additional_inputs)."""
    return ExperimentConfig(
        data=DataConfig(conditioning=Conditioning.LON),
        name="wgancp_pixelnorm_lon",
    )
