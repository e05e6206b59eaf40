from prdisagg_tpu.core.config import (
    DataConfig,
    ModelConfig,
    TrainConfig,
    EvalConfig,
    RainFarmConfig,
    ExperimentConfig,
)

__all__ = [
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "EvalConfig",
    "RainFarmConfig",
    "ExperimentConfig",
]
