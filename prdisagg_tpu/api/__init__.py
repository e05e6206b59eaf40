from prdisagg_tpu.api.pretrained import (
    PretrainedGenerator,
    generate_scenarios,
    plot_scenarios,
)
from prdisagg_tpu.api.server import ScenarioServer

__all__ = ["PretrainedGenerator", "ScenarioServer", "generate_scenarios",
           "plot_scenarios"]
