from prdisagg_tpu.api.pretrained import (
    PretrainedGenerator,
    generate_scenarios,
    plot_scenarios,
)
from prdisagg_tpu.api.server import ScenarioServer, scenarios_array

__all__ = ["PretrainedGenerator", "ScenarioServer", "generate_scenarios",
           "plot_scenarios", "scenarios_array"]
