from prdisagg_tpu.api.pretrained import (
    PretrainedGenerator,
    generate_scenarios,
    plot_scenarios,
)

__all__ = ["PretrainedGenerator", "generate_scenarios", "plot_scenarios"]
