from prdisagg_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    batch_spec,
    replicated_spec,
)

__all__ = ["make_mesh", "replicate", "batch_spec", "replicated_spec"]
