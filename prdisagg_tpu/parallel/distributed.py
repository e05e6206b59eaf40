"""Multi-host (DCN) initialization — the scale-out path beyond one slice.

SURVEY.md §2.2: DP spans ICI first, DCN second.  A single v4/v5 slice is far
more than this model needs, so multi-host is a thin, optional layer: call
`initialize_multihost()` once per process before any jax usage, then build
meshes over `jax.devices()` exactly as on one host — `parallel.make_mesh`
returns the global mesh and pjit handles cross-host collectives.
"""

from __future__ import annotations

from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.

    Returns True if distributed mode was initialized, False when running
    single-process (the no-op common case).  Arguments default to the
    standard cluster-environment auto-detection.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (ValueError, RuntimeError):
        # no cluster environment detected -> single process
        return False


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0
