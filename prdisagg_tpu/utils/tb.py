"""Optional TensorBoard sink for training metrics.

The reference's observability is print-to-stdout plus a hand-rolled
hist.csv (gan_train_cwgangp_pixelnorm.py:484-491,508-517); SURVEY.md §5
names "CSV + optional TensorBoard" as the TPU-native metrics plan.
hist.csv stays the always-on source of truth (written every epoch by the
Trainer's background writer); this module adds live-scalars streaming for
anyone running `tensorboard --logdir` against a training workdir.

Strictly opt-in and lazily imported: constructing `MetricsTB` is the only
place the tensorboard package is touched, so the dependency stays out of
every default code path (the environment bakes it in via torch, but the
library must not require it).
"""

from __future__ import annotations


class MetricsTB:
    """Append scalar metrics to a TensorBoard event file.

    `add_scalar` is buffered host work (microseconds per value); the
    Trainer calls `log` once per fused-step CHUNK — the same cadence as
    its hist rows — so the training dispatch thread is never starved the
    way per-epoch matplotlib was (docs/PERF.md).
    """

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
        except Exception as err:  # pragma: no cover - env without tensorboard
            raise RuntimeError(
                "TensorBoard logging needs the `tensorboard` package "
                "(torch.utils.tensorboard); install it or drop the "
                "tensorboard_dir / --tensorboard option"
            ) from err
        self._writer = SummaryWriter(logdir)

    def log(self, metrics: dict, step: int, prefix: str = "train") -> None:
        for k, v in metrics.items():
            self._writer.add_scalar(f"{prefix}/{k}", float(v), step)

    def flush(self) -> None:
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()
