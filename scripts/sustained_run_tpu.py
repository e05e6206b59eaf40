"""Sustained-throughput evidence run (VERDICT round-2 item 3).

30 epochs x 400 fused steps, flagship model, f32, batch 32, WITH the full
reference per-epoch artifact cadence — 30-sample plot grid + loss curve +
hist.csv + generator/critic .h5 weight exports every epoch
(gan_train_cwgangp_pixelnorm.py:494-521) — now written by the async artifact
worker while the device trains.  Round-1 did this host work synchronously and
sustained 28.6 steps/s vs ~71 in-loop; target here is >=55 sustained.

Usage: python scripts/sustained_run_tpu.py [epochs] [steps_per_epoch]
Writes a log summary to artifacts/sustained_r2.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/prdisagg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from prdisagg_tpu.core.config import (
        DataConfig, ExperimentConfig, TrainConfig,
    )
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset
    from prdisagg_tpu.train.loop import Trainer

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spe = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    workdir = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "sustained_r2")
    os.makedirs(workdir, exist_ok=True)

    data, indices, dcfg = make_synthetic_dataset(n_days=64, ny=128, nx=128,
                                                 seed=0)
    print(f"dataset {data.shape}, {len(indices)} patches", flush=True)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)

    exp = ExperimentConfig(
        data=dcfg,
        train=TrainConfig(schedule=((epochs, 32),), seed=0,
                          log_every_steps=50,
                          checkpoint_every_epochs=10),
        name="sustained_r2",
    )
    marks = {}

    def on_epoch_end(trainer):
        # the timed window starts AFTER epoch 1 (which pays the one-off jit
        # compile); epoch-1 artifacts are drained first so the window
        # carries exactly epochs 2..N of artifact I/O plus the final flush
        if trainer.epoch == 1 and "t1" not in marks:
            trainer.flush_artifacts()
            marks["t1"] = time.perf_counter()

    tr = Trainer(
        exp, ds, workdir=workdir, steps_per_epoch=spe,
        plot_every_epochs=1,            # reference cadence
        export_weights_every_epochs=1,  # reference cadence
        export_format="h5",             # what the reference writes
        async_artifacts=True,
        on_epoch_end=on_epoch_end,
    )
    t0 = time.perf_counter()
    tr.fit(progress=True)  # flushes all artifact writes before returning
    t_end = time.perf_counter()
    wall = t_end - marks["t1"]
    total_steps = (epochs - 1) * spe
    sustained = total_steps / wall
    msg = (f"SUSTAINED r2: epochs 2..{epochs} x {spe} steps f32 b32, full "
           f"reference artifact cadence (plots + .h5 weights every epoch, "
           f"async writer, final flush included): {wall:.1f}s wall -> "
           f"{sustained:.1f} fused steps/s sustained "
           f"(round-1 synchronous: 28.6; compile+epoch1 excluded: "
           f"{t_end - t0 - wall:.1f}s)")
    print(msg, flush=True)
    with open(os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "sustained_r2.txt"), "w") as f:
        f.write(msg + "\n")
        f.write(f"hist tail d_loss={tr.hist['d_loss'][-1]:.4f} "
                f"g_loss={tr.hist['g_loss'][-1]:.4f}\n")


if __name__ == "__main__":
    main()
