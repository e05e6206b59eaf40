"""Sustained-throughput evidence run, round 3 (VERDICT item 3).

Measures the OUT-OF-THE-BOX sustained rate: flagship model at the round-3
defaults — bfloat16 compute, per-epoch .h5-only weight exports +
sample-grid/loss plots (the reference's exact cadence,
gan_train_cwgangp_pixelnorm.py:494-521), Orbax full-state checkpoint every
10 epochs — with the async artifact worker.  Round-2 defaults (f32, .h5+.npz
+Orbax every epoch) sustained 60.4 steps/s vs 72.5 in-loop (83%); target
here is >=90% of the 96 steps/s bf16 peak, i.e. >=85 sustained.

Usage: python scripts/sustained_run_r3.py [epochs=30] [steps_per_epoch=400]
Writes artifacts/sustained_r3.txt.
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

    from prdisagg_tpu.core.config import ExperimentConfig, TrainConfig
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset
    from prdisagg_tpu.train.loop import Trainer

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spe = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    workdir = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "sustained_r3")
    os.makedirs(workdir, exist_ok=True)

    data, indices, dcfg = make_synthetic_dataset(n_days=64, ny=128, nx=128,
                                                 seed=0)
    print(f"dataset {data.shape}, {len(indices)} patches", flush=True)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)

    # ALL defaults: bf16 model, checkpoint_every_epochs=10, export h5-only
    exp = ExperimentConfig(
        data=dcfg,
        train=TrainConfig(schedule=((epochs, 32),), seed=0,
                          log_every_steps=50),
        name="sustained_r3",
    )
    assert exp.model().compute_dtype == "bfloat16"
    assert exp.train.checkpoint_every_epochs == 10
    marks = {}

    def on_epoch_end(trainer):
        # timed window starts AFTER epoch 1 (pays the one-off jit compile);
        # epoch-1 artifacts drain first so the window carries exactly epochs
        # 2..N of artifact I/O plus the final flush
        if trainer.epoch == 1 and "t1" not in marks:
            trainer.flush_artifacts()
            marks["t1"] = time.perf_counter()

    tr = Trainer(exp, ds, workdir=workdir, steps_per_epoch=spe,
                 on_epoch_end=on_epoch_end)
    t0 = time.perf_counter()
    tr.fit(progress=True)  # flushes all artifact writes before returning
    t_end = time.perf_counter()
    wall = t_end - marks["t1"]
    total_steps = (epochs - 1) * spe
    sustained = total_steps / wall
    msg = (f"SUSTAINED r3 (defaults: bf16, .h5-only exports + plots every "
           f"epoch, Orbax every 10): epochs 2..{epochs} x {spe} steps b32: "
           f"{wall:.1f}s wall -> {sustained:.1f} fused steps/s sustained "
           f"(r2 defaults: 60.4; compile+epoch1 excluded: "
           f"{t_end - t0 - wall:.1f}s)")
    print(msg, flush=True)
    with open(os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "sustained_r3.txt"), "w") as f:
        f.write(msg + "\n")
        f.write(f"hist tail d_loss={tr.hist['d_loss'][-1]:.4f} "
                f"g_loss={tr.hist['g_loss'][-1]:.4f}\n")


if __name__ == "__main__":
    main()
