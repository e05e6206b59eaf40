"""Large-domain (64x64) variant end-to-end ON CHIP — the abbreviated
reference protocol, not just a step-rate anchor.

The reference's alternative_domains experiment trains the 64x64 /
n_thresh=40 configuration and evaluates it at epoch 8 with 15 fakes per
real and the magma_r fraction colormap
(alternative_domains/gan_train_cwgangp_pixelnorm_largedomain.py:59,65,
generate_and_evaluate_largedomain.py:50-51,205,237).  This script runs that
loop: train 8 epochs at flagship width, then produce the eval-preset
artifacts (map grids, sample statistics + ECDF/daily-cycle plots) from the
epoch-8 export, plus the held-out daily-cycle correlation.

Usage: python scripts/large_domain_tpu.py [n_days=300] [epochs=8]
                                           [batch=32] [chunks=1]
batch/chunks override the schedule batch size and TrainConfig.hoisted_chunks
(round-5 lever: bf16 b128 chunks=5 is the measured 64x64 throughput point,
docs/PERF.md).  Writes artifacts/large_domain_tpu.txt and the artifact tree
under artifacts/large_domain_e2e/ (or $LD_WORKDIR).
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")


def main():
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/prdisagg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from prdisagg_tpu.api import PretrainedGenerator
    from prdisagg_tpu.core.config import TrainConfig, large_domain_experiment
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.eval import Evaluator, daily_cycle_correlation
    from prdisagg_tpu.train.loop import Trainer
    from scripts.full_protocol_scale_run import make_scale_dataset

    n_days = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch_arg = sys.argv[3] if len(sys.argv) > 3 else "32"
    chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    tkw = dict(seed=0, log_every_steps=50)
    if ":" in batch_arg:
        # batch SCHEDULE, e.g. "4:32,4:128"; the chunks arg then means
        # hoisted_chunk_samples (per-stage auto chunking)
        from prdisagg_tpu.core.config import parse_schedule

        schedule = parse_schedule(batch_arg)
        epochs = sum(e for e, _ in schedule)
        batch = schedule[-1][1]
        tkw.update(schedule=schedule,
                   hoisted_chunk_samples=chunks if chunks > 1 else None)
    else:
        batch = int(batch_arg)
        tkw.update(schedule=((epochs, batch),), hoisted_chunks=chunks)
    # at b128 the async per-epoch .h5 export fetch overlaps the step's
    # (higher) peak HLO temp and ResourceExhausts the chip (measured) —
    # big-batch runs export on the final epoch only
    export_every = int(sys.argv[5]) if len(sys.argv) > 5 else \
        (1 if batch <= 64 else epochs)

    exp = large_domain_experiment()
    exp = dataclasses.replace(exp, train=TrainConfig(**tkw))
    dcfg = exp.data

    workdir = os.environ.get(
        "LD_WORKDIR", os.path.join(REPO, "artifacts", "large_domain_e2e"))
    os.makedirs(workdir, exist_ok=True)
    lines = []

    def emit(s):
        print(s, flush=True)
        lines.append(s)

    data, indices = make_scale_dataset(n_days, 128, 128, 17, dcfg)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    n_train = len(indices)
    del data
    eval_data, eval_idx = make_scale_dataset(80, 128, 128, 19, dcfg)
    ds_eval = DeviceDataset.from_numpy(eval_data, eval_idx, dcfg)
    del eval_data
    emit(f"[data] {n_train} train / {len(eval_idx)} held-out 64x64 patches "
         f"(n_thresh=40)")

    marks = {}

    def on_epoch_end(tr):
        if tr.epoch == 1 and "t1" not in marks:
            marks["t1"] = time.perf_counter()

    tr = Trainer(exp, ds, workdir=workdir, on_epoch_end=on_epoch_end,
                 plot_every_epochs=0,
                 export_weights_every_epochs=export_every)
    resumed = tr.maybe_resume()
    if resumed:
        # a supervise/wedge relaunch continues instead of retraining; the
        # steady-rate anchor is then void (partial run), marked nan
        print(f"[resume] at epoch {tr.epoch}", flush=True)
        marks["t1"] = time.perf_counter()
    t0 = time.perf_counter()
    tr.fit(progress=True)
    t_end = time.perf_counter()
    # steady rate must count the steps each STAGE actually ran (a schedule
    # like 4:32,4:128 runs 4x more steps per epoch in its b32 stage than
    # the final-stage spe would suggest)
    stages = exp.train.schedule

    def spe_of(b):
        return max(1, n_train // b)

    total_steps = sum(e * spe_of(b) for e, b in stages)
    steps_desc = " + ".join(f"{e}x{spe_of(b)}@b{b}" for e, b in stages)
    steady = (total_steps - spe_of(stages[0][1])) / (t_end - marks["t1"]) \
        if epochs > 1 and not resumed else float("nan")
    emit(f"[train] {steps_desc} steps: total {t_end - t0:.1f}s, "
         f"steady {steady:.2f} steps/s (bf16 default, excl. compile epoch)")

    # evaluate the epoch-8 EXPORT (the reference evaluates from the saved
    # per-epoch weights, not the live model) with the eval preset.
    # Drop the trainer and the train dataset FIRST: at 64x64 the resident
    # TrainState (~2.5 GB: the 206M-param dense + two Adam moments) plus the
    # HBM train tensor left a batch-200 f32 eval forward ResourceExhausted
    # on the v5e (round-4 queue log) — eval must own the chip's HBM.
    import gc

    del tr, ds
    gc.collect()
    model_dir = os.path.join(workdir, "trained_models", exp.name)
    h5 = glob.glob(os.path.join(model_dir, f"gen_*_{epochs:04d}.h5"))[0]
    pg = PretrainedGenerator.from_keras_h5(h5, seed=354)
    assert pg.cfg.ndomain == 64
    ev = Evaluator(exp, ds_eval, pg, workdir=workdir, epoch=epochs)
    t0 = time.perf_counter()
    ev.map_grids(n_conditions=5)  # n_fake_per_real=15 + magma_r from preset
    res = ev.sample_statistics(n_samples=500)
    corr = daily_cycle_correlation(res)
    gen, real = res["generated_samples"], res["real_samples"]
    cons = np.max(np.abs(gen.sum(axis=1) - real.sum(axis=1)) /
                  (real.sum(axis=1) + 1e-6))
    emit(f"[eval] preset artifacts in {time.perf_counter() - t0:.1f}s; "
         f"held-out daily-cycle corr {corr:.4f}, "
         f"max rel conservation err {cons:.2e}")
    grids = glob.glob(os.path.join(
        ev.plotdir, f"generated_fractions_*_{epochs:04d}_*_allhours.png"))
    emit(f"[artifacts] {len(grids)} map grids (epoch-{epochs} stamp, "
         f"magma_r, 15 fakes/real) + ECDF/daily-cycle plots in {ev.plotdir}")

    suffix = "" if (batch_arg, chunks) == ("32", 1) else \
        f"_b{batch_arg.replace(':', '-').replace(',', '_')}c{chunks}"
    with open(os.path.join(REPO, "artifacts",
                           f"large_domain_tpu{suffix}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
