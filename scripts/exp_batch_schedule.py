"""VERDICT round-3 item 4: demonstrate the reference's increasing-batch-size
schedule end-to-end on real TPU.

The reference documents a multi-stage schedule (commented variant
``((2,32),(4,64),(44,128))`` at gan_train_cwgangp_pixelnorm.py:73-74, driven
at :526-529) but ships with the flat ``((50,32),)``.  Round-2 measurements
(docs/PERF.md batch-scaling table) show b128 bf16 sustains 26.8k
sample-updates/s vs 18.4k at b32, so the schedule is the biggest remaining
protocol-level throughput lever.  This experiment runs the full 50-epoch
synthetic quality protocol twice — flat b32 vs ((20,32),(30,128)) — and
reports wall-clock and daily-cycle-correlation quality for both, exercising
the stage-recompile path on the real chip.

Usage: python scripts/exp_batch_schedule.py [steps_per_epoch=200]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def run_protocol(schedule, name, ds, dcfg, spe, workdir):
    from prdisagg_tpu.api import PretrainedGenerator
    from prdisagg_tpu.core.config import ExperimentConfig, TrainConfig
    from prdisagg_tpu.eval import Evaluator, daily_cycle_correlation
    from prdisagg_tpu.train.loop import Trainer

    exp = ExperimentConfig(
        data=dcfg,
        train=TrainConfig(schedule=schedule, seed=0, log_every_steps=50),
        name=name,
    )
    wd = os.path.join(workdir, name)
    os.makedirs(wd, exist_ok=True)
    epoch_t = []  # (epoch, timestamp) at each epoch end

    def on_epoch_end(trainer):
        trainer.flush_artifacts()
        epoch_t.append((trainer.epoch, time.perf_counter()))

    tr = Trainer(exp, ds, workdir=wd, steps_per_epoch=spe,
                 plot_every_epochs=0, on_epoch_end=on_epoch_end)
    t0 = time.perf_counter()
    hist = tr.fit(progress=False)
    tr.flush_artifacts()
    wall = time.perf_counter() - t0
    n_steps = sum(n_ep * spe for n_ep, _ in schedule)
    # sample-updates = sum over stages of epochs*spe*batch*(n_disc+1)
    total_updates = sum(n_ep * spe * bs * 6 for n_ep, bs in schedule)

    # steady-state rates per stage, excluding each stage's FIRST epoch
    # (which pays that stage's one-off jit compile)
    times = dict(epoch_t)
    stage_rates = []
    e0 = 0
    for n_ep, bs in schedule:
        first, last = e0 + 1, e0 + n_ep
        if n_ep >= 2 and first in times and last in times:
            dt = times[last] - times[first]
            stage_rates.append({
                "batch": bs, "epochs": n_ep,
                "steady_steps_per_sec": round((n_ep - 1) * spe / dt, 1),
                "steady_sample_updates_per_sec": round(
                    (n_ep - 1) * spe * bs * 6 / dt, 1),
            })
        e0 += n_ep

    pg = PretrainedGenerator(jax.device_get(tr.state.gen_params),
                             exp.model(), seed=354)
    ev = Evaluator(exp, ds, pg, workdir=wd, epoch=tr.epoch)
    res, _ = ev.run_all(
        n_map_conditions=2, n_fake_per_real=2, n_stat_samples=300,
        n_line_conditions=1, n_line_free_noise=10, n_line_shared_noise=2,
        n_ks_conditions=2, n_ks_members=100,
    )
    corr = daily_cycle_correlation(res)
    out = {
        "name": name, "schedule": list(map(list, schedule)),
        "wall_s_incl_compiles": round(wall, 1), "fused_steps": n_steps,
        "sample_updates_per_sec_incl_compiles": round(total_updates / wall, 1),
        "stage_steady_rates": stage_rates,
        "daily_cycle_corr": round(corr, 4),
        "final_d_loss": round(float(hist["d_loss"][-1]), 4),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/prdisagg_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset

    spe = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    workdir = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "batch_schedule_r3")
    os.makedirs(workdir, exist_ok=True)
    data, indices, dcfg = make_synthetic_dataset(n_days=16, ny=96, nx=96,
                                                 seed=0)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)

    flat = run_protocol(((50, 32),), "flat_b32", ds, dcfg, spe, workdir)
    sched = run_protocol(((20, 32), (30, 128)), "sched_b32_b128", ds, dcfg,
                         spe, workdir)
    flat_rate = flat["stage_steady_rates"][0][
        "steady_sample_updates_per_sec"]
    sched_tail = sched["stage_steady_rates"][-1][
        "steady_sample_updates_per_sec"]
    summary = {"flat": flat, "schedule": sched,
               "steady_tail_sample_update_speedup": round(
                   sched_tail / flat_rate, 2)}
    path = os.path.join(workdir, "summary.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print("summary ->", os.path.abspath(path))


if __name__ == "__main__":
    main()
