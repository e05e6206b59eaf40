"""Command-line interface.

The reference's "CLI" is 20 standalone SLURM scripts with module-level
constants (SURVEY.md C21); here every pipeline stage is a subcommand over the
same typed configs:

  python -m prdisagg_tpu.cli train        --synthetic --epochs 2
  python -m prdisagg_tpu.cli train        --data d.npy --indices i.pkl
  python -m prdisagg_tpu.cli train        --synthetic --f32-parity
  python -m prdisagg_tpu.cli reformat-nc  --nc-dir netcdf/ --out tensor
  python -m prdisagg_tpu.cli compute-indices --data d.npy
  python -m prdisagg_tpu.cli evaluate     --weights gen.npz --data d.npy --indices i.pkl
  python -m prdisagg_tpu.cli crps         --weights gen.npz ...
  python -m prdisagg_tpu.cli lsd          --real r.npy --generated g.npy
  python -m prdisagg_tpu.cli rainfarm-calibrate --data d.npy --indices i.pkl
  python -m prdisagg_tpu.cli generate     --weights gen.h5 --conds conds.npy --n-scenarios 1000
  python -m prdisagg_tpu.cli example      [--weights gen.npz]
  python -m prdisagg_tpu.cli download     --start 20090101 --end 20191231 --out raw/
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np


def _load_dataset(args, cfg):
    from prdisagg_tpu.data.sampler import DeviceDataset

    if getattr(args, "synthetic", False):
        from prdisagg_tpu.data.synthetic import make_synthetic_dataset

        data, indices, cfg = make_synthetic_dataset(
            n_days=args.synthetic_days, ny=args.synthetic_size,
            nx=args.synthetic_size, cfg=cfg,
        )
    else:
        if not args.data or not args.indices:
            sys.exit("need --data and --indices (or --synthetic)")
        data = np.load(args.data, mmap_mode="r")
        with open(args.indices, "rb") as f:
            indices = np.asarray(pickle.load(f), dtype=np.int32)
    doy = np.load(args.doy) if getattr(args, "doy", None) else None
    return DeviceDataset.from_numpy(np.asarray(data), indices, cfg, doy=doy), cfg


def _data_config(args):
    from prdisagg_tpu.core.config import DataConfig

    kw = {}
    for field in ("ndomain", "stride", "tp_thresh_daily", "n_thresh",
                  "conditioning", "startdate", "enddate"):
        v = getattr(args, field, None)
        if v is not None:
            kw[field] = v
    return DataConfig(**kw)


def _add_data_args(p, with_dataset=True):
    p.add_argument("--ndomain", type=int, default=None)
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--tp-thresh-daily", dest="tp_thresh_daily",
                   type=float, default=None)
    p.add_argument("--n-thresh", dest="n_thresh", type=int, default=None)
    p.add_argument("--startdate", default=None)
    p.add_argument("--enddate", default=None)
    p.add_argument("--conditioning", choices=["base", "doy", "lon"],
                   default=None)
    if with_dataset:
        p.add_argument("--data", help="training tensor .npy")
        p.add_argument("--indices", help="valid-indices .pkl")
        p.add_argument("--doy", help="day-of-year sidecar .npy")
        p.add_argument("--synthetic", action="store_true",
                       help="use the synthetic fixture dataset")
        p.add_argument("--synthetic-days", type=int, default=8)
        p.add_argument("--synthetic-size", type=int, default=64)


def cmd_train(args):
    from prdisagg_tpu.core.config import ExperimentConfig, TrainConfig
    from prdisagg_tpu.train.loop import Trainer

    if args.f32_parity and args.compute_dtype == "bfloat16":
        sys.exit("--f32-parity contradicts --compute-dtype bfloat16: "
                 "pass exactly one precision request")
    dcfg = _data_config(args)
    ds, dcfg = _load_dataset(args, dcfg)
    compute_dtype = "float32" if args.f32_parity else args.compute_dtype
    # explicit flags always win; --production supplies the rest of the
    # preset wholesale (never field-by-field, so future preset fields are
    # picked up here automatically)
    explicit = dict(n_disc=args.n_disc, seed=args.seed)
    if args.schedule:
        from prdisagg_tpu.core.config import parse_schedule

        try:  # each stage recompiles the fused step once
            explicit["schedule"] = parse_schedule(args.schedule)
        except ValueError as err:
            sys.exit(f"bad --schedule: {err}")
    if args.ema_decay is not None:
        explicit["ema_decay"] = args.ema_decay
    if args.hoisted_chunks is not None:
        explicit["hoisted_chunks"] = args.hoisted_chunks
    if args.hoisted_chunk_samples is not None:
        explicit["hoisted_chunk_samples"] = args.hoisted_chunk_samples
    if args.production:
        from prdisagg_tpu.core.config import production_train_config

        tcfg = production_train_config(**explicit)
    else:
        explicit.setdefault("schedule", ((args.epochs, args.batch_size),))
        tcfg = TrainConfig(**explicit)
    exp = ExperimentConfig(
        data=dcfg,
        train=tcfg,
        name=args.name,
        compute_dtype=compute_dtype,
    )
    if getattr(args, "model_preset", None) == "tiny":
        from prdisagg_tpu.core.config import smoke_model_config

        import dataclasses

        exp = dataclasses.replace(exp, model_override=smoke_model_config(
            ndomain=dcfg.ndomain, n_cond_channels=dcfg.n_cond_channels,
            compute_dtype=compute_dtype))
    warm = None
    if args.warm_start_gen:
        warm = (args.warm_start_gen, args.warm_start_critic)
        if args.infer_arch:
            # rebuild the architecture from the weight files themselves
            # (reference continue-training loads both nets from .h5 with no
            # config, gan_train_cwgangp_pixelnorm.py:520-521); an explicit
            # precision request (--f32-parity / --compute-dtype) still wins
            # over the inferred config's default
            import dataclasses

            from prdisagg_tpu.train.state import (
                infer_model_config_from_weights,
            )

            inferred = infer_model_config_from_weights(*warm)
            if compute_dtype is not None:
                inferred = dataclasses.replace(
                    inferred, compute_dtype=compute_dtype)
            exp = dataclasses.replace(exp, model_override=inferred)
    elif args.warm_start_critic:
        sys.exit("--warm-start-critic requires --warm-start-gen")
    tr = Trainer(exp, ds, workdir=args.workdir,
                 steps_per_epoch=args.steps_per_epoch,
                 warm_start_weights=warm, start_epoch=args.start_epoch,
                 tensorboard_dir=args.tensorboard)
    if args.resume:
        tr.maybe_resume()
    else:
        tr.plot_real_samples()
    tr.fit()
    print(f"finished at epoch {tr.epoch}; artifacts in {tr.outdir}")


def cmd_compute_indices(args):
    from prdisagg_tpu.data.indices import compute_valid_indices

    dcfg = _data_config(args)
    data = np.load(args.data, mmap_mode="r")
    idx = compute_valid_indices(np.asarray(data), dcfg,
                                include_last_box=args.include_last_box)
    out = args.out or f"data/valid_indices_smhi_radar_{dcfg.params_string()}.pkl"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump([tuple(r) for r in idx], f)
    print(f"found {len(idx)} valid samples -> {out}")


def cmd_convert_tiffs(args):
    """Raw 5-min reflectivity GeoTIFFs -> per-day netCDF intermediates
    (reference convert stage, convert_smhi_radardata.py:31-45): one
    YYYYMMDD subdirectory of --tiff-dir per day, 288 files each."""
    import glob as _glob
    import re as _re

    from prdisagg_tpu.data.ingest import read_geotiff
    from prdisagg_tpu.data.netcdf_io import convert_and_write_days

    by_day = {}
    subdirs = sorted(
        d for d in os.listdir(args.tiff_dir)
        if _re.fullmatch(r"\d{8}", d)
        and os.path.isdir(os.path.join(args.tiff_dir, d)))
    if subdirs:
        for date in subdirs:
            by_day[date] = sorted(
                p for p in _glob.glob(os.path.join(args.tiff_dir, date, "*"))
                if p.lower().endswith((".tif", ".tiff")))
    else:
        # flat layout (what `cli download` extracts): group by the first
        # 8-digit date in each filename
        for p in sorted(_glob.glob(os.path.join(args.tiff_dir, "*"))):
            if not p.lower().endswith((".tif", ".tiff")):
                continue
            m = _re.search(r"(\d{8})", os.path.basename(p))
            if m:
                by_day.setdefault(m.group(1), []).append(p)
    if not by_day:
        sys.exit(f"no YYYYMMDD day directories or dated .tif files in "
                 f"{args.tiff_dir}")

    def raw_days():
        for date, paths in by_day.items():
            print(f"{date}: {len(paths)} tiffs")
            try:
                # an empty day dir or one corrupt tiff must fail THAT day,
                # not the whole multi-year conversion (skip-and-log
                # contract, convert_smhi_radardata.py:47-52)
                raw = np.stack([read_geotiff(p) for p in paths]) \
                    if paths else None
            except Exception as e:  # noqa: BLE001 — per-day isolation
                print(f"{date}: read failed ({e})")
                raw = None
            yield date, raw  # None -> convert_and_write_days records it

    failed = convert_and_write_days(raw_days(), args.out_dir)
    # reference behaviour: failed days are skipped and logged, not fatal
    # (convert_smhi_radardata.py:47-52)
    for date in failed:
        print(f"failed: {date}")
    print(f"converted {len(by_day) - len(failed)}/{len(by_day)} days -> "
          f"{args.out_dir}")


def cmd_reformat_nc(args):
    """Reformat per-day netCDF intermediates (reference convert-stage output,
    convert_smhi_radardata.py:45) into the training tensor — the TPU-native
    reformat_data.py with O(one day) memory instead of ~363 GB."""
    from prdisagg_tpu.data.ingest import save_training_tensor
    from prdisagg_tpu.data.netcdf_io import find_day_files, reformat_from_netcdf

    dcfg = _data_config(args)
    paths = find_day_files(args.nc_dir, dcfg.startdate, dcfg.enddate)
    if not paths:
        sys.exit(f"no smhi_radar_YYYYMMDD.nc files in {args.nc_dir} "
                 f"within {dcfg.startdate}..{dcfg.enddate}")
    tensor = reformat_from_netcdf(paths, tres=dcfg.tres)
    prefix = args.out or os.path.splitext(dcfg.data_filename())[0]
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    save_training_tensor(prefix, tensor)
    print(f"reformatted {len(paths)} days -> {prefix}.npy "
          f"shape {tensor.shape}")
    # day-of-year sidecar for the doy conditioning variant (reference:
    # reformat_data_make_timelist.py:58-62).  The dates come from the
    # day-file names, so the sidecar stays aligned with skipped days.
    from prdisagg_tpu.data.ingest import day_of_year
    from prdisagg_tpu.data.netcdf_io import DAY_FILE_RE

    dates = [DAY_FILE_RE.search(os.path.basename(p)).group(1)
             for p in paths]
    doy_path = (prefix + "_doy.npy" if args.out
                else dcfg.doy_filename())
    np.save(doy_path, day_of_year(dates))
    print(f"doy sidecar ({len(dates)} days) -> {doy_path}")


def _load_generator(args, model_cfg=None, **kw):
    """The one owner of weight-format dispatch (+ the --dp mesh) for every
    CLI surface that builds a PretrainedGenerator; extra kwargs (seed,
    max_batch, ...) pass through to the constructor."""
    from prdisagg_tpu.api import PretrainedGenerator

    if args.weights is None:
        return None
    kw.setdefault("mesh", _dp_mesh(args))
    # variant weights (doy/lon) need the channel count for architecture
    # inference — not recoverable from generator shapes alone (models/io)
    kw.setdefault("n_cond_channels", getattr(args, "n_cond_channels", 1))
    kw.setdefault("wire_dtype", getattr(args, "wire_dtype", None))
    if args.weights.endswith(".h5"):
        return PretrainedGenerator.from_keras_h5(args.weights, model_cfg, **kw)
    return PretrainedGenerator.from_npz(args.weights, model_cfg, **kw)


def cmd_evaluate(args):
    from prdisagg_tpu.core.config import ExperimentConfig
    from prdisagg_tpu.eval import Evaluator

    dcfg = _data_config(args)
    ds, dcfg = _load_dataset(args, dcfg)
    exp = ExperimentConfig(data=dcfg, name=args.name)
    # infer the architecture from the weight file (reference loads the .h5
    # with no config, generate_and_evaluate.py:60-63) — evaluating
    # non-flagship weights (tiny smoke models, width variants) must not
    # require the flagship config to match
    gen = _load_generator(args, n_cond_channels=dcfg.n_cond_channels)
    if gen is None:
        sys.exit("evaluate requires --weights")
    ev = Evaluator(exp, ds, gen, workdir=args.workdir, epoch=args.epoch)
    overrides = {}
    if args.smoke:
        overrides = dict(n_map_conditions=2, n_fake_per_real=2,
                         n_stat_samples=50, n_line_conditions=1,
                         n_line_free_noise=10, n_line_shared_noise=2,
                         n_ks_conditions=2, n_ks_members=100)
    ev.run_all(**overrides)
    print(f"evaluation artifacts in {ev.plotdir} and {ev.datadir}")


def cmd_crps(args):
    from prdisagg_tpu.eval.crps import run_crps_evaluation

    gen = _load_generator(args)
    reals = np.load(args.real)[: args.n_samples]
    baseline = np.load(args.baseline)
    res = run_crps_evaluation(gen, reals, baseline,
                              n_members=args.n_members, outdir=args.out)
    print(res["analysis"])


def cmd_lsd(args):
    from prdisagg_tpu.eval.lsd import run_lsd_evaluation

    rf = np.load(args.rainfarm) if args.rainfarm else None
    dists = run_lsd_evaluation(
        np.load(args.real), np.load(args.generated), rf,
        n_samples=args.n_samples, outdir=args.out, plotdir=args.plotdir,
        reduction=args.reduction,
    )
    print({k: round(v, 4) for k, v in dists.medians.items()})
    print(f"LSD artifacts in {args.out}")


def cmd_rainfarm_calibrate(args):
    from prdisagg_tpu.baselines.rainfarm.pipeline import calibrate
    from prdisagg_tpu.core.config import RainFarmConfig

    dcfg = _data_config(args)
    ds, _ = _load_dataset(args, dcfg)
    cfg = RainFarmConfig(n_calib=args.n_calib, n_repeat=args.n_repeat)
    slopes = calibrate(ds, cfg, outdir=args.out)
    for i, (a, b) in enumerate(slopes):
        print(f"repeat {i}: alpha={a:.4f} beta={b:.4f}")


def cmd_rainfarm_crps(args):
    from prdisagg_tpu.baselines.rainfarm.pipeline import crps_rainfarm
    from prdisagg_tpu.core.config import RainFarmConfig

    with open(args.slopes, "rb") as f:
        alpha, beta = pickle.load(f)
    reals = np.load(args.real)[: args.n_samples]
    out = crps_rainfarm(reals, alpha, beta, RainFarmConfig(),
                        n_members=args.n_members,
                        outfile=os.path.join(args.out, "crps_results_rainfarm.pkl"))
    print(f"rainfarm CRPS mean: {out.mean():.4f}")


def cmd_rainfarm_generate(args):
    """RainFARM generation evaluation artifacts — parity with
    rainfarm_generate.py (ECDFs + per-condition map grids)."""
    from prdisagg_tpu.baselines.rainfarm.pipeline import generate_and_plot
    from prdisagg_tpu.core.config import RainFarmConfig

    with open(args.slopes, "rb") as f:
        alpha, beta = pickle.load(f)
    reals = np.load(args.real)[: args.n_samples]
    if reals.ndim == 5:
        reals = reals[..., 0]
    generated = generate_and_plot(
        reals, alpha, beta, RainFarmConfig(),
        plotdir=args.plotdir, datadir=args.out,
        n_map_conditions=args.n_map_conditions,
        n_fake_per_real=args.n_fake_per_real, seed=args.seed,
    )
    print(f"generated {generated.shape} -> {args.out}; plots in {args.plotdir}")


def cmd_crps_analyze(args):
    """Standalone analysis of saved CRPS pickles — parity with
    analyze_crps_results.py."""
    from prdisagg_tpu.eval.crps import analyze

    with open(args.results, "rb") as f:
        gan, random_baseline = pickle.load(f)
    rainfarm = None
    if args.rainfarm:
        with open(args.rainfarm, "rb") as f:
            rainfarm = pickle.load(f)
    res = analyze(gan, random_baseline, rainfarm, outdir=args.out)
    print(res)


def cmd_parity_report(args):
    """Statistical-parity verdict vs the reference's published artifacts
    (single runnable gate for real-data parity)."""
    import json

    from prdisagg_tpu.eval.parity import parity_report

    res = parity_report(args.ours, args.reference, out_path=args.out,
                        ks_p_threshold=args.ks_p_threshold,
                        cycle_rtol=args.cycle_rtol)
    print(json.dumps(res, indent=2))
    print(f"verdict: {'PASS' if res['passes'] else 'FAIL'} -> {args.out}")


def cmd_example(args):
    """Reference example.py: uniform 10 mm/day condition -> 10 scenarios."""
    from prdisagg_tpu.api import PretrainedGenerator
    from prdisagg_tpu.core.config import ModelConfig

    gen = _load_generator(args)
    if gen is None:
        print("no --weights given: using a randomly initialized generator "
              "(structure demo only)")
        from prdisagg_tpu.core.config import TrainConfig
        from prdisagg_tpu.train import create_train_state

        state, _, _ = create_train_state(ModelConfig(), TrainConfig())
        gen = PretrainedGenerator(state.gen_params)
    cond = 10 * np.ones((gen.cfg.ndomain, gen.cfg.ndomain, 1))
    scenarios = gen.generate_scenarios(cond, args.n_scenarios)
    fig = gen.plot_scenarios(scenarios)
    fig.savefig(args.out)
    print(f"saved {args.out}; conservation check: "
          f"max|sum_h - cond| = {np.abs(scenarios.sum(axis=1) - 10).max():.2e}")


def cmd_generate(args):
    """Production serving: conditions .npy -> scenarios .npy.

    One condition (nd, nd)[, 1] uses the reference's single-request
    semantics (raindisagg_gan_pretrained.py:52-65); a stack (K, nd, nd)[, 1]
    is served as ONE fused batch (generate_scenarios_batch) riding the
    batch-8000 throughput peak."""
    gen = _load_generator(args, seed=args.seed, max_batch=args.max_batch)
    conds = np.load(args.conds)
    if gen.cfg.n_cond_channels == 1:
        single = conds.ndim == 2 or (conds.ndim == 3
                                     and conds.shape[-1] == 1
                                     and conds.shape[0] == conds.shape[1])
    else:
        # variant conds are channels-last: one (nd, nd, C) map vs a
        # (K, nd, nd, C) stack is unambiguous by rank
        single = conds.ndim == 3
    if single:
        scen = gen.generate_scenarios(conds, args.n_scenarios)
        daily = conds if conds.ndim == 2 else conds[..., 0]
        err = np.abs(scen.sum(axis=1) - daily[None]).max()
    else:
        scen = gen.generate_scenarios_batch(conds, args.n_scenarios)
        daily = conds if conds.ndim == 3 else conds[..., 0]
        err = np.abs(scen.sum(axis=2) - daily[:, None]).max()
    np.save(args.out, scen)
    print(f"saved {args.out} shape={scen.shape}; conservation check: "
          f"max|sum_h - cond| = {err:.2e}")
    if args.plot:
        os.makedirs(args.plot, exist_ok=True)
        first = scen if single else scen[0]
        fig = gen.plot_scenarios(first[: min(8, len(first))])
        path = os.path.join(args.plot, "scenarios_grid.png")
        fig.savefig(path)
        print(f"saved {path}")


def _dp_mesh(args):
    """Optional data-parallel serving mesh from --dp N (0/None = off)."""
    if not getattr(args, "dp", None):
        return None
    from prdisagg_tpu.parallel.mesh import make_mesh

    return make_mesh(args.dp)


def cmd_serve(args):
    """Persistent serving daemon: load once, pin weights on device, answer
    newline-JSON requests over a Unix socket until a shutdown request."""
    from prdisagg_tpu.api import ScenarioServer
    from prdisagg_tpu.api.server import watch_signature

    # capture the watch baseline BEFORE loading/warming: the warm compiles
    # below can run 30 s-10 min through the tunneled TPU, and a weight
    # export landing in that window must still trigger the first reload
    baseline = watch_signature(args.watch) if args.watch else None
    gen = _load_generator(args, seed=args.seed, max_batch=args.max_batch)
    if args.warm == "max" and args.batch_window_ms > 0:
        # micro-batching pads fused totals to bucket shapes; warm the
        # small ones a concurrent-client load hits first (bigger fused
        # shapes still compile lazily, into the persistent cache)
        args.warm = "max,buckets:16"
    if args.warm and args.warm != "none":
        sizes = [s if s == "max" or s.startswith("buckets") else int(s)
                 for s in args.warm.split(",") if s]
        secs = gen.warm(sizes)
        print(f"warmed forward for batch sizes {args.warm} in {secs:.1f}s",
              flush=True)
    server = ScenarioServer(gen, args.socket_path,
                            batch_window_ms=args.batch_window_ms,
                            watch_path=args.watch,
                            watch_interval_s=args.watch_interval,
                            watch_baseline=baseline)
    watching = f", watching {args.watch}" if args.watch else ""
    print(f"serving {args.weights} (ndomain={gen.cfg.ndomain}) "
          f"on {args.socket_path}{watching}", flush=True)
    import threading

    if threading.current_thread() is threading.main_thread():
        # clean daemon stop (systemd / supervisor SIGTERM, ctrl-C): finish
        # in-flight requests, drain, unlink the socket — instead of dying
        # mid-response with a stale socket file left behind
        import signal

        def _stop(signum, frame):
            print(f"[serve] signal {signum}: shutting down", flush=True)
            server.shutdown()

        signal.signal(signal.SIGTERM, _stop)
        signal.signal(signal.SIGINT, _stop)
    served = server.serve_forever(max_requests=args.max_requests)
    print(f"served {served} requests; bye")


def cmd_inspect(args):
    """Describe a weight file: network kind, inferred architecture,
    parameter count/bytes — host-only (no device, no model build).

    The reference's weights are opaque .h5 blobs whose architecture lives
    only in the training script's module constants
    (gan_train_cwgangp_pixelnorm.py:51-114); here the shapes pin the
    architecture (models/io.py infer_*_config), so any checkpoint is
    self-describing."""
    import dataclasses
    import json

    from prdisagg_tpu.models.io import (
        infer_critic_config,
        infer_generator_config,
        load_keras_critic_h5,
        load_keras_generator_h5,
        load_params_npz,
    )

    path = args.weights
    if path.endswith((".h5", ".hdf5")):
        fmt = "keras-h5"
        try:
            params = load_keras_generator_h5(
                path, n_cond_channels=args.n_cond_channels)
        except Exception as gen_err:
            try:
                params = load_keras_critic_h5(path)
            except Exception as critic_err:
                sys.exit(
                    f"cannot read {path} as a generator "
                    f"({type(gen_err).__name__}: {gen_err}) or a critic "
                    f"({type(critic_err).__name__}: {critic_err})")
    else:
        fmt = "npz"
        params = load_params_npz(path)
    p = params["params"] if isinstance(params.get("params"), dict) else params
    kind = "generator" if "latent_proj" in p else "critic"
    if kind == "generator":
        cfg = infer_generator_config(
            params, n_cond_channels=args.n_cond_channels)
    else:
        cfg = infer_critic_config(params)

    def shapes(tree):
        return {k: shapes(v) if isinstance(v, dict) else
                f"{list(np.shape(v))} {np.asarray(v).dtype}"
                for k, v in tree.items()}

    import jax

    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(params)]
    out = {
        "path": path,
        "format": fmt,
        "network": kind,
        "n_params": int(sum(l.size for l in leaves)),
        "bytes": int(sum(l.nbytes for l in leaves)),
        "inferred_config": dataclasses.asdict(cfg),
    }
    if args.layers:
        out["layers"] = shapes(p)
    print(json.dumps(out, indent=1))


def cmd_download(args):
    from prdisagg_tpu.data.download import download_range

    failed = download_range(args.start, args.end, args.out)
    print(f"failed dates: {failed}")


def cmd_doctor(args):
    """Backend health check: one tiny device computation in a subprocess
    with a hard timeout, so a wedged backend cannot hang this command.
    rc 0 = healthy, 1 = unhealthy (the wedge signature is detail='timeout').

    --wait S polls until the backend answers or S seconds elapse —
    the shell building block for recovery pipelines:
    `prdisagg_tpu doctor --wait 21600 && python bench.py`."""
    import json
    import time

    from prdisagg_tpu.utils.watchdog import probe_backend

    t0 = time.time()
    while True:
        res = probe_backend(args.platform, timeout_s=args.timeout)
        if res["ok"] or args.wait is None:
            break
        waited = time.time() - t0
        if waited + args.wait_interval > args.wait:
            res["waited_s"] = round(waited, 1)
            break
        print(f"# unhealthy ({res['detail']}); waited {waited:.0f}s of "
              f"{args.wait:.0f}s, retry in {args.wait_interval:.0f}s",
              flush=True)
        time.sleep(args.wait_interval)
    res["platform"] = args.platform or os.environ.get(
        "JAX_PLATFORMS", "(default)")
    print(json.dumps(res, indent=2))
    raise SystemExit(0 if res["ok"] else 1)


def cmd_supervise(args):
    """Run a training command under heartbeat supervision: the child is
    killed and relaunched if its Trainer stops making device progress
    (wedged backend); Orbax resume makes the relaunch continue, not
    restart.  Example:

      prdisagg_tpu supervise --stall-timeout 900 -- \\
          python scripts/paper_protocol.py --workdir artifacts/pp
    """
    from prdisagg_tpu.utils.watchdog import supervise

    cmd = list(args.argv)
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        raise SystemExit("supervise: no command given (use `-- cmd ...`)")
    # per-invocation default: two concurrent supervised runs sharing one
    # heartbeat file would cross-beat and mask each other's stalls
    hb_path = args.heartbeat or f"/tmp/prdisagg_heartbeat.{os.getpid()}"
    res = supervise(
        cmd,
        heartbeat_path=hb_path,
        stall_timeout_s=args.stall_timeout,
        startup_timeout_s=args.startup_timeout,
        max_restarts=args.max_restarts,
        probe_platform=args.platform,
        probe_on_stall=not args.no_probe,
        probe_max_wait_s=args.probe_max_wait,
    )
    print(f"[supervise] rc={res.returncode} restarts={res.restarts} "
          f"stalls={res.stalls} wall={res.wall_s / 60:.1f} min")
    raise SystemExit(0 if res.returncode == 0 else 1)


def build_parser():
    p = argparse.ArgumentParser(prog="prdisagg_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    _add_data_args(t)
    t.add_argument("--epochs", type=int, default=50)
    t.add_argument("--batch-size", type=int, default=32)
    t.add_argument("--schedule", default=None,
                   help="increasing-batch-size schedule EPOCHS:BATCH[,...] "
                        "e.g. '20:32,30:128' (overrides --epochs/--batch-size)")
    t.add_argument("--n-disc", type=int, default=5)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--steps-per-epoch", type=int, default=None)
    t.add_argument("--workdir", default=".")
    t.add_argument("--name", default="wgancp_pixelnorm")
    t.add_argument("--resume", action="store_true",
                   help="exact resume from the Orbax checkpoint")
    t.add_argument("--warm-start-gen", dest="warm_start_gen",
                   help="generator weights (.npz/.h5) to continue from "
                        "with fresh optimizers (reference workflow)")
    t.add_argument("--warm-start-critic", dest="warm_start_critic",
                   default=None)
    t.add_argument("--infer-arch", dest="infer_arch", action="store_true",
                   help="reconstruct the model architecture from the "
                        "warm-start weight files (no config needed)")
    t.add_argument("--start-epoch", dest="start_epoch", type=int, default=0,
                   help="epoch-label offset for continued runs")
    t.add_argument("--compute-dtype", dest="compute_dtype",
                   choices=["bfloat16", "float32"], default=None,
                   help="conv/matmul precision (params + conservation "
                        "softmax are always float32); default bfloat16")
    t.add_argument("--ema-decay", dest="ema_decay", type=float,
                   default=None,
                   help="EMA generator decay per fused step (0 = off, the "
                        "reference protocol); exports gen_ema_* weights")
    t.add_argument("--tensorboard", dest="tensorboard", default=None,
                   metavar="DIR",
                   help="also stream per-chunk metrics to a TensorBoard "
                        "event file in DIR (hist.csv stays the always-on "
                        "record; SURVEY.md §5 metrics plan)")
    t.add_argument("--production", action="store_true",
                   help="measured-production preset "
                        "(core.config.production_train_config): schedule "
                        "20:32,30:128 + EMA 0.999 — both beat the flat "
                        "reference protocol on every battery metric "
                        "(docs/PERF.md).  Explicit --schedule / "
                        "--ema-decay still win")
    t.add_argument("--f32-parity", dest="f32_parity", action="store_true",
                   help="strict reference-protocol precision (the reference "
                        "trains implicit float32); same as "
                        "--compute-dtype float32")
    t.add_argument("--hoisted-chunks", dest="hoisted_chunks", type=int,
                   default=None,
                   help="chunk the hoisted (n_disc*B) generator forward "
                        "into N sequential pieces (big-domain memory "
                        "lever; docs/PERF.md 64x64 table)")
    t.add_argument("--hoisted-chunk-samples", dest="hoisted_chunk_samples",
                   type=int, default=None,
                   help="cap per-chunk samples instead (auto chunk count "
                        "per schedule stage; e.g. 128 at ndomain=64)")
    t.add_argument("--model-preset", choices=["flagship", "tiny"],
                   default="flagship",
                   help="'tiny' = shrunken smoke architecture for pipeline "
                        "rehearsals/CI (NOT a benchmark or parity config)")
    t.set_defaults(fn=cmd_train)

    ct = sub.add_parser("convert-tiffs", help="raw 5-min radar GeoTIFFs -> "
                        "per-day .nc intermediates (reference "
                        "convert_smhi_radardata.py stage)")
    ct.add_argument("--tiff-dir", dest="tiff_dir", required=True,
                    help="root with one YYYYMMDD subdirectory per day, each "
                         "holding that day's 288 five-minute GeoTIFFs in "
                         "lexical order")
    ct.add_argument("--out-dir", dest="out_dir", required=True,
                    help="directory for smhi_radar_YYYYMMDD.nc outputs "
                         "(mm/5min; tres aggregation happens at reformat-nc)")
    ct.set_defaults(fn=cmd_convert_tiffs)

    rn = sub.add_parser("reformat-nc", help="per-day .nc intermediates -> "
                        "training tensor (reference reformat_data.py stage)")
    _add_data_args(rn, with_dataset=False)
    rn.add_argument("--nc-dir", dest="nc_dir", required=True,
                    help="directory of smhi_radar_YYYYMMDD.nc files")
    rn.add_argument("--out", help="output path prefix (.npy/.npz appended)")
    rn.set_defaults(fn=cmd_reformat_nc)

    c = sub.add_parser("compute-indices")
    _add_data_args(c, with_dataset=False)
    c.add_argument("--data", required=True)
    c.add_argument("--out")
    c.add_argument("--include-last-box", action="store_true",
                   help="fix the reference's off-by-one sweep boundary")
    c.set_defaults(fn=cmd_compute_indices)

    e = sub.add_parser("evaluate")
    _add_data_args(e)
    e.add_argument("--weights", required=False)
    e.add_argument("--epoch", type=int, default=20)
    e.add_argument("--workdir", default=".")
    e.add_argument("--name", default="wgancp_pixelnorm")
    e.add_argument("--smoke", action="store_true")
    e.add_argument("--dp", type=int, default=0,
                   help="shard eval forwards data-parallel over N devices")
    e.set_defaults(fn=cmd_evaluate)

    cr = sub.add_parser("crps")
    cr.add_argument("--weights", required=True)
    cr.add_argument("--real", required=True, help="real_samples.npy")
    cr.add_argument("--baseline", required=True,
                    help="rainfarm_calibration_data.npy")
    cr.add_argument("--n-members", type=int, default=1000)
    cr.add_argument("--n-samples", type=int, default=10000)
    cr.add_argument("--out", default="data")
    cr.add_argument("--dp", type=int, default=0,
                    help="shard each chunk's samples data-parallel over the "
                         "first N devices (params replicated; results "
                         "exactly equal to single-device)")
    cr.set_defaults(fn=cmd_crps)

    l = sub.add_parser("lsd")
    l.add_argument("--real", required=True)
    l.add_argument("--generated", required=True)
    l.add_argument("--rainfarm")
    l.add_argument("--n-samples", type=int, default=1000)
    l.add_argument("--out", default=".")
    l.add_argument("--plotdir", default="plots")
    l.add_argument("--reduction", choices=("full", "device"), default="full",
                   help="full = save complete distance populations "
                        "(reference artifact contract); device = on-device "
                        "reduction, exact medians + subsample artifacts "
                        "(minutes instead of ~27 min at n=1000 through a "
                        "tunneled chip)")
    l.set_defaults(fn=cmd_lsd)

    rc = sub.add_parser("rainfarm-calibrate")
    _add_data_args(rc)
    rc.add_argument("--n-calib", type=int, default=5000)
    rc.add_argument("--n-repeat", type=int, default=10)
    rc.add_argument("--out", default="data")
    rc.set_defaults(fn=cmd_rainfarm_calibrate)

    rcr = sub.add_parser("rainfarm-crps")
    rcr.add_argument("--slopes", required=True, help="spectral_slopes_0.pkl")
    rcr.add_argument("--real", required=True)
    rcr.add_argument("--n-members", type=int, default=1000)
    rcr.add_argument("--n-samples", type=int, default=10000)
    rcr.add_argument("--out", default="data")
    rcr.set_defaults(fn=cmd_rainfarm_crps)

    rg = sub.add_parser("rainfarm-generate")
    rg.add_argument("--slopes", required=True, help="spectral_slopes_0.pkl")
    rg.add_argument("--real", required=True, help="real_samples.npy")
    rg.add_argument("--n-samples", type=int, default=10000)
    rg.add_argument("--n-map-conditions", type=int, default=20)
    rg.add_argument("--n-fake-per-real", type=int, default=10)
    rg.add_argument("--seed", type=int, default=0)
    rg.add_argument("--out", default="data")
    rg.add_argument("--plotdir", default="plots_generated_rainfarm")
    rg.set_defaults(fn=cmd_rainfarm_generate)

    ca = sub.add_parser("crps-analyze")
    ca.add_argument("--results", required=True,
                    help="crps_results_n_sample*.pkl (gan, random)")
    ca.add_argument("--rainfarm", help="crps_results_rainfarm.pkl")
    ca.add_argument("--out", default="data")
    ca.set_defaults(fn=cmd_crps_analyze)

    pr = sub.add_parser("parity-report")
    pr.add_argument("--ours", required=True,
                    help="our plots_generated_* artifact directory")
    pr.add_argument("--reference", required=True,
                    help="reference plots_generated_wgancp_pixelnorm* dir")
    pr.add_argument("--out", default="data/parity_report.json")
    pr.add_argument("--ks-p-threshold", type=float, default=0.01)
    pr.add_argument("--cycle-rtol", type=float, default=0.25)
    pr.set_defaults(fn=cmd_parity_report)

    ex = sub.add_parser("example")
    ex.add_argument("--weights")
    ex.add_argument("--n-scenarios", type=int, default=10)
    ex.add_argument("--out", default="generated_scenarios1.png")
    ex.set_defaults(fn=cmd_example)

    g = sub.add_parser("generate", help="serve scenarios for condition(s) "
                       "from a .npy of daily-sum maps")
    g.add_argument("--weights", required=True)
    g.add_argument("--conds", required=True,
                   help=".npy of daily sums in mm: (nd,nd)[,1] for one "
                        "request or (K,nd,nd)[,1] for a batch")
    g.add_argument("--n-scenarios", type=int, default=1000)
    g.add_argument("--out", default="scenarios.npy")
    g.add_argument("--seed", type=int, default=354)
    g.add_argument("--max-batch", type=int, default=None,
                   help="per-forward device batch cap (default: the "
                        "measured domain- and dtype-scaled HBM ceiling — "
                        "8000 bf16 / 4000 f32 at 16x16, docs/PERF.md)")
    g.add_argument("--plot", default=None,
                   help="also save a scenario-grid png of the first request")
    g.add_argument("--dp", type=int, default=0,
                   help="shard the scenario batch data-parallel over the "
                        "first N devices (params replicated; per-sample "
                        "output identical to single-device)")
    g.add_argument("--n-cond-channels", dest="n_cond_channels", type=int,
                   default=1,
                   help="conditioning channels of the weights (base 1, "
                        "lon 2, doy 3); conds then carry the extra "
                        "channels after the mm daily sums: (nd,nd,C) / "
                        "(K,nd,nd,C)")
    g.add_argument("--wire-dtype", dest="wire_dtype", default=None,
                   choices=["float32", "float16"],
                   help="dtype of the device->host fetch: float16 halves "
                        "the fetch-bound bulk-export wire bytes at ~5e-4 "
                        "relative conservation error (default float32 — "
                        "exact reference parity)")
    g.set_defaults(fn=cmd_generate)

    srv = sub.add_parser(
        "serve",
        help="persistent scenario-serving daemon: weights pinned on device, "
             "forward traced once, newline-JSON requests over a Unix "
             "socket (api/server.py docstring has the protocol)")
    srv.add_argument("--weights", required=True)
    srv.add_argument("--socket", required=True, dest="socket_path",
                     help="Unix socket path to listen on")
    srv.add_argument("--seed", type=int, default=354)
    srv.add_argument("--max-batch", type=int, default=None,
                     help="per-forward device batch cap (default: the "
                          "measured domain-scaled ceiling)")
    srv.add_argument("--max-requests", type=int, default=None,
                     help="exit after N requests (smoke/testing)")
    srv.add_argument("--batch-window-ms", type=float, default=0.0,
                     help="dynamic micro-batching: fuse concurrent scenario "
                          "requests arriving within this window into ONE "
                          "device forward (0 = off, keeping the sequential "
                          "per-request key chain exactly; each request "
                          "still gets independent latents when on)")
    srv.add_argument("--warm", default="max",
                     help="comma list of request sizes to compile before "
                          "binding the socket ('max' = the max-batch chunk "
                          "shape every large request runs as; 'none' to "
                          "skip).  A cold remote compile mid-request costs "
                          "30s-10min; warming moves it to startup")
    srv.add_argument("--dp", type=int, default=0,
                     help="shard every request's scenario batch over the "
                          "first N devices (data-parallel serving)")
    srv.add_argument("--watch", default=None, metavar="PATH",
                     help="hot-reload weights when PATH changes: a file "
                          "(reload on mtime change) or a directory (reload "
                          "when a newer gen_*.h5/.npz export lands — point "
                          "it at a training run's trained_models/<name>/ "
                          "for continuous deployment)")
    srv.add_argument("--watch-interval", type=float, default=5.0,
                     help="seconds between watch polls")
    srv.add_argument("--n-cond-channels", dest="n_cond_channels", type=int,
                     default=1,
                     help="conditioning channels of the weights (base 1, "
                          "lon 2, doy 3); requests then send (nd,nd,C) "
                          "maps / (K,nd,nd,C) stacks")
    srv.add_argument("--wire-dtype", dest="wire_dtype", default=None,
                     choices=["float32", "float16"],
                     help="dtype of the device->host fetch: float16 halves "
                          "the fetch-bound bulk-export wire bytes at ~5e-4 "
                          "relative conservation error (default float32 — "
                          "exact reference parity; responses are f32 either "
                          "way)")
    srv.set_defaults(fn=cmd_serve)

    ins = sub.add_parser(
        "inspect",
        help="describe a weight file (.h5/.npz): network kind, inferred "
             "architecture, parameter count — host-only, no device")
    ins.add_argument("--weights", required=True)
    ins.add_argument("--n-cond-channels", dest="n_cond_channels", type=int,
                     default=1,
                     help="conditioning channels for generator inference "
                          "(base 1, lon 2, doy 3 — not recoverable from "
                          "generator shapes alone)")
    ins.add_argument("--layers", action="store_true",
                     help="also list per-layer shapes/dtypes")
    ins.set_defaults(fn=cmd_inspect)

    d = sub.add_parser("download")
    d.add_argument("--start", default="20090101")
    d.add_argument("--end", default="20191231")
    d.add_argument("--out", required=True)
    d.set_defaults(fn=cmd_download)

    dr = sub.add_parser("doctor", help="probe backend health in a "
                        "subprocess (never hangs on a wedged backend)")
    dr.add_argument("--platform", default=None,
                    help="JAX platform to probe (default: environment's)")
    dr.add_argument("--timeout", type=float, default=60.0)
    dr.add_argument("--wait", type=float, default=None,
                    help="keep probing up to this many seconds until the "
                         "backend answers (rc 0 on recovery)")
    dr.add_argument("--wait-interval", type=float, default=120.0)
    dr.set_defaults(fn=cmd_doctor)

    sv = sub.add_parser(
        "supervise", help="run a training command under heartbeat "
        "supervision; kill + resume it if the backend wedges")
    sv.add_argument("--heartbeat", default=None,
                    help="liveness file (exported as PRDISAGG_HEARTBEAT; "
                         "the Trainer beats it every fused-step chunk). "
                         "Default: a per-invocation /tmp path — concurrent "
                         "supervised runs must not share one file")
    sv.add_argument("--stall-timeout", type=float, default=900.0,
                    help="seconds of heartbeat silence before the child "
                         "is declared wedged and killed")
    sv.add_argument("--startup-timeout", type=float, default=None,
                    help="silence allowance before the FIRST beat "
                         "(default 4x stall timeout: cold fused-step "
                         "compiles through the tunnel take ~26 min)")
    sv.add_argument("--max-restarts", type=int, default=3)
    sv.add_argument("--platform", default=None,
                    help="platform for recovery probes")
    sv.add_argument("--no-probe", action="store_true",
                    help="relaunch immediately after a stall kill instead "
                         "of waiting for a healthy backend probe")
    sv.add_argument("--probe-max-wait", type=float, default=6 * 3600.0,
                    help="give up if the backend stays unhealthy this long")
    sv.add_argument("argv", nargs=argparse.REMAINDER,
                    help="-- command to run")
    sv.set_defaults(fn=cmd_supervise)

    return p


def main(argv=None):
    # this image pre-imports jax via sitecustomize with the TPU platform
    # latched, so the documented `JAX_PLATFORMS=cpu python -m ...cli` must be
    # re-applied through the config (env alone is too late); also enable the
    # persistent compile cache for the slow remote-compile platform
    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/prdisagg_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
