"""One-command rehearsal of the L1 file contracts, raw files to parity gate
(VERDICT round-4 item 4).

Writes a tiny synthetic raw radar corpus to DISK (per-day directories of
5-minute uint8 reflectivity GeoTIFFs, written with PIL), then drives the
EXACT real-data day-one sequence through the CLI and the reference's
on-disk file contracts:

    cli convert-tiffs    raw GeoTIFFs            -> smhi_radar_YYYYMMDD.nc
    cli reformat-nc      per-day .nc             -> {start}-{end}_tres1.npy
                                                    (reformat_data.py:86-91)
    cli compute-indices  tensor                  -> valid_indices_smhi_radar_
                                                    {params}.pkl
                                                    (compute_valid_indices.py:91-99)
    cli train            tensor + indices        -> gen_*.h5 / hist.csv
    cli evaluate         weights + tensor        -> reference-named artifacts
    cli parity-report    our plots vs published  -> parity_report.json

Every stage runs as a subprocess CLI call on the files the previous stage
left on disk — no in-process shortcuts — so this is the rehearsal a real
SMHI download would follow (RUNBOOK.md documents that sequence).

Usage: python scripts/l1_rehearsal.py [workdir] [--days N] [--size PX]
Exit 0 and a JSON summary line on success.  CPU-friendly (~4 min smoke).
"""

import argparse
import glob
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REF_PLOTS = "/root/reference/plots_generated_wgancp_pixelnorm"


def write_raw_corpus(raw_dir: str, dates, size: int, seed: int = 0) -> int:
    """Per-day directories of 288 five-minute uint8 reflectivity GeoTIFFs.

    Encoding is the SMHI raw contract the converter expects
    (convert_smhi_radardata.py:39-43): value 255 = missing, dBZ =
    x*0.4 - 30.  Fields are smooth rain blobs with an afternoon peak so
    that whole-day mm sums produce valid training boxes downstream.
    """
    from PIL import Image

    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    # missing data in real scans is STRUCTURED (out-of-range border), not
    # random speckle: under skipna=False daily-sum semantics, random
    # per-step speckle at 1e-3 would poison ~25% of all daily pixels and
    # leave zero nan-free boxes
    missing = np.zeros((size, size), bool)
    missing[:2, :] = True
    n_files = 0
    for date in dates:
        ddir = os.path.join(raw_dir, date)
        os.makedirs(ddir, exist_ok=True)
        # two slow-moving blob centres + diurnal intensity envelope
        centres = [rng.rand(2) * size for _ in range(2)]
        for step in range(288):
            hour = step / 12.0
            envelope = 0.35 + 0.65 * np.exp(-((hour - 15.0) ** 2) / 18.0)
            dbz = rng.randn(size, size) * 1.5
            for c in centres:
                c += rng.randn(2) * 0.8
                c %= size
                d2 = ((yy - c[0]) % size) ** 2 + ((xx - c[1]) % size) ** 2
                # peak ~45 dBZ (raw ~187) in the blob core
                dbz += 45.0 * envelope * np.exp(-d2 / (2 * (size / 6) ** 2))
            raw = np.clip((dbz + 30.0) / 0.4, 0, 254).astype(np.uint8)
            raw[missing] = 255
            Image.fromarray(raw, mode="L").save(
                os.path.join(ddir, f"radar_{date}_{step:03d}.tif"))
            n_files += 1
    return n_files


def run_cli(workdir, *cli_args, timeout=1500):
    """One CLI stage in a fresh subprocess with cwd=workdir (contract
    filenames resolve relative to the working directory, like a real run)."""
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")
    # cwd is the workdir (contract filenames), so the package resolves
    # from the repo path instead
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "prdisagg_tpu.cli", *cli_args]
    print(f"\n$ {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=workdir, env=env, timeout=timeout,
                          capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-3000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(
            f"stage {' '.join(cli_args[:1])} failed rc={proc.returncode}")
    return proc.stdout


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?",
                    default=os.path.join(REPO, "artifacts", "l1_rehearsal"))
    ap.add_argument("--days", type=int, default=4)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--steps-per-epoch", type=int, default=20)
    args = ap.parse_args(argv)

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    dates = [f"200901{d + 1:02d}" for d in range(args.days)]
    start, end = dates[0], dates[-1]
    summary = {"workdir": wd, "dates": [start, end]}

    # stage 0: raw corpus on disk
    raw_dir = os.path.join(wd, "raw_tiffs")
    summary["raw_files"] = write_raw_corpus(raw_dir, dates, args.size)
    print(f"[0] wrote {summary['raw_files']} raw GeoTIFFs under {raw_dir}")

    # stage 1: convert (GeoTIFFs -> per-day mm/5min netCDF)
    nc_dir = os.path.join(wd, "netcdf")
    run_cli(wd, "convert-tiffs", "--tiff-dir", raw_dir, "--out-dir", nc_dir)
    ncs = sorted(glob.glob(os.path.join(nc_dir, "smhi_radar_*.nc")))
    assert len(ncs) == args.days, ncs
    summary["nc_files"] = [os.path.basename(p) for p in ncs]

    # stage 2: reformat (.nc -> {start}-{end}_tres1.npy, reference naming)
    run_cli(wd, "reformat-nc", "--nc-dir", nc_dir,
            "--startdate", start, "--enddate", end)
    tensor_path = os.path.join(wd, f"{start}-{end}_tres1.npy")
    assert os.path.exists(tensor_path), tensor_path
    assert os.path.exists(tensor_path.replace(".npy", ".npz"))
    summary["tensor"] = os.path.basename(tensor_path)
    summary["tensor_shape"] = list(np.load(tensor_path, mmap_mode="r").shape)
    # doy sidecar (reformat_data_make_timelist.py contract) rides along
    doy_path = os.path.join(wd, f"{start}-{end}_tres1_doy.npy")
    assert os.path.exists(doy_path), doy_path
    doy = np.load(doy_path)
    assert len(doy) == args.days and doy[0] == 1.0  # Jan 1
    summary["doy_sidecar"] = os.path.basename(doy_path)

    # stage 3: valid indices (reference pickle contract)
    run_cli(wd, "compute-indices", "--data", tensor_path,
            "--startdate", start, "--enddate", end)
    pkls = glob.glob(os.path.join(
        wd, "data", f"valid_indices_smhi_radar_{start}-{end}-*.pkl"))
    assert len(pkls) == 1, pkls
    import pickle
    with open(pkls[0], "rb") as f:
        n_idx = len(pickle.load(f))
    assert n_idx > 0, "no valid samples in the synthetic corpus"
    summary["indices"] = os.path.basename(pkls[0])
    summary["n_valid_samples"] = n_idx

    # stage 4: train from the files on disk
    train_dir = os.path.join(wd, "train")
    # tiny preset: the rehearsal drills the FILE CONTRACTS, not model
    # quality — flagship width at f32 on one CPU core times out (>25 min)
    run_cli(wd, "train", "--data", tensor_path, "--indices", pkls[0],
            "--startdate", start, "--enddate", end,
            "--schedule", f"{args.epochs}:16", "--n-disc", "1",
            "--steps-per-epoch", str(args.steps_per_epoch),
            "--model-preset", "tiny",
            "--f32-parity", "--workdir", train_dir, "--name", "l1rehearsal")
    h5s = sorted(glob.glob(os.path.join(
        train_dir, "trained_models", "l1rehearsal", "gen_*.h5")))
    assert h5s, "train produced no .h5 exports"
    summary["weights"] = os.path.basename(h5s[-1])

    # stage 5: evaluate with the reference artifact names
    eval_dir = os.path.join(wd, "eval")
    run_cli(wd, "evaluate", "--weights", h5s[-1], "--data", tensor_path,
            "--indices", pkls[0], "--startdate", start, "--enddate", end,
            "--workdir", eval_dir, "--smoke", "--epoch", str(args.epochs))
    plotdirs = glob.glob(os.path.join(eval_dir, "plots_generated_*"))
    assert plotdirs, os.listdir(eval_dir)
    summary["eval_plots"] = len(
        glob.glob(os.path.join(plotdirs[0], "*")))

    # stage 6: parity gate against the published artifacts (verdict may be
    # FAIL for a 1-epoch smoke model — producing the report IS the contract)
    report_path = os.path.join(wd, "parity_report.json")
    if os.path.isdir(REF_PLOTS):
        run_cli(wd, "parity-report", "--ours", plotdirs[0],
                "--reference", REF_PLOTS, "--out", report_path)
        with open(report_path) as f:
            rep = json.load(f)
        summary["parity_report"] = {
            "passes": rep["passes"],
            "ks_p_match": rep["ks_population"]["p_match"],
            "cycle_correlation": rep["daily_cycle"]["correlation"],
        }
    else:
        summary["parity_report"] = "reference artifacts not mounted"

    summary["ok"] = True
    with open(os.path.join(wd, "l1_rehearsal_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("\n" + json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
