"""End-to-end L1 file-contract rehearsal (VERDICT round-4 item 4).

Runs scripts/l1_rehearsal.py in a subprocess: synthetic raw GeoTIFFs on
disk -> cli convert-tiffs -> reformat-nc -> compute-indices -> train ->
evaluate -> parity-report, all through the reference's on-disk file
contracts ({start}-{end}_tres1.npy naming per reformat_data.py:86-91,
valid_indices_*.pkl per compute_valid_indices.py:91-99).

The train stage uses `--model-preset tiny` (the smoke architecture):
this drill is about the FILE CONTRACTS, not model quality — flagship
width at f32 on one CPU core times out.  Still one of the slower tests
(~2-8 min depending on contention); excluded from -m quick by design.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_l1_rehearsal_end_to_end(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "l1_rehearsal.py"),
         str(tmp_path), "--days", "3", "--steps-per-epoch", "12"],
        cwd=REPO, capture_output=True, text=True, timeout=2400,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])

    with open(tmp_path / "l1_rehearsal_summary.json") as f:
        s = json.load(f)
    assert s["ok"] is True
    # the reference file contracts, verbatim
    assert s["tensor"] == "20090101-20090103_tres1.npy"
    assert s["indices"].startswith("valid_indices_smhi_radar_20090101-")
    assert s["indices"].endswith(".pkl")
    assert s["n_valid_samples"] > 0
    assert s["raw_files"] == 3 * 288
    assert s["nc_files"] == [f"smhi_radar_2009010{d}.nc" for d in (1, 2, 3)]
    assert s["tensor_shape"][:2] == [3, 24]
    assert s["doy_sidecar"] == "20090101-20090103_tres1_doy.npy"
    assert s["weights"].startswith("gen_") and s["weights"].endswith(".h5")
    assert s["eval_plots"] > 0
    # the parity gate ran and produced a verdict (FAIL is fine for a
    # 1-epoch smoke model; producing the report is the contract)
    if isinstance(s["parity_report"], dict):
        assert "passes" in s["parity_report"]
