"""SCALEBENCH re-pin driver (VERDICT r12 item 3): lakedml x3 and
sf10only x3 in fresh subprocesses (the tool's own protocol), plus one
pairs run (its queries changed this round: jaccard narrow-key), merged
with the tool's own helpers and patched into SCALEBENCH.json in place.
sf1/kernel blocks keep their pinned numbers (code unchanged there)."""

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")
from tools.bench_scale import _merge_lakedml, _merge_median_runs, _apply_coreport

TOOL = "/root/repo/tools/bench_scale.py"


def run_unit(unit: str) -> dict:
    proc = subprocess.run(
        [sys.executable, TOOL, "--tier", unit],
        capture_output=True, text=True, check=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    lakedml_runs, sf10_runs = [], []
    for i in range(3):
        print(f"lakedml run {i+1}/3...", flush=True)
        lakedml_runs.append(run_unit("lakedml")["lake_dml"])
        json.dump(lakedml_runs, open("/tmp/repin_lakedml_runs.json", "w"))
    for i in range(3):
        print(f"sf10only run {i+1}/3...", flush=True)
        sf10_runs.append(run_unit("sf10only")["sf10"])
        json.dump(sf10_runs, open("/tmp/repin_sf10_runs.json", "w"))
    print("pairs run 1/1...", flush=True)
    pairs = run_unit("pairs")["sf10_pairs"]
    json.dump(pairs, open("/tmp/repin_pairs_run.json", "w"))

    path = "/root/repo/SCALEBENCH.json"
    out = json.load(open(path))
    out["lake_dml"] = _merge_lakedml(lakedml_runs)
    out["sf10"] = _merge_median_runs(sf10_runs)
    out["sf10_pairs"] = pairs
    _apply_coreport(out)
    json.dump(out, open(path, "w"), indent=1)
    print("SCALEBENCH.json updated", flush=True)


if __name__ == "__main__":
    main()
