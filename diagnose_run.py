"""Post-run diagnosis over run_slam output dirs: per-stage statistics from
metrics.jsonl + summary.json, to attribute accuracy differences
(round-2 VERDICT weak #4: turny ATE 10x gentle with no diagnosis)."""
import json
import os
import sys

import numpy as np


def load(run):
    path = os.path.join(run, "metrics.jsonl")
    rows = {"odometry": [], "mapping": []}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            rows.setdefault(r.get("stage", "?"), []).append(r)
    with open(os.path.join(run, "summary.json")) as f:
        summary = json.load(f)
    return rows, summary


def stats(rows, keys):
    out = {}
    for k in keys:
        v = np.asarray([r[k] for r in rows if k in r], float)
        if len(v):
            out[k] = dict(mean=round(float(np.nanmean(v)), 4),
                          p90=round(float(np.nanpercentile(v, 90)), 4),
                          max=round(float(np.nanmax(v)), 4))
    return out


def main(runs):
    for run in runs:
        rows, summary = load(run)
        print(f"== {run}")
        print("   summary:", {k: summary.get(k) for k in
                              ("scans", "ate_rmse_m", "rpe_m", "keyframes",
                               "loops", "scans_per_sec", "state_save_s")})
        odo = stats(rows.get("odometry", []),
                    ("iters", "n_surf", "n_corner", "residual", "diverged"))
        mp = stats(rows.get("mapping", []),
                   ("iters", "n_matches", "warm_dist", "keyframe_added"))
        print("   odometry:", json.dumps(odo))
        print("   mapping :", json.dumps(mp))


if __name__ == "__main__":
    main(sys.argv[1:] or sorted(
        d for d in ("out/" + x for x in os.listdir("out"))
        if os.path.isdir(d) and os.path.exists(d + "/metrics.jsonl")))
