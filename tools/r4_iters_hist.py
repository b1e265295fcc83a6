"""GN iteration-count histogram of the mapping back-end (VERDICT r3 #1c).

Reads one or more run_slam output dirs (metrics.jsonl) and prints, per run,
the scan-to-map GN iteration histogram + quantiles.  The mapping loop caps
iterations at cfg.scan2map_iters (reference: 10, lidar_mapping_node.cpp:1640)
with a dR<0.05deg / dT<0.05cm early exit (scan2map.py); if most steps run to
the cap, the convergence gate never fires and iteration count is a live
throughput lever — if they converge early, it is not.

Usage: python tools/r4_iters_hist.py out/acc_gentle_r4 [more dirs...]
"""
import collections
import json
import os
import sys

for d in sys.argv[1:]:
    path = os.path.join(d, "metrics.jsonl")
    if not os.path.exists(path):
        print(f"{d}: no metrics.jsonl")
        continue
    iters = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("stage") == "mapping" and "iters" in rec:
                iters.append(int(rec["iters"]))
    if not iters:
        print(f"{d}: no mapping records")
        continue
    hist = collections.Counter(iters)
    s = sorted(iters)
    n = len(s)
    q = lambda p: s[min(n - 1, int(p * n))]
    print(f"{d}: n={n} mean={sum(s)/n:.2f} "
          f"p50={q(0.5)} p90={q(0.9)} max={s[-1]} "
          f"hist={dict(sorted(hist.items()))}")
