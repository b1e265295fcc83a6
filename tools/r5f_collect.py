"""Collect the r5f final-validation summaries into PARITY-ready tables.

Usage: python tools/r5f_collect.py [suffix]   (default suffix: r5f)

Prints one markdown row per completed out/acc_<tag>_<suffix>/summary.json,
in queue order, plus a delta column vs the matching _r5 run when present.
"""
import json
import os
import sys

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "r5f"

ORDER = [
    "gentle", "turny", "loop", "loop_radius", "hdl64", "hdl64_bigloop",
    "gentle_c32", "loop_c32",
    "bigloop_odo", "bigloop_radius", "bigloop_window", "bigloop_lc",
    "bigloop_lcrad",
    "bigloop2_odo", "bigloop2_radius", "bigloop2_window", "bigloop2_lc",
    "bigloop2_lcrad",
    "bigloop3_odo", "bigloop3_radius", "bigloop3_window", "bigloop3_lc",
    "bigloop3_lcrad", "bigloop3_lcradfit",
]


def load(tag, suffix):
    p = os.path.join("out", f"acc_{tag}_{suffix}", "summary.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def fmt(v):
    return "—" if v is None else (f"{v:.4f}" if isinstance(v, float) else str(v))


print(f"| run | ATE | RPE | ate_kf | loops (applied) | scans/s | ATE Δ vs r5 |")
print("|---|---|---|---|---|---|---|")
for tag in ORDER:
    s = load(tag, SUFFIX)
    if s is None:
        continue
    old = load(tag, "r5")
    delta = "—"
    if old and old.get("ate_rmse_m"):
        delta = f"{s['ate_rmse_m'] - old['ate_rmse_m']:+.4f}"
    loops = f"{s.get('loops', 0)} ({s.get('loops_applied', 0)})"
    print(f"| {tag} | {fmt(s.get('ate_rmse_m'))} | {fmt(s.get('rpe_m'))} | "
          f"{fmt(s.get('ate_kf_m'))} | {loops} | {s.get('scans_per_sec')} | "
          f"{delta} |")
