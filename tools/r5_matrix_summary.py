"""Collect the round-5 accuracy runs into the PARITY.md matrix tables.

Usage: python tools/r5_matrix_summary.py   (host-only; reads out/acc_*_r5)
"""
import json
import os

OUT = "out"


def load(tag):
    p = os.path.join(OUT, f"acc_{tag}_r5", "summary.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def fmt(v):
    return "—" if v is None else (f"{v:.4f}" if isinstance(v, float) else str(v))


def main():
    print("## bigloop necessity matrix (causal ATE / final-map ate_kf, m)\n")
    print("| course | mode | ATE (causal) | RPE | ate_kf (final map) | "
          "loops (applied) | scans/s |")
    print("|---|---|---|---|---|---|---|")
    for course in ("bigloop", "bigloop2", "bigloop3"):
        for mode in ("odo", "radius", "window", "lc", "lcrad", "lcfrac",
                     "lcfit", "lcfitrw", "lcrw15", "lcradfit"):
            s = load(f"{course}_{mode}")
            if s is None:
                continue
            loops = (f"{s.get('loops')} ({s.get('loops_applied')})"
                     if s.get("loops") is not None else "—")
            print(f"| {course} | {mode} | {fmt(s.get('ate_rmse_m'))} | "
                  f"{fmt(s.get('rpe_m'))} | {fmt(s.get('ate_kf_m'))} | "
                  f"{loops} | {s.get('scans_per_sec')} |")

    print("\n## regression set\n")
    print("| run | ATE | RPE | ate_kf | loops (applied) | scans/s |")
    print("|---|---|---|---|---|---|")
    for tag in ("gentle", "turny", "loop", "loop_radius", "hdl64",
                "hdl64b", "hdl64c", "gentle_c32", "loop_c32"):
        s = load(tag)
        if s is None:
            continue
        loops = (f"{s.get('loops')} ({s.get('loops_applied')})"
                 if s.get("loops") is not None else "—")
        print(f"| {tag} | {fmt(s.get('ate_rmse_m'))} | {fmt(s.get('rpe_m'))} "
              f"| {fmt(s.get('ate_kf_m'))} | {loops} | "
              f"{s.get('scans_per_sec')} |")


if __name__ == "__main__":
    main()
