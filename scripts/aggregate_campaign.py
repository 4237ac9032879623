#!/usr/bin/env python
"""Aggregate the accuracy-campaign JSONs (/tmp/*_results.json,
/tmp/ref_manhattan_seed*.json) into the BENCHMARKS.md current-state
tables: per-workload medians over RNG streams, with reference seed
spreads beside ours."""
import glob
import json
import os

import numpy as np


def load(path):
    with open(path) as fh:
        return json.load(fh)


def fmt_spread(vals, nd=2):
    v = np.asarray(vals, dtype=float)
    return (f"{np.median(v):.{nd}f} "
            f"[{v.min():.{nd}f}, {v.max():.{nd}f}] (n={len(v)})")


def lawnmower():
    ours_t, ours_l, totals = [], [], []
    d0 = load("/tmp/manhattan_results.json")
    ours_t.append(d0["steady"]["trans_rmse"])
    ours_l.append(d0["steady"]["landmark_rmse"])
    for p in sorted(glob.glob("/tmp/manhattan_seed*_results.json")):
        d = load(p)["steady"]
        ours_t.append(d["trans_rmse"])
        ours_l.append(d["landmark_rmse"])
    ref_t, ref_l, ref_total = [], [], []
    for p in sorted(glob.glob("/tmp/ref_manhattan_seed*.json")):
        d = load(p)
        ref_t.append(d["trans_rmse"])
        lm = [v for k, v in d["per_var_err"].items() if k.startswith("L")]
        ref_l.append(float(np.sqrt(np.mean(np.square(lm)))))
        ref_total.append(d["total_s"])
    print("## lawnmower_4x4 (ours vs measured reference, per-seed spread)")
    print(f"ours   trans RMSE: {fmt_spread(ours_t)}   "
          f"landmark RMSE: {fmt_spread(ours_l)}")
    print(f"ref    trans RMSE: {fmt_spread(ref_t)}   "
          f"landmark RMSE: {fmt_spread(ref_l)}")
    print(f"ours steady {d0['steady']['total_s']}s / cold "
          f"{d0['cold']['total_s']}s; ref total {fmt_spread(ref_total, 0)}s")
    print(f"speedup vs ref median: steady "
          f"{np.median(ref_total)/d0['steady']['total_s']:.0f}x, cold "
          f"{np.median(ref_total)/d0['cold']['total_s']:.1f}x")
    print(f"posterior samples/sec/chip (steady): "
          f"{d0['steady']['posterior_samples_per_sec_per_chip']:.0f}")


def plaza():
    print("\n## Plaza family (median over seeds)")
    for ds in ("plaza1", "plaza2", "plaza1_ada0.2", "plaza1_ada0.4",
               "plaza1_ada0.6"):
        rows = []
        for p in ([f"/tmp/{ds}_results.json"] +
                  sorted(glob.glob(f"/tmp/{ds}_seed*_results.json"))):
            if os.path.exists(p):
                rows.append(load(p))
        if not rows:
            continue
        rmse = [r["trans_rmse"] for r in rows]
        med = [r["median_step_s"] for r in rows]
        tot = [r["total_s"] for r in rows]
        line = (f"{ds:15s} steps {rows[0]['n_steps']:4d}  "
                f"trans RMSE {fmt_spread(rmse)}  "
                f"median step {np.median(med):.3f}s  "
                f"total {fmt_spread(tot, 0)}s")
        hypo = [r.get("hypo_final") for r in rows
                if r.get("hypo_final")]
        if hypo:
            line += (f"  DA true-weight "
                     f"{fmt_spread([h['mean_true_weight'] for h in hypo])}"
                     f" resolved "
                     f"{fmt_spread([h['resolved_frac'] for h in hypo])}")
        print(line)


def manhattan_plaza():
    p = "/tmp/manhattan_plaza_results.json"
    if not os.path.exists(p):
        return
    d = load(p)
    print("\n## manhattan_plaza")
    print(json.dumps(d, indent=1))


if __name__ == "__main__":
    lawnmower()
    plaza()
    manhattan_plaza()
