#!/usr/bin/env python
"""Sequential measurement campaign: every benchmark in BENCHMARKS.md,
run end-to-end, with per-run JSONs copied into ``results/`` (committed)
so the doc can be REGENERATED from artifacts (``gen_benchmarks.py``)
instead of hand-transcribed — the round-2/3 drift disease's fix.

One TPU consumer at a time: runs are strictly sequential.

Usage: python scripts/run_campaign.py [--only A,B,...] [--skip A,B,...]
Groups: bench, lawnmower, plaza, plaza_ada6_defer, manhattan_plaza, native,
        random4x4, case1_da, profile, scale
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RESULTS = os.path.join(REPO, "results")


def run(cmd, timeout=7200, tag="", ignore_rc=(0,)):
    print(f"== {tag or ' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=timeout)
    dt = time.time() - t0
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-6:])
    print(f"   rc={r.returncode} ({dt:.0f}s)\n{tail}", flush=True)
    if r.returncode not in ignore_rc:
        print(f"!! {tag} failed", flush=True)
    return r


def keep(tmp_path, name):
    if os.path.exists(tmp_path):
        shutil.copy(tmp_path, os.path.join(RESULTS, name))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))
    skip = set(filter(None, args.skip.split(",")))

    def want(g):
        return (not only or g in only) and g not in skip

    os.makedirs(RESULTS, exist_ok=True)
    py = sys.executable

    if want("bench"):
        r = run([py, "bench.py"], tag="bench case1")
        line = [l for l in r.stdout.splitlines()
                if l.startswith("{")][-1:]
        if line:
            with open(os.path.join(RESULTS, "bench_case1.json"),
                      "w") as fh:
                fh.write(line[0] + "\n")

    if want("lawnmower"):
        run([py, "scripts/manhattan_run.py"], tag="lawnmower cold+steady")
        keep("/tmp/manhattan_results.json", "lawnmower.json")
        for seed in (1, 2, 3, 4):
            run([py, "scripts/manhattan_run.py", str(seed)],
                tag=f"lawnmower seed {seed}")
            keep(f"/tmp/manhattan_seed{seed}_results.json",
                 f"lawnmower_seed{seed}.json")

    if want("plaza"):
        for ds in ("plaza1", "plaza2", "plaza1_ada0.2", "plaza1_ada0.4",
                   "plaza1_ada0.6"):
            for seed in (0, 1, 2):
                run([py, "scripts/plaza_family_run.py", ds, str(seed)],
                    tag=f"{ds} seed {seed}", ignore_rc=(0, 2))
                suffix = "" if seed == 0 else f"_seed{seed}"
                keep(f"/tmp/{ds}{suffix}_results.json",
                     f"{ds}{suffix}.json")

    if want("plaza_ada6_defer"):
        for seed in (0, 1, 2):
            run([py, "scripts/plaza_family_run.py", "plaza1_ada0.6",
                 str(seed), "--defer-da"],
                tag=f"plaza1_ada0.6 defer-da seed {seed}",
                ignore_rc=(0, 2))
            suffix = ("" if seed == 0 else f"_seed{seed}") + "_deferda"
            keep(f"/tmp/plaza1_ada0.6{suffix}_results.json",
                 f"plaza1_ada0.6{suffix}.json")

    if want("manhattan_plaza"):
        run([py, "scripts/manhattan_plaza_run.py"], tag="manhattan_plaza")
        keep("/tmp/manhattan_plaza_results.json", "manhattan_plaza.json")

    if want("random4x4"):
        run([py, "scripts/random_4x4_sweep.py"], tag="random_4x4 sweep")
        keep("/tmp/random4x4_sweep.json", "random_4x4_sweep.json")

    if want("case1_da"):
        run([py, "scripts/case1_da_run.py"], tag="case1_da")
        keep("/tmp/case1_da_results.json", "case1_da.json")

    if want("native"):
        r = run(["make", "-s", "-C", "native", "fg_solver"],
                tag="build fg_solver")
        rows = {}
        for ds in ("case1", "lawnmower_4x4"):
            fg = os.path.join(REPO, "data", f"{ds}_factor_graph.fg")
            r = run([os.path.join(REPO, "native", "fg_solver"), fg],
                    tag=f"fg_solver {ds}")
            line = [l for l in r.stdout.splitlines()
                    if l.startswith("{")]
            if line:
                rows[ds] = json.loads(line[-1])
        with open(os.path.join(RESULTS, "native_fg_solver.json"),
                  "w") as fh:
            json.dump(rows, fh, indent=1)

    if want("profile"):
        run([py, "scripts/profile_utilization.py"], tag="utilization")
        keep(os.path.join(REPO, "PROFILE.json"), "profile.json")

    if want("scale"):
        base = ["scripts/manhattan_scale_run.py", "--grid", "16",
                "--landmarks", "6", "--range-prob", "1.0", "--sensing",
                "0", "--traj", "random_walk", "--waypoints", "1100",
                "--ordering", "pose_first"]
        p = "/tmp/manhattan_scale_g16_l6_ada0.2_rp1_rw_results.json"
        if not os.path.exists(p):
            run([py] + base, timeout=14000,
                tag="manhattan scale 1k poses", ignore_rc=(0, 1))
        keep(p, "manhattan_scale.json")
        pd = ("/tmp/manhattan_scale_g16_l6_ada0.2_rp1_rw_deferda"
              "_results.json")
        if not os.path.exists(pd):
            run([py] + base + ["--defer-da"], timeout=14000,
                tag="manhattan scale 1k poses, defer-da arm",
                ignore_rc=(0, 1))
        keep(pd, "manhattan_scale_deferda.json")

    run([py, "scripts/gen_benchmarks.py"], tag="regenerate BENCHMARKS.md")
    print("campaign done", flush=True)


if __name__ == "__main__":
    main()
