"""Two-cluster-size scaling run: the north rule's N vs 4N criterion.

No real cluster exists in this sandbox, so per the BASELINE.md evidence plan
the same job runs at two parallelism levels — ``local[8]`` and ``local[32]``
on identical input — and we report throughput at both plus
``efficiency = (rows/sec @ 32) / (4 x rows/sec @ 8)``.

Each level runs in a fresh JVM (subprocess) ``--runs`` times; the best run
per level is kept (the sandbox VM shows 2-4x noisy-neighbor variance).
Writes BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [--sf-dir DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str, runs: int) -> dict:
    best = None
    for i in range(runs):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_WORKDIR=f"/tmp/llb_scale_{cpus}",
            SPARK_GRAFT_BENCH_REPEATS="2",
            SPARK_GRAFT_BENCH_MULT=os.environ.get("SPARK_GRAFT_BENCH_MULT", "4"),
        )
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        rec["wall"] = round(time.time() - t0, 1)
        print(f"local[{cpus}] run {i}: {rec['queries']} rps={rec['rows_per_sec']}")
        if best is None or rec["value"] < best["value"]:
            best = rec
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--levels", default="8,32")
    args = ap.parse_args()

    lo, hi = (int(x) for x in args.levels.split(","))
    res_lo = run_level(lo, args.sf_dir, args.runs)
    res_hi = run_level(hi, args.sf_dir, args.runs)

    factor = hi / lo
    eff_pipeline = res_hi["rows_per_sec"] / (factor * res_lo["rows_per_sec"])
    eff_total = (res_lo["value"] / res_hi["value"]) / factor

    md = f"""# BENCH — two-cluster-size scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox evidence (no real cluster): the same job on the SAME
input (deterministic synthetic pages, fixed 128-partition parquet) at
local[{lo}] vs local[{hi}] cores, fresh JVM each, best of {args.runs} runs per
level (the VM shows noisy-neighbor variance; min measures the engine).

| metric | local[{lo}] (N) | local[{hi}] (4N) | efficiency |
|---|---|---|---|
| headline pipeline rows/sec (extract -> PIP join -> tile rollup) | {res_lo['rows_per_sec']} | {res_hi['rows_per_sec']} | **{eff_pipeline:.3f}** |
| total bench wall time (sec, 4 queries) | {res_lo['value']} | {res_hi['value']} | {eff_total:.3f} |

Per-query seconds:

| query | local[{lo}] | local[{hi}] | speedup |
|---|---|---|---|
"""
    for q in res_lo["queries"]:
        a, b = res_lo["queries"][q], res_hi["queries"][q]
        md += f"| {q} | {a} | {b} | {a / b:.2f}x |\n"
    md += f"""
- input: {res_lo['rows']} pages (sf={res_lo['sf']}), 60% clustered into 3 urban cells (skew on)
- efficiency definition: (rows/sec @ 4N) / ({factor:.0f} x rows/sec @ N)
- raw JSON: see BENCH/raw_{lo}.json, BENCH/raw_{hi}.json
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", f"raw_{lo}.json"), "w") as f:
        json.dump(res_lo, f, indent=2)
    with open(os.path.join(REPO, "BENCH", f"raw_{hi}.json"), "w") as f:
        json.dump(res_hi, f, indent=2)
    print(md)


if __name__ == "__main__":
    main()
