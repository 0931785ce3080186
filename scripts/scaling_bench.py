"""Scaling-efficiency evidence for the north rule: the same flagship
job at two parallelism levels (local[N] vs local[4N]) on the same
input; reports throughput at both and efficiency = speedup / 4.

    python scripts/scaling_bench.py [--n-docs 2000000] [--n 8]

Writes/updates BENCH/BASELINE.md and prints the JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ensure_corpus(n_docs: int, seed: int = 42) -> str:
    os.makedirs(f"{REPO}/data", exist_ok=True)
    path = f"{REPO}/data/bench_docs_{n_docs}_{seed}"
    if not os.path.exists(path):
        from mkgmap_spark.fixtures.bulk import write_bulk_corpus

        t0 = time.time()
        write_bulk_corpus(path, n_docs, seed=seed)
        print(f"# generated {n_docs} docs in {time.time()-t0:.0f}s -> {path}", file=sys.stderr)
    return path


def run_level(cpus: int, corpus: str) -> dict:
    cmd = [
        sys.executable,
        "-m",
        "mkgmap_spark.plans.bench_job",
        "--cpus",
        str(cpus),
        "--corpus",
        corpus,
    ]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(f"bench_job failed: {out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=2_000_000)
    ap.add_argument("--n", type=int, default=8, help="small cluster size; large = 4n")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    corpus = ensure_corpus(args.n_docs)
    small, large = args.n, args.n * 4

    # interleave A/B so machine-level noise (shared host) hits both
    # parallelism levels evenly; keep the best of each
    small_runs, large_runs = [], []
    for _ in range(args.repeat):
        small_runs.append(run_level(small, corpus))
        large_runs.append(run_level(large, corpus))
    r_small = min(small_runs, key=lambda r: r["wall_s"])
    r_large = min(large_runs, key=lambda r: r["wall_s"])

    speedup = r_small["wall_s"] / r_large["wall_s"]
    efficiency = speedup / (large / small)
    summary = {
        "n_docs": args.n_docs,
        "small": r_small,
        "large": r_large,
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    print(json.dumps(summary, indent=2))

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — scaling-efficiency evidence (north rule)

Protocol (BASELINE.md): identical full flagship pipeline (decode ->
doc features -> PIP location join -> quadtree split -> assignment ->
sinks), same seeded input ({args.n_docs:,} interleaved documents, seed
42, skewed hot-spots), fresh warmed JVM per run, `local[{small}]` vs
`local[{large}]`, interleaved A/B runs.

| metric | local[{small}] | local[{large}] |
|---|---|---|
| wall (s) | {r_small['wall_s']} | {r_large['wall_s']} |
| docs/sec | {r_small['docs_per_sec']} | {r_large['docs_per_sec']} |
| tiles/sec | {r_small['tiles_per_sec']} | {r_large['tiles_per_sec']} |
| decode+prepare (s) | {r_small['t_decode_s']} | {r_large['t_decode_s']} |
| doc features (s) | {r_small.get('t_docfeat_s', '-')} | {r_large.get('t_docfeat_s', '-')} |
| PIP location join (s) | {r_small.get('t_pip_s', '-')} | {r_large.get('t_pip_s', '-')} |
| histogram+quadtree (s) | {r_small['t_split_s']} | {r_large['t_split_s']} |
| assign+write (s) | {r_small['t_assign_write_s']} | {r_large['t_assign_write_s']} |
| tiles | {r_small['n_tiles']} | {r_large['n_tiles']} |

**speedup {small}->{large} cores: {speedup:.2f}x; scaling efficiency =
speedup / {large//small} = {efficiency:.3f} (target >= 0.8:
{"PASS" if efficiency >= 0.8 else "FAIL"})**

Raw JSON:
```json
{json.dumps(summary, indent=2)}
```
"""
        )
    print(f"# wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    main()
