#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule).

No real cluster exists in this sandbox, so the criterion — throughput
scaling efficiency >= 0.8 between N and 4N executors — is evidenced by
running the IDENTICAL flagship job (bench.py --flagship-only) at two
parallelism levels on the same input, each in a fresh JVM, and reporting

    efficiency = throughput_4N / (4 * throughput_N)

Also runs a raw-CPU control (pure multiprocessing md5 burn) at the same
process counts: the host VM's frequency scaling caps even embarrassingly
parallel python at <1.0, and engine efficiency should be read against that
ceiling. Writes BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [--n-docs 10000] [--pairs 2,8 8,32]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _burn(n: int) -> int:
    h = b"x"
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return 1


def raw_cpu_throughput(procs: int, tasks: int = 64, repeat: int = 3) -> float:
    best = 0.0
    with mp.Pool(procs) as p:
        p.map(_burn, [100000] * procs)  # warm the pool
        for _ in range(repeat):
            t0 = time.monotonic()
            p.map(_burn, [600000] * tasks)
            best = max(best, tasks / (time.monotonic() - t0))
    return best


def run_flagship(cpus: int, n_docs: int, repeat: int = 3) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "bench.py"),
            "--flagship-only",
            "--cpus",
            str(cpus),
            "--n-docs",
            str(n_docs),
            "--repeat",
            str(repeat),
        ],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=10000)
    ap.add_argument(
        "--pairs", nargs="*", default=["2,8", "8,32"], help="N,4N core pairs"
    )
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    pairs = [tuple(int(x) for x in p.split(",")) for p in args.pairs]
    levels = sorted({c for p in pairs for c in p})

    engine: dict[int, dict] = {}
    for cpus in levels:
        engine[cpus] = run_flagship(cpus, args.n_docs, repeat=args.repeat)
        print(f"local[{cpus}]: {engine[cpus]['extraction_docs_per_sec']} docs/s", flush=True)

    raw: dict[int, float] = {c: raw_cpu_throughput(c) for c in levels}
    for c in levels:
        print(f"raw cpu {c} procs: {raw[c]:.1f} tasks/s", flush=True)

    lines = [
        "# BENCH — engine throughput + two-cluster-size scaling evidence",
        "",
        f"Flagship extraction pipeline (`bench.py --flagship-only`) over the "
        f"deterministic synthetic interleaved corpus, n_docs={args.n_docs}, "
        f"same input at every level; fresh JVM per level; best of {args.repeat} "
        "runs (steady state); 3 shuffle partitions per core.",
        "",
        "## Engine throughput by parallelism",
        "",
        "| cores | wall (s) | docs/s |",
        "|---|---|---|",
    ]
    for c in levels:
        e = engine[c]
        lines.append(f"| local[{c}] | {e['queries']['extraction_pipeline']} | {e['extraction_docs_per_sec']} |")
    lines += [
        "",
        "## Scaling efficiency (north rule: ≥ 0.8 between N and 4N)",
        "",
        "| pair (N → 4N) | engine eff = T(4N)/(4·T(N)) | raw-CPU host ceiling* | engine / ceiling |",
        "|---|---|---|---|",
    ]
    results = {}
    for n, n4 in pairs:
        eff = engine[n4]["extraction_docs_per_sec"] / (4 * engine[n]["extraction_docs_per_sec"])
        ceiling = raw[n4] / (4 * raw[n])
        results[f"{n}->{n4}"] = {
            "engine_eff": round(eff, 3),
            "raw_ceiling": round(ceiling, 3),
            "normalized": round(eff / ceiling, 3),
        }
        lines.append(
            f"| local[{n}] → local[{n4}] | **{eff:.3f}** | {ceiling:.3f} | {eff / ceiling:.3f} |"
        )
    lines += [
        "",
        "\\* Raw-CPU control: pure `multiprocessing` md5 burn at the same "
        "process counts. This host VM's frequency scaling / CPU sharing caps "
        "even embarrassingly parallel Python below 1.0 — engine efficiency "
        "must be read against this ceiling, not against the theoretical 1.0. "
        "On a real multi-executor cluster (N and 4N machines, per the north "
        "rule) each executor keeps its own clock and the ceiling is ~1.0.",
        "",
        "Machine: "
        f"{os.cpu_count()} cores, single host, Spark local mode "
        "(multi-executor design: all shuffles keyed, no driver-side loops, "
        "dims broadcast).",
        "",
        "```json",
        json.dumps(
            {
                "n_docs": args.n_docs,
                "levels": {
                    str(c): {
                        "wall_sec": engine[c]["queries"]["extraction_pipeline"],
                        "docs_per_sec": engine[c]["extraction_docs_per_sec"],
                        "raw_cpu_tasks_per_sec": round(raw[c], 2),
                        # per-level canaries: a level measured in a degraded
                        # host window (observed: local[8] 966 vs 1537 docs/s
                        # minutes apart) is visible in the record instead of
                        # masquerading as an engine scaling defect
                        "host_canary_sec": engine[c].get("host_canary_sec"),
                        "host_canary_end_sec": engine[c].get("host_canary_end_sec"),
                        "py_canary_sec": engine[c].get("py_canary_sec"),
                        "io_canary_sec": engine[c].get("io_canary_sec"),
                    }
                    for c in levels
                },
                "efficiency": results,
            },
            indent=2,
        ),
        "```",
        "",
    ]
    out = REPO / "BENCH"
    out.mkdir(exist_ok=True)
    target = out / "BASELINE.md"
    # the per-round narrative sections ("## Round ...") are appended by
    # hand below the generated block — preserve them across regeneration
    tail = ""
    if target.exists():
        prev = target.read_text()
        idx = prev.find("\n## Round")
        if idx != -1:
            tail = prev[idx:]
    target.write_text("\n".join(lines) + tail)
    print(f"wrote {target}")
    for k, v in results.items():
        print(k, v)


if __name__ == "__main__":
    main()
