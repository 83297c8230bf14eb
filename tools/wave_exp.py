"""Matmul-kernel wave-factor sweep (round 4).

KPROF attribution after the per-query-dot rewrite (BASELINE.md round-4
serving table) showed each matmul kernel task spending ~1 s waiting on
the stage's JVM side — shuffle fetch plus building the task's single
Arrow input batch — a per-task CONSTANT whose total grows with task
count, while the python work itself (score 34 s, sort 5 s of task-time
for a 1600-query batch) is now minor. The doc_id hash axis is
skew-free (unlike the term axis, which needed the decode spread), so
extra waves buy no balance; they only multiply the constant. That
makes the repartition width `defaultParallelism * factor`
(csearch._matmul_score_topk, SPARK_GRAFT_MATMUL_PARTS_FACTOR) a knob
whose right value is an empirical question, not 4-by-analogy-with-the
-decode-spread.

This harness times the identical pruned batch (bench.py --query-phase,
shared on-disk 500k-doc/300k-term index) across factors, interleaved
within each rep so host drift hits all factors alike. Results land in
bench/wave_exp_latest.json and the BASELINE.md round-4 serving table.

Run AFTER the box is quiet:
    SPARK_GRAFT_SCALE_QUERIES=1600 python tools/wave_exp.py [--reps 3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
CORPUS = "/tmp/spark_graft_scaling_corpus_500000_v300000"
OUT = os.path.join(REPO, "bench", "wave_exp_latest.json")

FACTORS = (1, 2, 4)


def _run(factor: int, cpus: int) -> float:
    env = dict(os.environ)
    env["SPARK_GRAFT_MATMUL_PARTS_FACTOR"] = str(factor)
    env["SPARK_GRAFT_AGG_IMPL"] = "matmul"
    env["SPARK_GRAFT_SCALE_VOCAB"] = "300000"
    env.pop("SPARK_GRAFT_MASTER", None)
    out = subprocess.run(
        [sys.executable, BENCH, "--query-phase", CORPUS, str(cpus)],
        capture_output=True, text=True, check=True, env=env,
    )
    return float(json.loads(out.stdout.strip().splitlines()[-1])["wall_sec"])


def main() -> None:
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if not os.path.exists(CORPUS + "/_SUCCESS"):
        sys.path.insert(0, REPO)
        from bench import _scaling_corpus

        _scaling_corpus(500_000, vocab_size=300_000)
    result: dict = {"n_docs": 500_000, "vocab_size": 300_000,
                    "n_queries": int(os.environ.get(
                        "SPARK_GRAFT_SCALE_QUERIES", "1600")),
                    "factors": list(FACTORS), "reps": reps, "walls": {}}
    for cpus in (32, 8):
        for rep in range(reps):
            for factor in FACTORS:
                w = _run(factor, cpus)
                key = f"f{factor}_{cpus}"
                result["walls"].setdefault(key, []).append(w)
                print(f"rep{rep} {key}: {w:.1f}s", flush=True)
    result["best"] = {k: min(v) for k, v in result["walls"].items()}
    result["measured_unix_ts"] = round(time.time(), 1)
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
