"""Matmul feed-layout A/B: packed doc-bucket blobs vs row-per-posting.

The round-4 KPROF attribution (BASELINE.md serving section) put the
matmul stage's residual cost on the JVM side of the exchange — shuffle
fetch plus assembling each task's Arrow input from MILLIONS of
row-per-posting cells (~32 B of UnsafeRow per 20 B triple). The packed
feed (csearch._decode_pack_arrow_iter) fuses decode + term->tidx map +
doc-bucket packing into the one python decode pass and ships <=
n_tasks x part_space binary rows instead, so the exchange moves raw
numpy buffers and the Arrow feed builds thousands of cells.

This harness measures the identical pruned query batch
(bench.py --query-phase, default 1600 queries — the regime where feed
overhead dominates; override SPARK_GRAFT_SCALE_QUERIES) under
SPARK_GRAFT_MATMUL_PACK=0|1, interleaved within each rep, at 8 and 32
cores over the shared 500k-doc/300k-term design-regime index. Results
land in bench/pack_exp_latest.json and BASELINE.md.

Run AFTER the box is quiet:
    python tools/pack_exp.py [--reps 3]
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
OUT = os.path.join(REPO, "bench", "pack_exp_latest.json")


# --mode local-cluster: same A/B on REAL executor JVMs (netty shuffle),
# the mode serving-scaling run 9 could not confirm the pack in.
_LC_LEGS = {8: "local-cluster[2,4,10240]", 32: "local-cluster[8,4,10240]"}


def _run(pack: str, cpus: int, mode: str = "local") -> float:
    env = dict(os.environ)
    env["SPARK_GRAFT_MATMUL_PACK"] = pack
    env["SPARK_GRAFT_AGG_IMPL"] = "matmul"
    env["SPARK_GRAFT_SCALE_VOCAB"] = "300000"
    env.setdefault("SPARK_GRAFT_SCALE_QUERIES", "1600")
    if mode == "local-cluster":
        env["SPARK_GRAFT_MASTER"] = _LC_LEGS[cpus]
    else:
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
    mode = "local"
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
    out_path = OUT.replace("_latest", "_lc_latest") \
        if mode == "local-cluster" else OUT
    if not os.path.exists(CORPUS + "/_SUCCESS"):
        sys.path.insert(0, REPO)
        from bench import _scaling_corpus

        _scaling_corpus(500_000, vocab_size=300_000)
    result: dict = {"n_docs": 500_000, "vocab_size": 300_000,
                    "n_queries": int(os.environ.get(
                        "SPARK_GRAFT_SCALE_QUERIES", "1600")),
                    "reps": reps, "mode": mode, "walls": {}}
    if mode == "local-cluster":
        result["masters"] = {str(c): m for c, m in _LC_LEGS.items()}
    # interleave layouts within each rep so host-noise drift hits both
    for cpus in (32, 8):
        for rep in range(reps):
            for pack in ("0", "1"):
                w = _run(pack, cpus, mode)
                key = f"pack{pack}_{cpus}"
                result["walls"].setdefault(key, []).append(w)
                print(f"rep{rep} {key}: {w:.1f}s", flush=True)
    best = {k: min(v) for k, v in result["walls"].items()}
    result["best"] = best
    for cpus in (8, 32):
        r = best.get(f"pack0_{cpus}")
        p = best.get(f"pack1_{cpus}")
        if r and p:
            result[f"pack_speedup_{cpus}"] = round(r / p, 3)
    for pack in ("0", "1"):
        w8, w32 = best.get(f"pack{pack}_8"), best.get(f"pack{pack}_32")
        if w8 and w32:
            result[f"query_eff_pack{pack}"] = round((w8 / w32) / 4, 3)
    result["measured_unix_ts"] = round(time.time(), 1)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
