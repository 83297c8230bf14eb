"""A/B the build's combine dataflow at design regime (BASELINE.md):

  * combine='shuffle' — repartition("shard","tid") of raw token rows
    (28 B/row, one per token occurrence) before the encode kernel;
  * combine='mapside' — encode per scan partition (no token exchange),
    merge combines compressed partial payloads by term.

Runs interleaved build legs (subprocess per leg, same protocol as
bench.py --scaling) on the shared scaling corpus at both cluster
sizes. Usage:

    python tools/combine_exp.py [--docs 1000000] [--vocab 300000]
        [--mode local-cluster] [--reps 2]

Results -> bench/combine_exp_latest.json (+ printed table).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "bench", "combine_exp_latest.json")


def _arg(name, default):
    if name in sys.argv:
        i = sys.argv.index(name)
        if i + 1 >= len(sys.argv):
            sys.exit(f"usage: {name} requires a value "
                     f"(--docs N --vocab N --mode M --reps N)")
        return sys.argv[i + 1]
    return default


def main():
    docs = int(_arg("--docs", "1000000"))
    vocab = int(_arg("--vocab", "300000"))
    mode = _arg("--mode", "local-cluster")
    reps = int(_arg("--reps", "2"))
    import bench

    corpus = bench._scaling_corpus(docs, vocab)
    if mode == "local-cluster":
        mem = int(os.environ.get("SPARK_GRAFT_LC_MEM_MB", "10240"))
        masters = {8: f"local-cluster[2,4,{mem}]",
                   32: f"local-cluster[8,4,{mem}]"}
    else:
        masters = {8: "local[8]", 32: "local[32]"}

    runs: list[dict] = []
    for rep in range(reps):
        for cpus in (8, 32):
            for combine in ("mapside", "shuffle"):
                env = dict(os.environ)
                env["SPARK_GRAFT_MASTER"] = masters[cpus]
                env["SPARK_GRAFT_BUILD_COMBINE"] = combine
                t0 = time.time()
                p = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py"),
                     "--scaling-build", corpus, str(cpus)],
                    capture_output=True, text=True, env=env)
                if p.returncode != 0:
                    print(p.stdout[-2000:], p.stderr[-2000:])
                    raise SystemExit(f"leg failed: {combine}@{cpus}")
                row = json.loads(p.stdout.strip().splitlines()[-1])
                row.update(combine=combine, rep=rep,
                           leg_wall=round(time.time() - t0, 1))
                runs.append(row)
                print(json.dumps(row))

    def best(combine, cpus):
        ws = [r["wall_sec"] for r in runs
              if r["combine"] == combine and r["cpus"] == cpus]
        return min(ws) if ws else None

    summary = {
        "metric": f"build combine A/B ({mode}, {docs} docs, "
                  f"vocab {vocab}, best-of-{reps} interleaved)",
        "masters": masters,
        "best": {c: {str(n): best(c, n) for n in (8, 32)}
                 for c in ("mapside", "shuffle")},
        "runs": runs,
        "measured_unix_ts": round(time.time(), 1),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["best"]))


if __name__ == "__main__":
    main()
