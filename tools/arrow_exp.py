"""mapInArrow vs mapInPandas encode-kernel A/B (VERDICT r3 item 1).

The three round-3 local-cluster scaling runs isolated the Arrow+Python
encode stage as the non-scaling component of the 1M-doc build. This
harness measures the mapInArrow port against the original mapInPandas
kernel with the identical plan (same corpus, same shuffle, noop sink),
plus a full-build A/B — results land in bench/arrow_exp_latest.json
and BASELINE.md.

Run AFTER the box is quiet:
    python tools/arrow_exp.py [--reps 3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
CORPUS = "/tmp/spark_graft_scaling_corpus_1000000"
OUT = os.path.join(REPO, "bench", "arrow_exp_latest.json")


def _run(phase: str, impl: str, cpus: int) -> float:
    env = dict(os.environ)
    env["SPARK_GRAFT_ENCODE_IMPL"] = impl
    env.pop("SPARK_GRAFT_MASTER", None)
    out = subprocess.run(
        [sys.executable, BENCH, f"--{phase}", CORPUS, str(cpus)],
        capture_output=True, text=True, check=True, env=env,
    )
    line = out.stdout.strip().splitlines()[-1]
    if phase == "scaling-build":
        return float(json.loads(line)["wall_sec"])
    return float(line)


def main() -> None:
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if not os.path.exists(CORPUS + "/_SUCCESS"):
        sys.path.insert(0, REPO)
        from bench import _scaling_corpus

        _scaling_corpus(1_000_000)
    result: dict = {"n_docs": 1_000_000, "reps": reps, "walls": {}}
    # interleave impls within each rep so host-noise drift hits both
    for phase in ("encode-phase", "scaling-build"):
        cpus_list = (8, 32) if phase == "encode-phase" else (32,)
        for cpus in cpus_list:
            for rep in range(reps):
                for impl in ("pandas", "arrow"):
                    w = _run(phase, impl, cpus)
                    key = f"{phase}_{impl}_{cpus}"
                    result["walls"].setdefault(key, []).append(w)
                    print(f"rep{rep} {key}: {w:.1f}s", flush=True)
    best = {k: min(v) for k, v in result["walls"].items()}
    result["best"] = best
    for cpus in (8, 32):
        p = best.get(f"encode-phase_pandas_{cpus}")
        a = best.get(f"encode-phase_arrow_{cpus}")
        if p and a:
            result[f"encode_speedup_{cpus}"] = round(p / a, 3)
    p = best.get("scaling-build_pandas_32")
    a = best.get("scaling-build_arrow_32")
    if p and a:
        result["build_speedup_32"] = round(p / a, 3)
    ep8 = best.get("encode-phase_pandas_8")
    ep32 = best.get("encode-phase_pandas_32")
    ea8 = best.get("encode-phase_arrow_8")
    ea32 = best.get("encode-phase_arrow_32")
    if ep8 and ep32:
        result["encode_eff_pandas"] = round((ep8 / ep32) / 4, 3)
    if ea8 and ea32:
        result["encode_eff_arrow"] = round((ea8 / ea32) / 4, 3)
    result["measured_unix_ts"] = round(time.time(), 1)
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
