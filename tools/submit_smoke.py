"""spark-submit --py-files packaging smoke (north_rule literal:
"runs via spark-submit --py-files on a multi-executor cluster").

Everything else in the repo imports engine/ from the local filesystem;
this harness proves the DISTRIBUTION story: it zips engine/ into
engine.zip, copies cli.py alone into an empty working directory (so
`engine` is importable ONLY from the zip), and runs

    spark-submit --master <master> --py-files engine.zip cli.py \
        index --gen N --out idx
    spark-submit ... cli.py stats --index idx
    spark-submit ... cli.py query --index idx --query "..." --k 5

With --master local-cluster[2,2,2048] (the default) the executors are
real separate JVMs whose Python workers must resolve engine.* from the
shipped zip — the same mechanism a production cluster uses; the driver
resolves it from spark-submit's PYTHONPATH injection. PYTHONPATH is
scrubbed from the child environment so nothing can leak in from the
repo checkout.

Prints one JSON line; exits non-zero on any failed step.
Run: python tools/submit_smoke.py [--master local[4]] [--docs 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    exe = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                       "spark-submit")
    if not os.path.exists(exe):
        raise RuntimeError("spark-submit not found on PATH or in pyspark")
    return exe


def _zip_engine(dest: str) -> None:
    """engine/ -> dest zip with the package dir at the zip root, so
    `import engine` resolves when the zip is on sys.path."""
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "engine")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))


def run_smoke(master: str, n_docs: int, keep: bool = False) -> dict:
    work = tempfile.mkdtemp(prefix="submit_smoke_")
    result: dict = {"master": master, "n_docs": n_docs, "workdir": work}
    try:
        _zip_engine(os.path.join(work, "engine.zip"))
        shutil.copy(os.path.join(REPO, "cli.py"), work)
        # the working dir holds ONLY cli.py + engine.zip: any successful
        # `import engine` below came from --py-files, not the checkout
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        idx = os.path.join(work, "idx")
        base = [_spark_submit(), "--master", master,
                "--py-files", "engine.zip",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--driver-memory", "4g",
                "cli.py"]

        def step(name: str, args: list[str]) -> str:
            t0 = time.time()
            p = subprocess.run(base + args, cwd=work, env=env,
                               capture_output=True, text=True, timeout=900)
            result[name + "_wall_sec"] = round(time.time() - t0, 1)
            if p.returncode != 0:
                result["failed_step"] = name
                result["stderr_tail"] = p.stderr[-2000:]
                raise RuntimeError(f"{name} failed rc={p.returncode}")
            return p.stdout

        out = step("index", ["index", "--gen", str(n_docs), "--out", idx,
                             "--shards", "4"])
        result["index"] = json.loads(out.strip().splitlines()[-1])
        out = step("stats", ["stats", "--index", idx])
        result["stats"] = json.loads(out.strip().splitlines()[-1])
        out = step("query", ["query", "--index", idx,
                             "--query", "def class import", "--k", "5"])
        hits = [ln for ln in out.strip().splitlines() if "\t" in ln]
        result["query_hits"] = len(hits)
        result["top_hit"] = hits[0] if hits else None
        ok = (result["index"]["n_docs"] == n_docs
              and result["index"]["merged"]
              and result["stats"].get("n_docs") == n_docs
              and result["query_hits"] >= 1)
        result["ok"] = bool(ok)
    except Exception as e:  # noqa: BLE001 — smoke reports, caller exits
        result["ok"] = False
        result.setdefault("error", repr(e))
    finally:
        if not keep:
            shutil.rmtree(work, ignore_errors=True)
            result.pop("workdir", None)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,2,2048]")
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    res = run_smoke(args.master, args.docs, keep=args.keep)
    print(json.dumps(res))
    sys.exit(0 if res.get("ok") else 1)
