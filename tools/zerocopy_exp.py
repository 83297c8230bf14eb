"""Microbench the zero-copy payload path (round-4 verdict #7).

Builds one hot-term posting row (multi-MB payload), stores it in an
Arrow BinaryArray cell the way the serving kernels receive it, and
times decode_blocked fed by `.as_py()` (a bytes copy per cell — the
round-4 kernel behavior) vs `.as_buffer()` (a pa.Buffer view — the
round-5 kernels). Also times the batch decoder over many such rows.
Interleaved reps, best-of reported. No Spark: this isolates the
per-cell copy, which is the only thing the kernel change touches.

Usage: python tools/zerocopy_exp.py [--docs N] [--rows R] [--reps K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from engine.codec import decode_blocked, decode_blocked_batch  # noqa: E402
from engine.codec import encode_blocked  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000,
                    help="postings in the hot row")
    ap.add_argument("--rows", type=int, default=64,
                    help="rows for the batch-decode leg")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(11)
    d = np.cumsum(rng.integers(1, 9, args.docs).astype(np.uint64))
    tf = rng.integers(1, 40, args.docs).astype(np.uint64)
    dl = rng.integers(10, 500, args.docs).astype(np.uint64)
    enc = encode_blocked(d, tf, dl, avgdl=150.0)
    payload_mb = round(sum(len(enc[k]) for k in
                           ("doc_bytes", "tf_bytes", "dl_bytes")) / 2**20, 1)
    arr = {k: pa.array([enc[k]] * args.rows, type=pa.binary())
           for k in ("doc_bytes", "tf_bytes", "dl_bytes")}
    offs = (enc["doc_off"], enc["tf_off"], enc["dl_off"])

    def t_single(get):
        t0 = time.perf_counter()
        decode_blocked(get(arr["doc_bytes"][0]), get(arr["tf_bytes"][0]),
                       get(arr["dl_bytes"][0]), *offs)
        return time.perf_counter() - t0

    def t_batch(get):
        t0 = time.perf_counter()
        decode_blocked_batch(
            [get(arr["doc_bytes"][i]) for i in range(args.rows)],
            [get(arr["tf_bytes"][i]) for i in range(args.rows)],
            [get(arr["dl_bytes"][i]) for i in range(args.rows)],
            [enc["doc_off"]] * args.rows, [args.docs] * args.rows)
        return time.perf_counter() - t0

    res = {"docs": args.docs, "rows": args.rows, "reps": args.reps,
           "payload_mb_per_row": payload_mb}
    for name, fn in (("single", t_single), ("batch", t_batch)):
        copy_w, buf_w = [], []
        for _ in range(args.reps):  # interleaved
            copy_w.append(fn(lambda c: c.as_py()))
            buf_w.append(fn(lambda c: c.as_buffer()))
        res[f"{name}_as_py_best"] = round(min(copy_w), 4)
        res[f"{name}_as_buffer_best"] = round(min(buf_w), 4)
        res[f"{name}_speedup"] = round(min(copy_w) / min(buf_w), 3)
    with open(os.path.join(REPO, "bench", "zerocopy_exp_latest.json"),
              "w") as fh:
        json.dump(res, fh)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
