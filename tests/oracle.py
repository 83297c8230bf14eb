"""Pure-Python/pandas BM25 oracle (SURVEY.md section 5.2).

Implements the scoring spec of SURVEY.md section 7.1 exactly and
independently of Spark — this is the golden truth for rank-identity:

    idf(t)      = ln(1 + (N - df + 0.5)/(df + 0.5))
    tf_part     = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(q,d)  = sum_t qtf(t) * idf(t) * tf_part(t,d)
    order       = score DESC, doc_id ASC
"""

from __future__ import annotations

import math
import re
from collections import Counter

STOP = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)
_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return [t for t in _RE.findall((text or "").lower()) if t not in STOP]


def bm25_topk(
    docs: list[tuple[int, str]],
    queries: list[tuple[str, str]],
    k: int = 100,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[tuple[str, int, float, int]]:
    """Returns [(query_id, doc_id, score, rank)] sorted per query."""
    toks = {d: tokenize(t) for d, t in docs}
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n if n else 0.0
    tf: dict[str, Counter] = {}
    df: Counter = Counter()
    for d, ts in toks.items():
        c = Counter(ts)
        for term, f in c.items():
            tf.setdefault(term, Counter())[d] = f
            df[term] += 1

    out: list[tuple[str, int, float, int]] = []
    for qid, qtext in queries:
        qtf = Counter(tokenize(qtext))
        scores: dict[int, float] = {}
        for term, q_f in qtf.items():
            if term not in tf:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, f in tf[term].items():
                part = f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dl[d] / avgdl))
                scores[d] = scores.get(d, 0.0) + q_f * idf * part
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend((qid, d, s, i + 1) for i, (d, s) in enumerate(ranked))
    return out
