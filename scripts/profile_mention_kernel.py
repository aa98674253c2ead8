"""Micro-profile of the mention-extraction Python kernel.

Answers two questions the ER scaling work needs:
  1. Where does per-doc time go (CAP_SEQ scan vs preceding-map build)?
  2. Does the pure-Python kernel itself scale across processes on this
     box (multiprocessing 2 vs 8 workers over identical docs), i.e. is
     the Spark-stage scaling gap Python/memory-side or Spark-side?

Usage: taskset -c 0-7 python scripts/profile_mention_kernel.py [n_docs]
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time
from multiprocessing import Pool

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from neuronews_spark.operators.mentions import extract_mentions_py  # noqa: E402


def _docs(n_docs: int) -> list[str]:
    """Rebuild assembled conversation texts like the bench job's
    synthetic transcripts (driver-side replica, no Spark)."""
    from neuronews_spark.sources.synthetic import _text_pools

    pool, _ = _text_pools(42)
    p = len(pool)
    out = []
    base_words = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
                  "sed do eiusmod tempor incididunt ut labore et dolore").split()
    for d in range(n_docs):
        turns = []
        for t in range(20):
            h = (d * 2654435761 + t * 40503) % 2147483648
            chunk = " ".join(base_words[(t * 3 + i) % len(base_words)] for i in range(8))
            if h % 3 == 0:
                chunk += " we discussed " + pool[h % p] + " today"
            elif h % 7 == 1:
                chunk += " . " + pool[h % p] + " works at " + pool[(h + 13) % p] + " now"
            turns.append(chunk)
        out.append(" ".join(turns))
    return out


def _run(docs: list[str]) -> int:
    n = 0
    for t in docs:
        n += len(extract_mentions_py(t))
    return n


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    docs = _docs(n_docs)
    print(f"docs={len(docs)} avg_chars={sum(map(len, docs)) / len(docs):.0f}")

    # single-process timing + profile
    t0 = time.perf_counter()
    n = _run(docs)
    dt = time.perf_counter() - t0
    print(f"single-proc: {dt:.2f}s  {n_docs / dt:.0f} docs/s  mentions={n}")

    pr = cProfile.Profile()
    pr.enable()
    _run(docs[: n_docs // 4])
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(12)
    print(s.getvalue())

    # process-scaling: identical total work split over k workers
    for k in (2, 8):
        chunks = [docs[i::k] for i in range(k)]
        t0 = time.perf_counter()
        with Pool(k) as p:
            p.map(_run, chunks)
        dt = time.perf_counter() - t0
        print(f"{k}-proc: {dt:.2f}s  {n_docs / dt:.0f} docs/s")


if __name__ == "__main__":
    main()
