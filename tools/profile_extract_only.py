"""Extraction-stage-only scaling probe: mapInPandas -> noop sink.

Usage: python tools/profile_extract_only.py [n_docs] [cores...]
Interleaves legs and reports min wall per leg.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def leg(master: str, n_docs: int, rounds: int) -> float:
    from pdf_parser_spark.operators.extract import extract_stage
    from pdf_parser_spark.session import get_spark
    from pdf_parser_spark.sources.pages import synthetic_pages

    spark = get_spark("probe", master=master)
    try:
        pages = synthetic_pages(spark, n_docs=n_docs).cache()
        pages.count()
        extract_stage(synthetic_pages(spark, 32), run_ts="t").write.format(
            "noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            extract_stage(pages, run_ts="t").write.format("noop").mode(
                "overwrite").save()
            best = min(best, time.perf_counter() - t0)
        pages.unpersist()
        return best
    finally:
        spark.stop()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 9600
    cores = [int(c) for c in sys.argv[2:]] or [2, 8]
    walls: dict[int, float] = {}
    for _ in range(2):  # interleave A/B/A/B to decorrelate host noise
        for c in cores:
            w = leg(f"local[{c}]", n_docs, 1)
            walls[c] = min(walls.get(c, float("inf")), w)
            print(f"  leg local[{c}]: {w:.2f}s")
    for c, w in walls.items():
        print(f"local[{c}]: {w:.2f}s  {n_docs / w:.1f} docs/s")
    if len(cores) == 2:
        lo, hi = cores
        ratio = walls[lo] / walls[hi]
        print(f"speedup {ratio:.2f}x, efficiency {(ratio / (hi / lo)):.3f}")


if __name__ == "__main__":
    main()
