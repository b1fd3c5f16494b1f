"""HNSW at SIFT1M scale: bulk build + seeded/classic beam sweep (VERDICT r3 #2/#9).

The reference's flagship HNSW baseline is SIFT1M — build 5,000 s (~200
vec/s), 0.84 ms/query @ 97.8% recall@100 at efSearch=200
(/root/reference/docs/INDEX.md:1937-1975). This script produces the
committed 1M rows: bulk-build wall time, then QPS + recall@100 for the
IVF-seeded beam (iteration sweep) and the classic entry-point beam.

Run on the TPU:  python scripts/bench_hnsw_1m.py
Results print as JSON lines on stdout (table to stderr).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets the persistent XLA cache dir)
import numpy as np  # noqa: E402


def main():
    corpus, queries, gt = bench.load_data()
    n = bench.N
    ids = np.arange(1, n + 1, dtype=np.uint32)

    from comet_tpu.indexes.flat import FlatIndex
    from comet_tpu.indexes.hnsw import HNSWConfig, HNSWIndex
    from comet_tpu.types import DistanceKind

    # exact ground truth (flat scan IS the oracle)
    bench.log("building exact oracle (flat 1M)...")
    oracle = FlatIndex(bench.DIM, DistanceKind.L2)
    oracle.add_batch(corpus, ids=ids)
    truth, _ = oracle.search_batch(queries, k=100)
    del oracle

    bench.log("bulk-building HNSW 1M (M=16, efC=128)...")
    idx = HNSWIndex(
        bench.DIM, DistanceKind.L2,
        HNSWConfig(m=16, ef_construction=128, ef_search=128),
    )
    t0 = time.perf_counter()
    idx.add_batch(corpus, ids=ids)
    t_build = time.perf_counter() - t0
    bench.log(
        f"hnsw build(1M): {t_build:.1f}s ({n / t_build:.0f} vec/s; "
        f"reference 5,000s / 200 vec/s)"
    )
    rows = [{"metric": "hnsw_1m_build_s", "value": round(t_build, 1),
             "vec_per_s": round(n / t_build)}]

    def sweep(tag, iters_list, ef=256):
        for iters in iters_list:
            idx.config.search_iters = iters
            qps, found = bench.time_search(idx, queries, 100, ef_search=ef)
            r10 = bench.recall(found[:, :10], truth[:, :10])
            r100 = bench.recall(found[:, :100], truth)
            bench.log(
                f"hnsw-1M {tag},ef={ef},iters={iters or 'auto'}: "
                f"{qps:.1f} QPS, recall@10={r10:.3f}, recall@100={r100:.3f}"
            )
            rows.append({
                "metric": f"hnsw_1m_{tag}_ef{ef}_iters{iters or 'auto'}",
                "qps": round(qps, 1), "recall_at_10": round(r10, 4),
                "recall_at_100": round(r100, 4),
            })

    # seeded beam (TPU default at this scale)
    sweep("seeded", (6, 8, 12, 16, 24, 0))
    # classic entry-point beam
    idx.config.seed_search = False
    sweep("classic", (32, 48, 64))
    idx.config.seed_search = True

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
