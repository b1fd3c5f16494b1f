"""Headline benchmark: flat exact-scan QPS on SIFT1M-shape data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's flat search on SIFT1M (1M x 128-d,
L2, k=100) runs at 45 ms/query = 22 QPS single-core Go on an Apple M2 Pro
(docs/INDEX.md:694-700). Here the same workload is a tiled query x corpus
MXU matmul with streaming top-k; throughput is measured over batched
independent queries (the TPU-native serving shape).

Extra per-index numbers are printed to stderr as they come online.
"""

import json
import sys
import time

import numpy as np

N = 1_000_000
DIM = 128
K = 100
BATCH = 2048
ROUNDS = 4
BASELINE_FLAT_QPS = 22.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_flat():
    import jax

    from comet_tpu.indexes.flat import FlatIndex
    from comet_tpu.types import DistanceKind

    rng = np.random.default_rng(0)
    log(f"generating {N}x{DIM} corpus...")
    # SIFT-like: non-negative, integer-ish magnitudes
    corpus = rng.integers(0, 256, size=(N, DIM)).astype(np.float32)
    queries = rng.integers(0, 256, size=(BATCH, DIM)).astype(np.float32)

    idx = FlatIndex(DIM, DistanceKind.L2)
    t0 = time.perf_counter()
    idx.add_batch(corpus)
    log(f"add_batch(1M): {time.perf_counter() - t0:.2f}s")

    # Warmup: device sync + compile
    t0 = time.perf_counter()
    ids, scores = idx.search_batch(queries, k=K)
    log(f"warmup search (sync+compile): {time.perf_counter() - t0:.2f}s")
    assert ids.shape == (BATCH, K)

    t0 = time.perf_counter()
    total_q = 0
    for r in range(ROUNDS):
        ids, scores = idx.search_batch(queries, k=K)
        total_q += BATCH
    dt = time.perf_counter() - t0
    qps = total_q / dt
    log(f"flat exact k={K}: {total_q} queries in {dt:.3f}s -> {qps:.1f} QPS "
        f"({1e3 * dt / total_q:.3f} ms/query amortized)")
    return qps


def main():
    qps = bench_flat()
    print(json.dumps({
        "metric": "flat_exact_scan_qps_sift1m_k100",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_FLAT_QPS, 2),
    }))


if __name__ == "__main__":
    main()
