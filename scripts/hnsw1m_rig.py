"""1M HNSW experiment rig: build-or-load a cached fixture (siftgen corpus,
exact oracle truth, bulk-built graph) and sweep search operating points.

The 1M corpus is the discriminating scale for seeded-beam tuning (200k
saturates recall at 1.0), but corpus gen + oracle + build cost ~10 min —
this rig pays them once per round and caches under /tmp.

Usage:
  python scripts/hnsw1m_rig.py build            # make the fixture
  python scripts/hnsw1m_rig.py sweep SPEC...    # run operating points
where SPEC is comma-separated key=val: mode=seeded|classic, iters=N,
ef=N, stop=N (seed_stop), nprobe=N (seed_nprobe), fuse=0|1.
Example:
  python scripts/hnsw1m_rig.py sweep mode=seeded,iters=0 \
      mode=seeded,iters=0,stop=192 mode=seeded,iters=0,nprobe=128
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets the persistent XLA cache dir)
import numpy as np  # noqa: E402

FIX = "/tmp/hnsw1m_fixture.npz"
GRAPH = "/tmp/hnsw1m_graph.bin"


def build():
    from comet_tpu.indexes.flat import FlatIndex
    from comet_tpu.indexes.hnsw import HNSWConfig, HNSWIndex
    from comet_tpu.types import DistanceKind

    corpus, queries, _ = bench.load_data()
    n = bench.N
    ids = np.arange(1, n + 1, dtype=np.uint32)
    bench.log("building exact oracle (flat 1M)...")
    oracle = FlatIndex(bench.DIM, DistanceKind.L2)
    oracle.add_batch(corpus, ids=ids)
    truth, _ = oracle.search_batch(queries, k=100)
    del oracle
    np.savez(
        FIX, corpus=corpus.astype(np.uint8), queries=queries, truth=truth
    )
    bench.log(f"fixture saved: {FIX}")

    idx = HNSWIndex(
        bench.DIM, DistanceKind.L2,
        HNSWConfig(m=16, ef_construction=128, ef_search=128),
    )
    t0 = time.perf_counter()
    idx.add_batch(corpus, ids=ids)
    t_build = time.perf_counter() - t0
    bench.log(f"hnsw build(1M): {t_build:.1f}s ({n / t_build:.0f} vec/s)")
    with open(GRAPH, "wb") as f:
        idx.write_to(f)
    bench.log(f"graph saved: {GRAPH}")
    print(json.dumps({"metric": "hnsw_1m_build_s", "value": round(t_build, 1)}))


def load():
    from comet_tpu.indexes.hnsw import HNSWIndex
    from comet_tpu.types import DistanceKind

    from comet_tpu.indexes.hnsw import HNSWConfig

    z = np.load(FIX)
    corpus = z["corpus"].astype(np.float32)
    queries, truth = z["queries"], z["truth"]
    idx = HNSWIndex(
        128, DistanceKind.L2,
        HNSWConfig(m=16, ef_construction=128, ef_search=128),
    )
    t0 = time.perf_counter()
    with open(GRAPH, "rb") as f:
        idx.read_from(f)
    bench.log(f"graph loaded in {time.perf_counter() - t0:.1f}s")
    return idx, corpus, queries, truth


def run_spec(idx, queries, truth, spec: str):
    kv = dict(item.split("=") for item in spec.split(",") if "=" in item)
    mode = kv.get("mode", "seeded")
    idx.config.seed_search = mode == "seeded"
    idx.config.search_iters = int(kv.get("iters", 0))
    idx.config.seed_stop = int(kv.get("stop", 0))
    idx.config.seed_nprobe = int(kv.get("nprobe", 0))
    idx.config.seed_width = int(kv.get("width", 0))
    idx.config.seed_kb = int(kv.get("kb", 0))
    ef = int(kv.get("ef", 256))
    k = int(kv.get("k", 100))
    os.environ["COMET_HNSW_FUSE"] = kv.get("fuse", "0")
    kw = {}
    if kv.get("wire", "1") == "0":
        kw["wire_scores"] = False
    t0 = time.perf_counter()
    qps, found = bench.time_search(idx, queries, k, ef_search=ef, **kw)
    r10 = bench.recall(found[:, :10], truth[:, :10])
    r100 = (bench.recall(found[:, :100], truth) if k >= 100 else None)
    r100s = f", recall@100={r100:.3f}" if r100 is not None else ""
    bench.log(
        f"[{spec}] {qps:.1f} QPS, recall@10={r10:.3f}{r100s}"
        f" (wall {time.perf_counter() - t0:.0f}s)"
    )
    print(json.dumps({"spec": spec, "qps": round(qps, 1),
                      "recall_at_10": round(r10, 4),
                      "recall_at_100": r100 and round(r100, 4)}), flush=True)


def profile(idx, queries):
    """Per-phase wall breakdown of one seeded 2048-query batch: seed scan,
    beam loop at several fixed iteration counts (slope = per-iteration
    cost, intercept = in-jit fixed cost), and the end-to-end batch
    (adds host glue + finalize + transfers)."""
    import jax
    import jax.numpy as jnp

    import numpy as np

    qc = queries[:2048].astype(np.float32)
    idx.config.seed_search = True
    idx.config.search_iters = 0
    # warm everything (seed tables, compiles)
    idx.search_batch(qc[:2048], k=100, ef_search=256)

    def sync(x):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).ravel()[:1])

    def t(tag, fn, reps=8):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        bench.log(f"profile {tag:34s} {ms:8.2f} ms")
        return ms

    from comet_tpu.indexes.hnsw import PALLAS_EXPAND
    from comet_tpu.ops import beam_kernel as bk

    qprep = qc  # L2: preprocess is identity
    t("seed_scan(width=256)", lambda: idx._seed_scan(qprep, 256))
    t("seed_scan(width=128)", lambda: idx._seed_scan(qprep, 128))

    seeds = idx._seed_scan(qprep, 256)
    entries = np.full(2048, max(idx._entry_slot, 0), np.int32)
    qdev = jnp.asarray(qprep)
    edev = jnp.asarray(entries)

    def loop(iters):
        return bk.beam_search_blocked(
            qdev, edev, idx._dev_nbr_vecs, idx._dev_aux,
            idx._dev_vectors, idx._dev_sqnorms, idx._dev_valid,
            jnp.asarray(np.float32(np.inf)), 256, 128, PALLAS_EXPAND,
            iters, False, seeds=seeds, stop=256,
        )

    ms1 = t("beam jit iters=1", lambda: loop(1))
    ms8 = t("beam jit iters=8", lambda: loop(8))
    ms24 = t("beam jit iters=24", lambda: loop(24))
    ms48 = t("beam jit iters=48 (if converged, early exit)",
             lambda: loop(48))
    bench.log(f"profile per-iter slope (8->24): {(ms24 - ms8) / 16:.2f} ms")
    t("end-to-end search_batch", lambda: idx.search_batch(
        qc, k=100, ef_search=256), reps=4)


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "build"
    if cmd == "build":
        build()
        return
    idx, corpus, queries, truth = load()
    if cmd == "profile":
        profile(idx, queries)
        return
    for spec in sys.argv[2:]:
        run_spec(idx, queries, truth, spec)


if __name__ == "__main__":
    main()
