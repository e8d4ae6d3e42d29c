"""ANN recall measurement: recall@k of the LSH and IVF approximate
top-k paths vs exact brute force, on a corpus where the approximation
actually approximates (a Gaussian-mixture embedding cloud, not the
deterministic fixtures the correctness tests use).

Usage:
    python tools/ann_recall.py [--rows 100000] [--dim 64] [--queries 20]

Prints a markdown recall table (pasteable into README) plus one JSON
line. Deterministic: numpy RandomState(seed) for the corpus and
queries, fixed hyperplane/centroid seeds in the library.

Why a mixture: uniform random vectors in d=64 are near-orthogonal, so
either every method looks perfect (k nearest are meaninglessly random)
or hopeless. Clustered data gives real neighborhoods — the setting a
training-data embedding table (near-dup clusters, topic clusters)
actually presents.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEED = 1234


def make_corpus(rows: int, dim: int, n_clusters: int = 64):
    rs = np.random.RandomState(SEED)
    centers = rs.normal(0, 1.0, size=(n_clusters, dim))
    assign = rs.randint(0, n_clusters, size=rows)
    x = centers[assign] + rs.normal(0, 0.35, size=(rows, dim))
    return x.astype(np.float32)


def make_queries(x: np.ndarray, n_queries: int):
    """Perturbed copies of real corpus points — queries with genuine
    near neighbors."""
    rs = np.random.RandomState(SEED + 1)
    idx = rs.choice(len(x), size=n_queries, replace=False)
    return (x[idx] + rs.normal(0, 0.1, size=(n_queries, x.shape[1]))).astype(
        np.float32
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from qsvspark.session import get_spark
    from qsvspark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_ann_topk,
        train_ivf_centroids,
    )

    spark = get_spark("ann-recall", parallelism=8, shuffle_partitions=8)
    x = make_corpus(args.rows, args.dim)
    qvecs = make_queries(x, args.queries)

    import pandas as pd

    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(x)), "embedding": list(map(list, x))}
    )
    df = spark.createDataFrame(pdf).cache()
    df.count()

    def ids(out_df) -> set:
        return {r[0] for r in out_df.select("vec_id").collect()}

    t0 = time.time()
    truth = [
        ids(brute_force_topk(df, list(map(float, q)), k=args.k)) for q in qvecs
    ]
    brute_sec = round(time.time() - t0, 1)

    results = []

    def measure(label: str, fn) -> None:
        t0 = time.time()
        hits = sum(
            len(ids(fn(list(map(float, q)))) & truth[i]) for i, q in enumerate(qvecs)
        )
        recall = hits / (args.k * len(qvecs))
        results.append({
            "method": label,
            "recall_at_k": round(recall, 3),
            "seconds_total": round(time.time() - t0, 1),
        })
        print(f"[ann_recall] {label}: recall@{args.k} = {recall:.3f}",
              file=sys.stderr, flush=True)

    for bits in (8, 12, 16):
        for ph in (1, 2, 3):
            measure(
                f"lsh bits={bits} probe_hamming={ph}",
                lambda q, b=bits, p=ph: lsh_ann_topk(
                    df, q, k=args.k, bits=b, probe_hamming=p
                ),
            )

    for nc in (16, 64):
        cents = train_ivf_centroids(df, "embedding", "vec_id",
                                    n_centroids=nc, sample_n=4096)
        for nprobe in (1, 2, 4, 8):
            measure(
                f"ivf n_centroids={nc} nprobe={nprobe}",
                lambda q, c=cents, n=nprobe: ivf_topk(df, q, c, k=args.k, nprobe=n),
            )

    print(f"\n## ANN recall@{args.k} vs brute force "
          f"({args.rows} vectors, dim={args.dim}, {args.queries} queries, "
          f"Gaussian mixture, seed={SEED})\n")
    print("| method | recall@%d | total sec (%d queries) |" % (args.k, args.queries))
    print("|---|---|---|")
    for r in results:
        print(f"| {r['method']} | {r['recall_at_k']} | {r['seconds_total']} |")
    print(f"| brute force (reference) | 1.000 | {brute_sec} |")

    print(json.dumps({
        "rows": args.rows, "dim": args.dim, "k": args.k,
        "queries": args.queries, "brute_seconds": brute_sec,
        "results": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
