#!/usr/bin/env python
"""10M-row embeddings fixture (VERDICT r5 sweep item): real vector
scale for the LSH/IVF arms — the sf fixtures carry only 2k vectors
('dims stay broadcast-size'), which never exercises index routing,
partition pruning, or the probe join at the scale those paths exist
for.

Planted structure: 1024 seeded Gaussian centers on the unit sphere;
each vector = unit(center + noise*sigma), labelled with its center, so
IVF/LSH recall is measurable against ground truth (same-center
vectors are the near neighbours by construction). Deterministic
(fixed seeds), dim 64 float32 to match the sf fixtures' schema
(vec_id long, embedding array<float>, label int).

Output: ./bench_vec10m/embeddings.parquet/ as ~64 MB files.
Usage: python scripts/make_vec10m.py [n_rows] [--clustered|--correlated]

--clustered [sigma] (round-8 verdict item #2): the default
SIGMA=0.25 noise has norm sigma*sqrt(64) = 2.0 against unit centers —
noise dominates, so the fixture is effectively near-uniform on the
sphere and PQ-HOSTILE (residuals after coarse quantization keep ~full
norm; BASELINE §5p documents IVFPQ recall 0.91 < flat PQ 0.95 on it).
The clustered arm defaults to SIGMA=0.10 (noise norm ~0.8): the
center dominates, coarse quantization removes most of the energy and
residual codebooks quantize a ~0.6-norm vector, while same-cluster
neighbors stay DISTINGUISHABLE so recall@10 is well-defined. (A first
cut used 0.03 — noise norm 0.24 — which collapses every cluster into
~10k near-duplicates whose top-10 ordering is a knife-edge no
quantizer can resolve and no application needs: recall pinned at
0.125 independent of nprobe. Over-clustering is as degenerate as
uniformity.) Writes to ./bench_vec10m_clustered/ so both fixtures
coexist.

--correlated [rank] (round-11 verdict item #3): the clustered arm's
noise is a spherical Gaussian — residuals after coarse quantization
are ISOTROPIC by construction, so the OPQ rotation has nothing to
re-axis and §5aa's 10M measurement was a (recorded) null. This arm
makes the residuals CORRELATED the way real text-embedding residuals
are (decaying PCA spectrum): noise = z @ M with z ~ N(0, I_rank)
(default rank 8) and M a fixed random rank x 64 mixing matrix scaled
to the clustered arm's noise energy (||noise|| ~ 0.8), so every PQ
sub-block sees linearly mixed coordinates — the OPQ objective's
regime (the unit-test construction at 10M scale). Centers drop to 256
(== the spot's coarse-book size) so the coarse book can resolve them
~1:1 and the residual is the low-rank noise itself, not inter-center
scatter that would re-isotropize it. Writes to
./bench_vec10m_correlated/.
"""
from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIM = 64
N_CENTERS = 1024
SIGMA = 0.25
CHUNK = 500_000


def main() -> None:
    args = [
        a for a in sys.argv[1:] if a not in ("--clustered", "--correlated")
    ]
    clustered = "--clustered" in sys.argv[1:]
    correlated = "--correlated" in sys.argv[1:]
    n = int(args[0]) if args else 10_000_000
    sigma = (float(args[1]) if len(args) > 1 else 0.10) if clustered else SIGMA
    rank = int(args[1]) if (correlated and len(args) > 1) else 8
    dirname = (
        "bench_vec10m_correlated"
        if correlated
        else "bench_vec10m_clustered" if clustered else "bench_vec10m"
    )
    out = os.path.join(REPO, dirname, "embeddings.parquet")
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)

    n_centers = 256 if correlated else N_CENTERS
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((n_centers, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    mixing = None
    if correlated:
        # fixed rank x DIM mixing, scaled so E||z @ M||^2 == 0.8^2 (the
        # clustered arm's noise energy): E||zM||^2 = ||M||_F^2 for
        # z ~ N(0, I)
        mixing = np.random.default_rng(7).standard_normal((rank, DIM))
        mixing *= 0.8 / np.linalg.norm(mixing)

    written = 0
    fidx = 0
    while written < n:
        m = min(CHUNK, n - written)
        crng = np.random.default_rng(1000 + fidx)
        labels = crng.integers(0, n_centers, size=m)
        if correlated:
            noise = crng.standard_normal((m, rank)) @ mixing
        else:
            noise = sigma * crng.standard_normal((m, DIM))
        vecs = centers[labels] + noise
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs.astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(
                    np.arange(written, written + m, dtype=np.int64)
                ),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel()), DIM
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(labels.astype(np.int32)),
            }
        )
        pq.write_table(tbl, os.path.join(out, f"part-{fidx:05d}.parquet"))
        written += m
        fidx += 1
        print(f"{written}/{n}", flush=True)
    print("done:", out)


if __name__ == "__main__":
    main()
