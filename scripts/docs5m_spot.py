#!/usr/bin/env python
"""5M-document scale spot for the newest text ops (round-7 verdict
item 6): segment dedup (X39/q108) and DSIR resampling (X41/q109) at
10x the sf10 corpus, so the growth curve has a third point free of
first-scan warmup noise.

Fixture: /tmp/docs5m/documents.parquet — 1000 offset copies of the
sf0.1 documents table (the make_sf1 recipe, docs only), multi-file
64 MB parquet. The 1000-copies structure is deliberately dedup-
hostile: every segment repeats 1000x, so the winner election's
map-side reduction is doing real work (this structure exposed the
round-4 quadratic-clique defect).

Measures each op at 500k (bench_sf10) and 5M docs in ONE session and
prints growth factors — rows grow 10x; the honest pass is growth
close to 10x (linear) for both.

Usage: python scripts/docs5m_spot.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
FIXTURE = "/tmp/docs5m"


def build_fixture() -> None:
    import duckdb

    os.makedirs(FIXTURE, exist_ok=True)
    out = f"{FIXTURE}/documents.parquet"
    if os.path.isdir(out) and any(
        f.endswith(".parquet") for f in os.listdir(out)
    ):
        return
    if os.path.isfile(out):
        os.remove(out)
    elif os.path.isdir(out):
        shutil.rmtree(out)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1/documents.parquet"
    stride = con.sql(f"SELECT max(doc_id)+1 FROM '{src}'").fetchone()[0]
    con.sql(
        f"COPY (SELECT doc_id + i.i * {stride} AS doc_id, text, lang, "
        f"source, n_chars FROM '{src}', range(1000) i(i)) "
        f"TO '{out}' (FORMAT PARQUET, FILE_SIZE_BYTES {64 * 1024 * 1024})"
    )


def main() -> None:
    from pyspark.sql import functions as F

    from kfai_pipeline_spark.catalog import load_table
    from kfai_pipeline_spark.operators import dedup as D
    from kfai_pipeline_spark.operators.sampling import dsir_sample_scoped
    from kfai_pipeline_spark.session import get_spark

    build_fixture()
    spark = get_spark(app_name="docs5m-spot")
    out: dict = {"metric": "docs5m_spot"}
    for label, sf_dir in (("500k", f"{REPO}/bench_sf10"), ("5m", FIXTURE)):
        docs = load_table(spark, sf_dir, "documents")
        arm: dict = {"n_docs": docs.count()}
        t0 = time.perf_counter()
        arm["segment_dedup_s"] = None
        n = D.dedup_segments_text(docs, "doc_id", "text").count()
        arm["segment_dedup_s"] = round(time.perf_counter() - t0, 1)
        arm["segment_dedup_rows"] = n
        t0 = time.perf_counter()
        with dsir_sample_scoped(
            docs, F.col("lang") == "en", k=50
        ) as picked:
            arm["dsir_rows"] = picked.count()
        arm["dsir_s"] = round(time.perf_counter() - t0, 1)
        out[label] = arm
        print(json.dumps({label: arm}), file=sys.stderr, flush=True)
    for op in ("segment_dedup_s", "dsir_s"):
        out[f"growth_{op}"] = round(out["5m"][op] / max(out["500k"][op], 0.1), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
