#!/usr/bin/env python
"""Schema-evolution read-posture sweep (round-8 verdict item #5).

A 100 TB lake's table directories hold files written over years:
vintage B adds columns, widens int->long, reorders fields. Nothing in
the registry had ever READ such a directory. This sweep:

Phase 1 — posture matrix. Builds two-vintage copies of embeddings /
documents / events and records, per posture, what actually happens:
  - inference (plain spark.read.parquet): which footer wins, does the
    scan survive rows of the OTHER vintage;
  - mergeSchema=true: does the union schema resolve, does int32/int64
    merge or refuse;
  - explicit catalog schema (load_table(schema=...)): the pinned
    contract — must read EVERY vintage (Spark 4 scan-side widening),
    null-fill added columns on old files, and be listing-order-free.

Phase 2 — registry sweep. Runs the affected registry queries against
the two-vintage fixture via the PINNED posture's semantics (the
fixture holds exactly the source table's rows, so each query must
hash-match its DuckDB oracle over union_by_name views of the same
directory).

Vintage design (content-preserving: union of vintages == the sf0.01
source tables row-for-row on every v1 column):
  embeddings: A = vec_id < 250 (label int32, the original), B = rest
      with label WIDENED to int64 + an added `model_rev` string col.
  documents:  A = doc_id odd, B = even + added `quality_v2` double,
      fields also REORDERED (source first) in B.
  events:     A = first half, B = rest + added `schema_rev` int.

Usage: python scripts/schema_evolution_sweep.py   (~3 min)
"""
from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SRC = "/root/testdata/sf0.01"
FIXTURE = os.environ.get("SPARK_GRAFT_EVO_DIR", "/tmp/schemaevo_fixture")

# queries over the three evolved tables (the others read copied files)
QUERIES = [
    # documents family
    "q26", "q29_tokens", "q40_quality", "q63_hash_sample", "q96_bm25",
    # embeddings family
    "q27", "q117_hard_negatives", "q90_cluster_assign",
    # events family
    "q16", "q28", "q80_rolling_range", "q123_json_deadletter",
]

PINNED = {
    "embeddings": (
        "vec_id bigint, embedding array<float>, label bigint, "
        "model_rev string"
    ),
    "documents": (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint, quality_v2 double"
    ),
    "events": (
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string, schema_rev int"
    ),
}


def build_fixture() -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(FIXTURE):
        shutil.rmtree(FIXTURE)
    os.makedirs(FIXTURE)
    for t in "region nation customer supplier part orders lineitem".split():
        shutil.copy(f"{SRC}/{t}.parquet", f"{FIXTURE}/{t}.parquet")

    # embeddings: widen label int32 -> int64 in vintage B + add a column
    em = duckdb.sql(f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet')").fetchdf()
    d = f"{FIXTURE}/embeddings.parquet"
    os.makedirs(d)
    a = em[em["vec_id"] < 250]
    b = em[em["vec_id"] >= 250]
    pq.write_table(
        pa.table({
            "vec_id": pa.array(a["vec_id"].tolist(), pa.int64()),
            "embedding": pa.array(
                [list(map(float, e)) for e in a["embedding"]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(a["label"].tolist(), pa.int32()),
        }),
        f"{d}/part-a.parquet",
    )
    pq.write_table(
        pa.table({
            "vec_id": pa.array(b["vec_id"].tolist(), pa.int64()),
            "embedding": pa.array(
                [list(map(float, e)) for e in b["embedding"]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(b["label"].tolist(), pa.int64()),  # WIDENED
            "model_rev": pa.array(["v2"] * len(b), pa.string()),  # ADDED
        }),
        f"{d}/part-b.parquet",
    )

    # documents: added column + reordered fields in vintage B
    dc = duckdb.sql(f"SELECT * FROM read_parquet('{SRC}/documents.parquet')").fetchdf()
    d = f"{FIXTURE}/documents.parquet"
    os.makedirs(d)
    a = dc[dc["doc_id"] % 2 == 1]
    b = dc[dc["doc_id"] % 2 == 0]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(a["doc_id"].tolist(), pa.int64()),
            "text": pa.array(a["text"].tolist(), pa.string()),
            "lang": pa.array(a["lang"].tolist(), pa.string()),
            "source": pa.array(a["source"].tolist(), pa.string()),
            "n_chars": pa.array(a["n_chars"].tolist(), pa.int64()),
        }),
        f"{d}/part-a.parquet",
    )
    pq.write_table(
        pa.table({
            "source": pa.array(b["source"].tolist(), pa.string()),  # REORDERED
            "doc_id": pa.array(b["doc_id"].tolist(), pa.int64()),
            "text": pa.array(b["text"].tolist(), pa.string()),
            "lang": pa.array(b["lang"].tolist(), pa.string()),
            "n_chars": pa.array(b["n_chars"].tolist(), pa.int64()),
            "quality_v2": pa.array([0.5] * len(b), pa.float64()),  # ADDED
        }),
        f"{d}/part-b.parquet",
    )

    # events: added int column in vintage B
    ev = duckdb.sql(f"SELECT * FROM read_parquet('{SRC}/events.parquet')").fetchdf()
    d = f"{FIXTURE}/events.parquet"
    os.makedirs(d)
    half = len(ev) // 2
    for tag, part, extra in (("a", ev.iloc[:half], False), ("b", ev.iloc[half:], True)):
        cols = {
            "event_id": pa.array(part["event_id"].tolist(), pa.int64()),
            "ts": pa.array(part["ts"], pa.timestamp("us")),
            "user_id": pa.array(part["user_id"].tolist(), pa.int64()),
            "event_type": pa.array(part["event_type"].tolist(), pa.string()),
            "value": pa.array(part["value"].tolist(), pa.float64()),
            "props": pa.array(part["props"].tolist(), pa.string()),
        }
        if extra:
            cols["schema_rev"] = pa.array([2] * len(part), pa.int32())
        pq.write_table(pa.table(cols), f"{d}/part-{tag}.parquet")


def posture_matrix(spark) -> list[str]:
    """Record what each read posture does on the evolved directories."""
    findings: list[str] = []

    def attempt(label, fn):
        try:
            out = fn()
            findings.append(f"OK   {label}: {out}")
            return True
        except Exception as e:
            lines = str(e).splitlines()
            # py4j wraps the real cause a few lines down — surface it
            msg = next(
                (
                    ln.strip()
                    for ln in lines
                    if "Exception" in ln and "An error occurred" not in ln
                    or "SCHEMA" in ln or "CONVER" in ln or "Failed to merge" in ln
                ),
                lines[0] if lines else "",
            )[:200]
            findings.append(f"FAIL {label}: {msg}")
            return False

    emb = f"{FIXTURE}/embeddings.parquet"
    attempt(
        "inference embeddings (int32+int64 label mix)",
        # count() alone never materializes the column — SUM forces the
        # scan to decode int64 pages through the inferred int32 schema
        lambda: f"schema={spark.read.parquet(emb).schema['label'].dataType}, "
        f"label_sum={spark.read.parquet(emb).groupBy().sum('label').first()[0]}",
    )
    attempt(
        "mergeSchema embeddings",
        lambda: spark.read.option("mergeSchema", "true").parquet(emb).schema.simpleString()[:120],
    )
    attempt(
        "pinned-schema embeddings (label bigint, widened read)",
        lambda: (
            lambda df: f"count={df.count()}, label_sum={df.groupBy().sum('label').first()[0]}, "
            f"v2_nulls={df.where('model_rev is null').count()}"
        )(spark.read.schema(PINNED["embeddings"]).parquet(emb)),
    )
    docs = f"{FIXTURE}/documents.parquet"
    attempt(
        "inference documents (added+reordered)",
        lambda: f"cols={spark.read.parquet(docs).columns}, "
        f"count={spark.read.parquet(docs).count()}",
    )
    attempt(
        "mergeSchema documents",
        lambda: f"cols={spark.read.option('mergeSchema', 'true').parquet(docs).columns}",
    )
    attempt(
        "pinned-schema documents",
        lambda: (
            lambda df: f"count={df.count()}, "
            f"v2_nulls={df.where('quality_v2 is null').count()}, "
            f"id_sum={df.groupBy().sum('doc_id').first()[0]}"
        )(spark.read.schema(PINNED["documents"]).parquet(docs)),
    )
    return findings


def registry_sweep(spark) -> int:
    import duckdb

    from kfai_pipeline_spark.catalog import pin_table_schema
    from kfai_pipeline_spark.queries import REGISTRY
    from oracle_utils import canonical_rows

    # the catalog supplies the evolved tables' schemas (the metastore
    # posture) — registry builders load by name and read through them
    for t, ddl in PINNED.items():
        pin_table_schema(FIXTURE, t, ddl)

    con = duckdb.connect()
    from kfai_pipeline_spark.catalog import TABLES

    for t in TABLES:
        p = f"{FIXTURE}/{t}.parquet"
        src = (
            f"read_parquet('{p}/*.parquet', union_by_name=true)"
            if os.path.isdir(p)
            else f"read_parquet('{p}')"
        )
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    failures = 0
    for name in QUERIES:
        q = REGISTRY[name]
        try:
            got = canonical_rows(q.build(spark, FIXTURE).toPandas())
            if q.oracle is None:
                print(f"{name}: rows-only ({len(got)})")
                continue
            want = canonical_rows(con.sql(q.oracle).fetchdf())
            status = "PASS" if got == want else "MISMATCH"
            if status != "PASS":
                failures += 1
            print(f"{name}: {status} ({len(got)} vs {len(want)} rows)")
        except Exception as e:
            failures += 1
            print(f"{name}: ERROR {str(e).splitlines()[0][:160]}")
    return failures


def optimize_case(spark) -> int:
    """Two-vintage OPTIMIZE (round-9 verdict item #2, permanent class).

    Runs optimize_table over the widened (embeddings) and added-column
    (documents) directories with the catalog pins active — the default
    schema resolution path — and checks the rewritten copy is
    content-complete: row count, FULL column set (added columns
    survive), and exact content checksums (label_sum / id_sum)
    preserved. Before the pin threading, this exact call either
    crashed ([PARQUET_COLUMN_DATA_TYPE_MISMATCH] on the widened table)
    or silently dropped model_rev/quality_v2 from the rewrite.
    """
    from kfai_pipeline_spark.catalog import pin_table_schema
    from kfai_pipeline_spark.operators.partitioning import optimize_table

    for t, ddl in PINNED.items():
        pin_table_schema(FIXTURE, t, ddl)

    failures = 0
    cases = [
        # (table, zorder_cols, checksum_col, expect_col)
        ("embeddings", ["vec_id"], "label", "model_rev"),
        ("documents", ["doc_id"], "doc_id", "quality_v2"),
    ]
    for table, zcols, csum, added in cases:
        src = f"{FIXTURE}/{table}.parquet"
        dest = f"{FIXTURE}/{table}_opt.parquet"
        before = spark.read.schema(PINNED[table]).parquet(src)
        want_n = before.count()
        want_sum = before.groupBy().sum(csum).first()[0]
        try:
            res = optimize_table(spark, src, dest, zorder_cols=zcols)
        except Exception as e:
            failures += 1
            print(f"optimize {table}: ERROR {str(e).splitlines()[0][:160]}")
            continue
        after = spark.read.parquet(dest)
        got_n = after.count()
        got_sum = after.groupBy().sum(csum).first()[0]
        ok = (
            got_n == want_n == res["n_rows"]
            and got_sum == want_sum
            and added in after.columns
            and set(after.columns) == set(before.columns)
        )
        if not ok:
            failures += 1
        print(
            f"optimize {table}: {'PASS' if ok else 'MISMATCH'} "
            f"(rows {got_n}/{want_n}, {csum}_sum {got_sum}/{want_sum}, "
            f"cols {sorted(after.columns)}, files "
            f"{res['files_before']}->{res['files_after']})"
        )
        shutil.rmtree(dest, ignore_errors=True)
    return failures


def main() -> None:
    build_fixture()
    from kfai_pipeline_spark.session import get_spark

    spark = get_spark(app_name="schema-evo-sweep")
    print("== posture matrix ==")
    for line in posture_matrix(spark):
        print(line)
    print("== two-vintage optimize_table ==")
    failures = optimize_case(spark)
    print("== registry sweep over the two-vintage fixture ==")
    failures += registry_sweep(spark)
    print(f"failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
