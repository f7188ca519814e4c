"""Cross-engine dtype audit: for every registry query, compare the
Spark result schema with the DuckDB oracle schema column-by-column and
flag numeric-kind divergence (int on one side, float/decimal on the
other). Round 4's only driver hash miss (split_assignment) was exactly
this: DuckDB SUM(INTEGER) -> HUGEINT (float64 via pandas) vs Spark
LongType. Exit 1 if any flagged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.001")

INT_KINDS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"}
FLOAT_KINDS = {"FLOAT", "DOUBLE", "REAL"}


def duck_kind(t: str) -> str:
    t = str(t).upper()
    if t == "HUGEINT" or t == "UHUGEINT":
        return "HUGE"  # pandas-lossy: becomes float64
    if t in INT_KINDS:
        return "int"
    if t in FLOAT_KINDS or t.startswith("DECIMAL"):
        return "float"
    if t in ("VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB"):
        return t.lower()
    return t


def spark_kind(t: str) -> str:
    t = t.lower()
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("float", "double") or t.startswith("decimal"):
        return "float"
    if t == "string":
        return "varchar"
    if t == "timestamp_ntz":
        return "timestamp"
    return t


def main() -> None:
    import duckdb

    from ureplicator_spark.queries import QUERIES
    from ureplicator_spark.session import get_spark
    from ureplicator_spark.sources.parquet import TABLES

    spark = get_spark("audit-types")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    bad = 0
    for name, (fn, sql) in QUERIES.items():
        if sql is None:
            continue
        try:
            sdtypes = dict(fn(spark, SF_DIR).dtypes)
            rel = con.sql(f"SELECT * FROM ({sql.rstrip().rstrip(';')}) __q LIMIT 0")
            odtypes = dict(zip(rel.columns, [str(x) for x in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD ERROR {str(e)[:120]}")
            bad += 1
            continue
        for col, st in sdtypes.items():
            if col not in odtypes:
                print(f"{name}.{col}: missing in oracle")
                bad += 1
                continue
            sk, ok = spark_kind(st), duck_kind(odtypes[col])
            if ok == "HUGE":
                print(f"{name}.{col}: oracle HUGEINT (pandas-lossy) vs spark {st}")
                bad += 1
            elif sk != ok and {sk, ok} != {"float"}:
                # int-vs-float (either direction) is the hash trap;
                # identical kinds or float/decimal pairs are fine.
                if {sk, ok} == {"int", "float"} or sk != ok:
                    print(f"{name}.{col}: spark {st} ({sk}) vs oracle {odtypes[col]} ({ok})")
                    bad += 1
    print(f"\n{bad} divergent columns")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
