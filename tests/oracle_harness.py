"""Local replica of the driver's DuckDB-oracle comparison: run the
Spark query and the oracle SQL over the same parquet tables, then
compare row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb

from ureplicator_spark.sources.parquet import TABLES


def run_oracle(sql: str, sf_dir: str, with_arrow_schema: bool = False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    if with_arrow_schema:
        # Fetch through Arrow so we see the SAME dtypes the driver's
        # hash gate sees (DuckDB HUGEINT -> decimal128(38,0), which
        # hash-mismatches a Spark BIGINT even when values agree).
        tbl = con.execute(sql).fetch_arrow_table()
        con.close()
        cols = tbl.column_names
        rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
        return cols, rows, tbl.schema
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


_CDC_CHUNK_CACHE: dict[str, str] = {}


def cdc_cached_sql(name: str, sf_dir: str):
    """Parity-sweep accelerator for the two Gear-CDC oracles: their
    WITH RECURSIVE chunk reconstruction (~25 s at sf0.1) is shared
    verbatim, so materialize the `chunks` CTE ONCE per (session, sf)
    to a temp parquet and rewrite each oracle to read it. Returns the
    rewritten SQL for the two CDC names, None for anything else. The
    registered SQL strings stay self-contained — the driver still
    runs the raw recursive form; this is local-gate plumbing only."""
    from ureplicator_spark import queries as Q

    tails = {
        "cdc_chunk_dedup": Q._CDC_DEDUP_TAIL,
        "cdc_incremental_dedup": Q._CDC_INCR_TAIL,
    }
    tail = tails.get(name)
    if tail is None:
        return None
    path = _CDC_CHUNK_CACHE.get(sf_dir)
    if path is None:
        import tempfile

        fd = tempfile.NamedTemporaryFile(
            prefix="cdc_chunks_", suffix=".parquet", delete=False
        )
        path = fd.name
        fd.close()
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
            con.execute(
                f"COPY ({Q._CDC_RECON_PREFIX} SELECT * FROM chunks) "
                f"TO '{path}' (FORMAT PARQUET)"
            )
        finally:
            con.close()
        _CDC_CHUNK_CACHE[sf_dir] = path
    return f"WITH chunks AS (SELECT * FROM read_parquet('{path}'))\n{tail}"


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return int(v)
    try:  # Decimal and numpy scalars
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            return int(v) if f.is_integer() else round(f, 9)
    except Exception:
        pass
    return str(v)


def compare(spark_df, sql: str, sf_dir: str, sort_rows: bool = True) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows, o_schema = run_oracle(sql, sf_dir, with_arrow_schema=True)

    # Dtype lint: an oracle column exported as Arrow decimal (DuckDB
    # HUGEINT from an uncast SUM) hash-mismatches at the driver even
    # when _norm makes the values compare equal here. Fail loudly
    # unless the Spark side is genuinely DecimalType too.
    import pyarrow.types as pat
    from pyspark.sql.types import DecimalType

    s_types = {f.name: f.dataType for f in spark_df.schema.fields}
    for field in o_schema:
        if pat.is_decimal(field.type) and not isinstance(
            s_types.get(field.name), DecimalType
        ):
            problems.append(
                f"oracle dtype lint: column '{field.name}' is Arrow "
                f"{field.type} (uncast DuckDB HUGEINT SUM?) but Spark emits "
                f"{s_types.get(field.name)}; CAST(... AS BIGINT) in the oracle SQL"
            )
    if problems:
        return problems

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")

    # align column order by sorted name (the driver sorts columns by name)
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_idx = {c: i for i, c in enumerate(s_cols)}
    o_idx = {c: i for i, c in enumerate(o_cols)}
    keys = sorted(s_cols)

    def proj(rows, idx):
        return [tuple(_norm(r[idx[c]]) for c in keys) for r in rows]

    sp = proj(s_rows, s_idx)
    op = proj(o_rows, o_idx)
    if sort_rows:
        skey = sorted(map(repr, sp))
        okey = sorted(map(repr, op))
    else:
        skey, okey = list(map(repr, sp)), list(map(repr, op))
    if skey != okey:
        diff_s = [r for r in skey if r not in set(okey)][:5]
        diff_o = [r for r in okey if r not in set(skey)][:5]
        problems.append(f"value mismatch; spark-only={diff_s} oracle-only={diff_o}")
    return problems
