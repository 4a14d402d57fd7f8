"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from rifflux_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if isinstance(v, float):
        if v != v:
            return "nan"
        v = v + 0.0  # -0.0 -> 0.0
        return f"{v:.9g}"
    return str(v)


def rows_to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_value(r[i]) for i in order) for r in rows)


def arrow_kind(t) -> str:
    """Collapse an Arrow type to the class the driver's value-hash would
    distinguish: all int widths hash alike only within a class, but
    decimal128 vs int64 (DuckDB windowed SUM artifact — the round-3
    token_budget_sample red row) differ even with identical values."""
    import pyarrow.types as pt

    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return "DECIMAL"
    if pt.is_string(t) or pt.is_large_string(t):
        return "str"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "bytes"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return f"list<{arrow_kind(t.value_type)}>"
    if pt.is_struct(t):
        inner = ",".join(f"{f.name}:{arrow_kind(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pt.is_map(t):
        return f"map<{arrow_kind(t.key_type)},{arrow_kind(t.item_type)}>"
    return str(t)


def arrow_type_problems(sdf, cur) -> list[str]:
    """Compare Arrow type classes column-by-column (sorted by name).
    str()-normalized value compare can't see decimal-vs-int mismatches
    that flip the driver's strict hash; this can."""
    try:
        s_schema = sdf.limit(0).toArrow().schema
        d_tab = cur.fetch_arrow_table()
        d_schema = d_tab.schema
    except Exception as e:  # pragma: no cover - toArrow availability
        return [f"arrow-compare unavailable: {e}"]
    s_map = {f.name: arrow_kind(f.type) for f in s_schema}
    d_map = {f.name: arrow_kind(f.type) for f in d_schema}
    probs = []
    for name in sorted(set(s_map) & set(d_map)):
        if s_map[name] != d_map[name]:
            probs.append(
                f"arrow type of '{name}': spark={s_map[name]} duck={d_map[name]}"
            )
    return probs


def duckdb_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check_one(spark, con, sf_dir: str, name: str, fn, oracle: str | None) -> list[str]:
    """Run one queries() entry on Spark and its oracle on DuckDB; return
    the list of problems ([] = green, mirrors the driver gate's checks:
    row count, column names, order-insensitive values, Arrow type class)."""
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:
        return [f"SPARK ERROR: {e}"]
    if oracle is None:
        return []  # rows-only check: ran without error
    try:
        cur = con.execute(oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
    except Exception as e:
        return [f"DUCKDB ERROR: {e}"]
    problems = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"schema spark={scols} duck={dcols}")
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if not problems:
        sm = rows_to_multiset(srows, scols)
        dm = rows_to_multiset(drows, dcols)
        if sm != dm:
            diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            problems.append(f"values differ, e.g. {diff}")
    if not problems:
        problems.extend(arrow_type_problems(sdf, con.execute(oracle)))
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        problems = check_one(spark, con, sf_dir, name, fn, oracles.get(name))
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"  {name}: MISMATCH {problems}")
        elif name not in oracles:
            print(f"  {name}: ran (no oracle — rows-only check)")
        else:
            print(f"  {name}: OK")

    print()
    if failures:
        print(f"FAILED: {len(failures)} -> {[f[0] for f in failures]}")
        sys.exit(1)
    print("ALL OK")
    spark.stop()


if __name__ == "__main__":
    main()
