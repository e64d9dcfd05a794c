"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 side-by-side with
its ``oracle_sql()`` DuckDB query and compares row count, column names, and
an order-insensitive value hash.  Iterate here until everything matches
before a round ends.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


# Output types every known canonicalization renders identically.  Anything
# else (HUGEINT from DuckDB integer sums, DECIMAL, TIMESTAMP against a
# ns-precision parquet, FLOAT) has already produced driver-only hash
# mismatches that fetchall() masks — so their mere presence is a failure,
# even when the values happen to compare equal locally.
_DUCK_TYPE_OK = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                 "VARCHAR", "BOOLEAN", "DATE")
_SPARK_TYPE_OK = ("bigint", "int", "smallint", "tinyint", "double", "string",
                  "boolean", "date")


def risky_duck_types(con, sql: str) -> list[tuple[str, str]]:
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        (c, ty) for c, ty, *_ in desc
        if ty.upper().rstrip("[]") not in _DUCK_TYPE_OK
    ]


def risky_spark_types(sdf) -> list[tuple[str, str]]:
    out = []
    for f in sdf.schema.fields:
        ty = f.dataType.simpleString()
        base = ty
        while base.startswith("array<") and base.endswith(">"):
            base = base[6:-1]
        if base not in _SPARK_TYPE_OK:
            out.append((f.name, ty))
    return out


def table_digest(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            bad_d = risky_duck_types(con, oracles[name])
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            # Arrow fetch, like a driver would: preserves ns timestamps and
            # HUGEINT/DECIMAL distinctions that fetchall() flattens to
            # Python int/datetime
            d_rows = [
                tuple(r[c] for c in d_cols)
                for r in cur.fetch_arrow_table().to_pylist()
            ]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue

        problems = []
        bad_s = risky_spark_types(sdf)
        if bad_d:
            problems.append(f"oracle output types not canon-safe: {bad_d}")
        if bad_s:
            problems.append(f"spark output types not canon-safe: {bad_s}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            hs, hd = table_digest(s_cols, s_rows), table_digest(d_cols, d_rows)
            if hs != hd:
                problems.append("value hash mismatch")
                # show first differing canonical rows
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("\x1f".join(canon(r[i]) for i in order_s) for r in s_rows)
                ld = sorted("\x1f".join(canon(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  spark : {a[:300]}")
                        problems.append(f"  duckdb: {b[:300]}")
                        break
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            print(f"OK   {name}: {len(s_rows)} rows")
    print("---")
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
