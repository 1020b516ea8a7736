"""Driver dress rehearsal: run every __spark_entry__.queries() entry against
its oracle_sql() in DuckDB, exactly like the driver's correctness gate.

Run from a NON-repo cwd with NO engine configs:
    cd /tmp && python /root/repo/scripts/dress_rehearsal.py [sf_dir] [name ...]

Catches what pytest can't: missing runtime session confs (the driver passes
its OWN vanilla SparkSession) and UDF closures that pickle by reference.
"""

from __future__ import annotations

import importlib.util
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("dress-rehearsal")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    queries = mod.queries()
    oracles = mod.oracle_sql()
    names = [n for n in queries if not ONLY or n in ONLY]
    print(f"{len(names)} queries @ {SF}")

    # entry() smoke
    if not ONLY:
        n = mod.entry(spark).count()
        print(f"entry(): {n} rows")

    def norm(v):
        if v is None:
            return ""
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.10g}"
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return str(v)

    # DuckDB output types whose canonical serialization diverges from the
    # Spark type in the driver's value hasher even when the values are
    # numerically identical (SUM(BIGINT) promotes to INT128, etc.). The r4
    # driver flagged exactly this on pack_sequences / top_ngram_repetition
    # while the str()-normalizing rehearsal stayed green — so type
    # faithfulness is checked FIRST, independent of value comparison.
    BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

    def oracle_types(sql: str) -> list[tuple[str, str]]:
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        return [(r[0], r[1]) for r in rows]

    failures = []
    for name in names:
        try:
            sdf = queries[name](spark, SF)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm(r[c]) for c in cols) for r in sdf.collect()
            )
            sql = oracles.get(name)
            if sql is None:
                print(f"  {name}: rows={len(srows)} (no oracle)")
                continue
            bad = [
                (c, t)
                for c, t in oracle_types(sql)
                if any(b in t.upper() for b in BAD_ORACLE_TYPES)
            ]
            if bad:
                failures.append(
                    (name, f"oracle type not driver-hashable: {bad} — wrap in CAST")
                )
                print(f"  {name}: ORACLE TYPE {bad}")
                continue
            ores = con.execute(sql).fetchall()
            ocols_all = [d[0] for d in con.description]
            oidx = [ocols_all.index(c) for c in sorted(ocols_all)]
            orows = sorted(tuple(norm(r[i]) for i in oidx) for r in ores)
            if sorted(ocols_all) != cols:
                failures.append((name, f"schema: spark={cols} oracle={sorted(ocols_all)}"))
                print(f"  {name}: SCHEMA MISMATCH")
            elif srows != orows:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(srows + [None], orows + [None])) if a != b
                )
                failures.append((name, f"values at {diff[0]}: spark={diff[1]} oracle={diff[2]}"))
                print(f"  {name}: VALUE MISMATCH ({len(srows)} vs {len(orows)} rows)")
            else:
                print(f"  {name}: OK ({len(srows)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append((name, repr(e)[:500]))
            print(f"  {name}: ERROR {repr(e)[:200]}")

    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    for n, msg in failures:
        print(f"FAIL {n}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
