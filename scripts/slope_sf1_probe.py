"""sf1-decade slope probe for the four `weak` headliners (r11 verdict item 6).

The r11 constants-vs-compounding adjudication for q3_shipping_priority /
q5_local_supplier_volume / asof_join_events / sessionize_events_batch rests
on the sf0.01 -> sf0.1 marginal cost. This script extends the probe one
decade: it materializes an sf1-scale slice in a temp dir (10 key-shifted
replicas of the sf0.1 fact tables — per-row work is constant by
construction, so ONLY a compounding plan defect can bend the slope), times
each query at sf0.1 and sf1 INTERLEAVED (min-of-N, both engines), and
reports sec/Mrow at the new decade against the BASELINE.md sf0.01->sf0.1
values (q3 0.59, q5 0.65, asof 2.70, sessionize 4.42 spark sec/Mrow).
Verdict rule: sf1 sec/Mrow within ~1.3x of the sf0.1-recorded value =>
the per-row cost is flat (constants adjudication confirmed); materially
above => a real plan defect to find.

    python scripts/slope_sf1_probe.py [--passes 3] [--keep]

Generated data lives under /tmp (never committed); the replica key shifts
preserve group sizes (events/user, lineitems/order) and filter
selectivities exactly, so both engines do 10x the rows at identical per-row
semantics.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
PROBE_QUERIES = {
    # name -> primary table whose rows scale the work
    "q3_shipping_priority": "lineitem",
    "q5_local_supplier_volume": "lineitem",
    "asof_join_events": "events",
    "sessionize_events_batch": "events",
}
REPLICAS = 10
# BASELINE.md round-11 slope table (sf0.01 -> sf0.1 spark marginal sec/Mrow)
BASELINE_SEC_PER_MROW = {
    "q3_shipping_priority": 0.59,
    "q5_local_supplier_volume": 0.65,
    "asof_join_events": 2.70,
    "sessionize_events_batch": 4.42,
}


def build_sf1(spark, out: str) -> None:
    """10 key-shifted replicas of the fact tables; dimensions copied as-is."""
    from pyspark.sql import functions as F

    from hdfs2cass_spark.sources import load_table

    os.makedirs(out, exist_ok=True)

    def replicate(table: str, shifts: dict[str, int]) -> None:
        d = load_table(spark, SF01, table)
        r = F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)])).alias("_r")
        cols = [
            (F.col(c) + F.col("_r") * F.lit(shifts[c])).alias(c)
            if c in shifts
            else F.col(c)
            for c in d.columns
        ]
        d.select("*", r).select(*cols).coalesce(8).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )

    # ceilings = max key + 1 so replicas never collide
    from pyspark.sql import functions as F2

    def ceil_of(table: str, col: str) -> int:
        return (
            load_table(spark, SF01, table).agg(F2.max(col)).first()[0] + 1
        )

    co = ceil_of("orders", "o_orderkey")
    cc = ceil_of("customer", "c_custkey")
    ce = ceil_of("events", "event_id")
    cu = ceil_of("events", "user_id")
    replicate("customer", {"c_custkey": cc})
    replicate("orders", {"o_orderkey": co, "o_custkey": cc})
    replicate("lineitem", {"l_orderkey": co})
    replicate("events", {"event_id": ce, "user_id": cu})
    for dim in ("supplier", "nation", "region", "part"):
        shutil.copy(f"{SF01}/{dim}.parquet", f"{out}/{dim}.parquet")


def table_rows(sf: str, t: str) -> int:
    import glob

    import pyarrow.parquet as pq

    p = f"{sf}/{t}.parquet"
    files = sorted(glob.glob(f"{p}/*.parquet")) if os.path.isdir(p) else [p]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def time_spark(spark, name: str, sf: str) -> float:
    from hdfs2cass_spark.plans import CATALOG

    df = CATALOG[name].fn(spark, sf)
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def time_duck(name: str, sf: str) -> float:
    import glob

    import duckdb

    from hdfs2cass_spark.plans import CATALOG

    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        t = os.path.basename(p).replace(".parquet", "")
        # Spark writes <table>.parquet as a DIRECTORY of part files; the
        # driver testdata ships single files — glob both
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"create view {t} as select * from read_parquet('{pat}')")
    sql = CATALOG[name].oracle
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    dt = time.perf_counter() - t0
    con.close()
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--keep", action="store_true", help="keep the sf1 dir")
    ap.add_argument("--sf1-dir", default="/tmp/h2c_sf1_probe")
    args = ap.parse_args()

    from hdfs2cass_spark.session import get_session

    spark = get_session("slope-sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")

    sf1 = args.sf1_dir
    if not os.path.exists(f"{sf1}/lineitem.parquet"):
        print(f"# building sf1 slice at {sf1} ...", file=sys.stderr)
        t0 = time.perf_counter()
        build_sf1(spark, sf1)
        print(f"# built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    names = list(PROBE_QUERIES)
    # warm both scales once (plan compile, code cache)
    for name in names:
        time_spark(spark, name, SF01)
        time_spark(spark, name, sf1)
    # interleaved min-of-N: A/B within one pass so a load burst hits both
    # scales equally (bench-box burstiness protocol)
    sp = {name: {"small": [], "big": []} for name in names}
    du = {name: {"small": [], "big": []} for name in names}
    for p in range(args.passes):
        for name in names:
            sp[name]["small"].append(time_spark(spark, name, SF01))
            sp[name]["big"].append(time_spark(spark, name, sf1))
        print(f"# spark pass {p + 1}/{args.passes} loadavg={os.getloadavg()[0]:.1f}",
              file=sys.stderr)
    spark.stop()
    for p in range(args.passes):
        for name in names:
            du[name]["small"].append(time_duck(name, SF01))
            du[name]["big"].append(time_duck(name, sf1))
        print(f"# duck pass {p + 1}/{args.passes} loadavg={os.getloadavg()[0]:.1f}",
              file=sys.stderr)

    out = {"replicas": REPLICAS, "passes": args.passes, "sf1_dir": sf1,
           "loadavg": [round(x, 2) for x in os.getloadavg()], "queries": {}}
    for name in names:
        tbl = PROBE_QUERIES[name]
        drows = table_rows(sf1, tbl) - table_rows(SF01, tbl)
        ds = min(sp[name]["big"]) - min(sp[name]["small"])
        dd = min(du[name]["big"]) - min(du[name]["small"])
        spm = ds / drows * 1e6
        base = BASELINE_SEC_PER_MROW[name]
        out["queries"][name] = {
            "spark_small_sec": round(min(sp[name]["small"]), 4),
            "spark_big_sec": round(min(sp[name]["big"]), 4),
            "duck_small_sec": round(min(du[name]["small"]), 4),
            "duck_big_sec": round(min(du[name]["big"]), 4),
            "marginal_rows": drows,
            "spark_sec_per_mrow_sf1": round(spm, 4),
            "duck_sec_per_mrow_sf1": round(dd / drows * 1e6, 4) if dd > 0 else None,
            "baseline_sec_per_mrow_sf01": base,
            "ratio_vs_baseline": round(spm / base, 3) if base else None,
            "verdict": (
                "flat-slope" if spm <= base * 1.3 else "slope-grows"
            ),
        }
    print(json.dumps(out, indent=2))
    if not args.keep:
        shutil.rmtree(sf1, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
