"""Driver-style correctness check: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB, compare row-count + columns +
order-insensitive value hash.

Usage: python3 tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from kgflow.schemas import TESTDATA_TABLES
from kgflow.session import get_spark


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    record: dict[str, dict] = {}

    spark = get_spark("oracle-check", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            failures.append(name)
            # uniform record schema on every path — consumers keying on
            # record[name]["hash_match"] must never hit KeyError
            record[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark: {str(e)[:200]}",
            }
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only)")
            record[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None, "err": None,
            }
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures.append(name)
            record[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": f"duckdb: {str(e)[:200]}",
            }
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = table_hash(scols, srows)
        dh = table_hash(dcols, drows)
        ok_hash = sh == dh
        status = "ok   " if (ok_cols and ok_count and ok_hash) else "FAIL "
        record[name] = {
            "rows_match": ok_count, "schema_match": ok_cols,
            "hash_match": ok_hash, "spark_rows": len(srows),
            "oracle_rows": len(drows), "err": None,
        }
        print(
            f"{status} {name}: spark={len(srows)} duck={len(drows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {dcols}'} "
            f"hash={'=' if ok_hash else f'{sh[:8]} vs {dh[:8]}'} "
            f"({time.time() - t0:.1f}s)"
        )
        if status.startswith("FAIL"):
            failures.append(name)
            if not ok_hash and ok_cols and ok_count:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {tuple(norm_value(r[i]) for i in order) for r in srows}
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = {tuple(norm_value(r[i]) for i in dorder) for r in drows}
                print("   only-spark:", list(sset - dset)[:3])
                print("   only-duck :", list(dset - sset)[:3])
    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(record, fh, indent=1)
        print(f"wrote {json_out} ({len(record)} queries)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
