"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark and, where
an oracle exists, the matching ``oracle_sql()`` on DuckDB over the same
parquet; compares row count + column names + an order-insensitive value hash
(columns sorted by name, rows sorted, floats repr'd). Prints one line per
query and a summary. Usage:

    python scripts/verify_local.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = SF_DIR
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    if "--vanilla" in sys.argv:
        # Driver-realistic: a plain session with none of our session.py
        # configs (default 200 shuffle partitions, no Arrow tuning).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("verify-vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from nfl_big_data_bowl_2024_spark.session import get_spark

        spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or sorted(qs)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                status = f"ROWS-ONLY ({len(srows)} rows)"
                n_rowsonly += 1
            else:
                ocols_rows = con.execute(oracles[name])
                ocols = [d[0] for d in ocols_rows.description]
                orows = ocols_rows.fetchall()
                if sorted(scols) != sorted(ocols):
                    status = f"FAIL cols spark={sorted(scols)} oracle={sorted(ocols)}"
                    n_fail += 1
                elif len(srows) != len(orows):
                    status = f"FAIL rows spark={len(srows)} oracle={len(orows)}"
                    n_fail += 1
                else:
                    sh = value_hash(scols, srows)
                    oh = value_hash(ocols, orows)
                    if sh == oh:
                        status = f"PASS ({len(srows)} rows)"
                        n_pass += 1
                    else:
                        status = f"FAIL hash ({len(srows)} rows) {sh} != {oh}"
                        n_fail += 1
        except Exception as e:
            status = f"ERROR {type(e).__name__}: {e}"
            traceback.print_exc()
            n_fail += 1
        print(f"{name:35s} {status}  [{time.time() - t0:.1f}s]", flush=True)

    print(f"\npass={n_pass} fail={n_fail} rows_only={n_rowsonly} total={len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
