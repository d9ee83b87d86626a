"""Full-width local replica of the driver's correctness gate.

The per-round driver measures only the first 50 keys of the contract's
QUERIES dict (CORRECTNESS_r03 covered 50 of 55; the tail was silently
skipped), so tail entries never get a driver row for that round — since r5
the window rotates (see the QUERIES ordering note in contract.py), and
this gate is the evidence that whatever sits in the tail stays green.
This script runs EVERY contract query and its DuckDB oracle side-by-side at
an arbitrary scale factor (default sf0.01, the driver's own comparison
scale) and writes a CORRECTNESS_r{N}.json-shaped artifact covering the full
width, so tail entries carry committed oracle evidence at driver scale.

Comparison contract (mirrors the driver): row count, column-name set, and an
order-insensitive value hash — columns sorted by name, floats canonicalized
to 6 decimals, rows sorted, md5 over the repr stream.

Usage:
    python scripts/contract_check.py [--sf-dir /root/testdata/sf0.01] \
        [--out BENCH/CONTRACT_LOCAL_sf0.01.json] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_rows(pdf):
    pdf = pdf[sorted(pdf.columns)]

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6f}"
        if hasattr(v, "item"):  # numpy scalars
            return norm(v.item())
        return str(v)

    return sorted(
        tuple(norm(v) for v in row) for row in pdf.itertuples(index=False)
    )


def _value_hash(rows) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry_mod
    from parj_spark.session import get_spark

    spark = get_spark(app="contract-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    names = list(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    sf_tag = os.path.basename(args.sf_dir.rstrip("/")).replace("sf", "")
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        f"CONTRACT_LOCAL_sf{sf_tag}.json",
    )

    results: dict[str, dict] = {}
    n_green = n_no_oracle = n_err = 0
    for i, name in enumerate(names, 1):
        row: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.monotonic()
        try:
            spark_pdf = qs[name](spark, args.sf_dir).toPandas()
            row["spark_rows"] = len(spark_pdf)
            if name in oracles:
                duck_pdf = con.sql(oracles[name]).df()
                row["oracle_rows"] = len(duck_pdf)
                row["rows_match"] = len(spark_pdf) == len(duck_pdf)
                row["schema_match"] = (
                    sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
                )
                row["hash_match"] = _value_hash(
                    _canon_rows(spark_pdf)
                ) == _value_hash(_canon_rows(duck_pdf))
                ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
                n_green += ok
                if not ok:
                    n_err += 1
            else:
                row["err"] = "no_oracle"
                n_no_oracle += 1
        except Exception as exc:  # noqa: BLE001 — recorded, not raised
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            n_err += 1
        row["sec"] = round(time.monotonic() - t0, 3)
        results[name] = row
        status = (
            "green" if row["hash_match"]
            else (row["err"] or "MISMATCH")
        )
        print(f"[{i:2d}/{len(names)}] {name:28s} {status} ({row['sec']}s)",
              flush=True)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(
        json.dumps({
            "sf_dir": args.sf_dir, "total": len(names), "green": n_green,
            "no_oracle": n_no_oracle, "err_or_mismatch": n_err,
            "out": out_path,
        })
    )
    if n_err:
        sys.exit(1)


if __name__ == "__main__":
    main()
