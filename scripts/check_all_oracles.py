"""Full-coverage correctness artifact (VERDICT r4 Next #2).

The driver's CORRECTNESS_r{N}.json caps at the FIRST 50 ``queries()``
entries, so oracle-backed queries past the cap have no committed
driver-format witness. This script runs EVERY ``queries()`` entry against
its ``oracle_sql()`` through DuckDB at sf0.01 — same comparison the driver
does (row count, schema, order-insensitive value hash) — and writes
``CORRECTNESS_full_r{N}.json`` at the repo root. Queries with no oracle
(none remain as of round 5) get a rows-only record.

Run:  python scripts/check_all_oracles.py --round 5
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Same canonicalization as tests/test_entry.py: sort columns by name,
    collapse timestamp resolution/tz, round floats, stringify objects,
    sort rows."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            ts = pd.to_datetime(s)
            if getattr(ts.dt, "tz", None) is not None:
                ts = ts.dt.tz_localize(None)
            pdf[c] = ts.astype("datetime64[ns]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.round(6)
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("int64")
        elif s.dtype == object:
            pdf[c] = s.astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _value_hash(pdf: pd.DataFrame) -> str:
    n = _normalize(pdf)
    payload = n.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names to check (iteration aid; the "
        "committed artifact must be a FULL run)",
    )
    args = ap.parse_args()
    out_path = args.out or os.path.join(
        REPO, f"CORRECTNESS_full_r{args.round:02d}.json"
    )

    import __spark_entry__ as entrymod
    from rasusa_spark.session import get_spark

    spark = get_spark(
        "check_all_oracles", master="local[8]", shuffle_partitions=16
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.only:
        keep = {n.strip() for n in args.only.split(",")}
        unknown = keep - set(queries)
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
        queries = {n: f for n, f in queries.items() if n in keep}
    results: dict[str, dict] = {}
    n_fail = 0
    t0 = time.time()
    for name, fn in queries.items():
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            rec["spark_rows"] = int(len(sdf))
            if name in oracles:
                ddf = con.execute(oracles[name]).fetchdf()
                rec["oracle_rows"] = int(len(ddf))
                rec["rows_match"] = len(sdf) == len(ddf)
                rec["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _value_hash(sdf) == _value_hash(ddf)
                )
                ok = bool(rec["hash_match"])
            else:
                rec["rows_only"] = True
                ok = rec["spark_rows"] >= 0
        except Exception as exc:  # noqa: BLE001 — artifact records the error
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
            ok = False
        if not ok:
            n_fail += 1
        results[name] = rec
        status = "PASS" if ok else "FAIL"
        print(f"  {status} {name}", flush=True)

    summary = {
        "sf_dir": SF_DIR,
        "n_queries": len(queries),
        "n_oracle_backed": sum(1 for n in queries if n in oracles),
        "n_fail": n_fail,
        "wall_sec": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump({"_summary": summary, **results}, f, indent=2)
    print(json.dumps(summary))
    print(f"wrote {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
