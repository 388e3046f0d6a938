"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive values.  Usage:

    python scripts/check_oracle.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import datetime
import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return f"{value:.9g}"
    if isinstance(value, list):
        return "[" + ",".join(canon(v) for v in value) + "]"
    return repr(value)


def row_key(row):
    return tuple(canon(v) for v in row)


def _driver_cell(v):
    """dtype-SENSITIVE cell repr, emulating the driver's pandas canonicalizer:
    int64 57 and float64 57.0 must hash differently (that is exactly the
    DuckDB-HUGEINT artifact that produced r02's hash fails), ndarray/list
    cells must raise (that is the rel_higher_order abort)."""
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    if isinstance(v, (np.ndarray, list, dict)):
        raise TypeError(f"unhashable type: {type(v).__name__}")
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return f"i{int(v)}"
    if isinstance(v, (float, np.floating)):
        return f"f{v!r}"
    return repr(v)


def driver_hash(pdf: pd.DataFrame) -> str:
    """Order columns by lowered name, sort rows, hash every cell with the
    dtype-sensitive repr above.  Any exception == the driver would abort."""
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        tuple(_driver_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x01".join(r).encode())
        h.update(b"\x02")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filters = sys.argv[2:]

    from knowledgebot_spark.registry import load
    from knowledgebot_spark.session import get_session

    catalog = load()
    if name_filters:
        catalog = {
            n: q for n, q in catalog.items() if any(f in n for f in name_filters)
        }

    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, qd in sorted(catalog.items()):
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if qd.sql is None:
            print(f"rows-only {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(qd.sql)
            d_cols = [d[0].lower() for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue

        problems = []
        if len(set(s_cols)) != len(s_cols) or len(set(d_cols)) != len(d_cols):
            # duplicate names would silently alias to the first occurrence
            # in the index-based alignment below — fail loudly instead
            problems.append(f"duplicate column names spark={s_cols} duck={d_cols}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            # align column order by sorted name
            s_order = [s_cols.index(c) for c in sorted(s_cols)]
            d_order = [d_cols.index(c) for c in sorted(d_cols)]
            s_set = sorted(row_key(tuple(r[i] for i in s_order)) for r in s_rows)
            d_set = sorted(row_key(tuple(r[i] for i in d_order)) for r in d_rows)
            if s_set != d_set:
                diff = [
                    (a, b) for a, b in zip(s_set, d_set) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if not problems:
            # driver emulation: pandas-materialize both sides and hash with
            # dtype-sensitive cells — catches HUGEINT→float64 and complex-type
            # canonicalizer crashes that the repr comparison above forgives
            try:
                hs = driver_hash(sdf.toPandas())
            except Exception as e:
                problems.append(f"spark pandas-canon error: {type(e).__name__}: {str(e)[:150]}")
            else:
                try:
                    hd = driver_hash(con.execute(qd.sql).df())
                except Exception as e:
                    problems.append(f"duck pandas-canon error: {type(e).__name__}: {str(e)[:150]}")
                else:
                    if hs != hd:
                        problems.append("pandas driver-hash mismatch (dtype-level divergence)")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
