#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verifyOutDir> [sfDir]

Reads each <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same sfDir tables,
sorts columns by name + rows by all columns, and compares values
exactly.  Exit 0 iff every oracled query matches.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    import decimal, datetime
    # Decimal stays a scale-preserving string: Decimal('10.50') and
    # Decimal('10.5') are equal values in different physical layouts,
    # and the driver's hash distinguishes layouts — float() here made
    # the local gate blinder than the driver (round-7 lesson).
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    # Temporal values that slipped past the arrow-level raw cast (e.g.
    # inside nested lists). Tag with the concrete type so a date never
    # silently equals a datetime of the same instant.
    if isinstance(v, (datetime.datetime, datetime.date)):
        return (type(v).__name__, v.isoformat())
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def raw_storage(table):
    """Driver-fidelity normalization: temporal columns compare as their
    RAW storage integers, unit included — a timestamp[ns] result vs a
    timestamp[us] oracle is a real driver hash mismatch even when both
    name the same instant (r39, round 6+7), so it must fail here too.
    Integer widths widen to int64 (a value-preserving cast both engines'
    hashes agree on); uint64 is left as-is (values above 2**63-1 would
    make arrow's checked cast raise and crash the gate — both engines
    emit the same uint64 storage anyway). Nested (struct/list) temporals
    bypass the unit-sensitive raw cast and fall back to canon()'s
    isoformat — a known soft spot; keep temporals out of nested final
    columns. Everything else is left for canon()."""
    cols = []
    for f in table.schema:
        c = table.column(f.name)
        t = f.type
        if pa.types.is_date32(t) or (pa.types.is_time(t) and t.bit_width == 32):
            # 32-bit temporals only cast via int32 (int64 directly is
            # unimplemented in arrow and would crash the gate)
            c = c.cast(pa.int32()).cast(pa.int64())
        elif pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
            c = c.cast(pa.int64())
        elif pa.types.is_integer(t) and not pa.types.is_uint64(t):
            c = c.cast(pa.int64())
        cols.append((f.name, c))
    return pa.table(dict(cols))


def rows_of(table):
    cols = sorted(table.column_names)
    table = raw_storage(table.select(cols))
    data = table.to_pylist()
    rows = [tuple(canon(r[c]) for c in cols) for r in data]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    # --only-present: compare only queries Verify actually dumped —
    # the targeted-run mode (SPARK_GRAFT_ONLY subsets, the sf0.1
    # oracle probe) where absent results are selection, not failure.
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only_present = "--only-present" in sys.argv
    out_dir = Path(args[0])
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    failures = []
    for name in sorted(oracle):
        res_dir = out_dir / name
        if not res_dir.exists():
            if only_present:
                continue
            failures.append((name, "NO SPARK RESULT"))
            n_fail += 1
            continue
        try:
            spark_tab = ds.dataset(str(res_dir)).to_table()
            duck_tab = con.execute(oracle[name]).fetch_arrow_table()
            scols, srows = rows_of(spark_tab)
            dcols, drows = rows_of(duck_tab)
            if scols != dcols:
                failures.append((name, f"SCHEMA spark={scols} duck={dcols}"))
                n_fail += 1
                continue
            if len(srows) != len(drows):
                failures.append((name, f"ROWCOUNT spark={len(srows)} duck={len(drows)}"))
                n_fail += 1
                continue
            bad = None
            for i, (a, b) in enumerate(zip(srows, drows)):
                if a != b:
                    bad = (i, a, b)
                    break
            if bad:
                failures.append((name, f"VALUE row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}"))
                n_fail += 1
            else:
                n_pass += 1
                print(f"PASS {name} ({len(srows)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ERROR {type(e).__name__}: {e}"))
            n_fail += 1
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
