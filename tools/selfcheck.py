#!/usr/bin/env python3
"""Dev-loop mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/selfcheck.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out_dir>/oracle_sql.json in DuckDB against the same
testdata parquet tables, sorts columns by name (the driver does the same
before hashing), and value-compares. Exit 1 on any mismatch.

This script is development tooling only — the shipped engine is pure
Scala/Spark and does not depend on it.
"""
import decimal
import glob
import json
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, decimal.Decimal):
        # The driver's hash is TYPE-sensitive: DuckDB SUM(BIGINT) returns
        # HUGEINT (arrow decimal128) where Spark returns int64, and
        # str(Decimal('42')) == str(42) would hide that here. Keep the
        # type tag so an uncast oracle aggregate fails locally (r7 judge:
        # q91/q92 shipped hash-red because this stringified).
        return f"dec:{v}"
    if isinstance(v, float):
        return f"{v!r}"
    if hasattr(v, "isoformat"):  # datetime/date; strip tz info differences
        try:
            v = v.replace(tzinfo=None)
        except (TypeError, AttributeError):
            pass
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def type_family(t):
    """Canonical type class mirroring the driver hash's sensitivity:
    decimal vs int vs float must differ; physical widths and
    string/large_string representation differences must not."""
    if pa.types.is_null(t):
        return "null"  # all-NULL column: wildcard, matches anything
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        return f"list<{type_family(t.value_type)}>"
    return str(t)


def type_mismatches(got, exp):
    """Columns whose arrow type family differs (sorted-name order)."""
    bad = []
    for c in sorted(got.column_names):
        gf = type_family(got.schema.field(c).type)
        ef = type_family(exp.schema.field(c).type)
        if gf != ef and "null" not in (gf, ef):
            bad.append(f"{c}: spark={gf} oracle={ef}")
    return bad


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm_cell(col[i]) for col in data)
                  for i in range(table.num_rows)]


def main(out_dir, sf_dir, json_out=None):
    con = duckdb.connect()
    # bound DuckDB's memory and give it a spill dir: the amplified-corpus
    # iterative twins (q154's 4-sweep CTE chain) otherwise OOM when the
    # host is also running Spark, killing the whole sweep
    try:
        con.execute("SET memory_limit='%s'"
                    % os.environ.get("SELFCHECK_DUCK_MEM", "48GB"))
        con.execute("SET temp_directory='/tmp/duckspill'")
    except Exception:
        pass
    # resume: keep prior results, re-check only missing/errored names
    done = set()
    prior = {}
    if json_out and os.path.exists(json_out):
        try:
            prior = json.load(open(json_out))
            done = {k for k, v in prior.items()
                    if v.get("hash_match") or v.get("err") == "no_oracle"}
        except Exception:
            prior = {}
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written (e.g. graft.Amplify) layout
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    report = dict(prior)

    def record(name, rows_match=None, schema_match=None, hash_match=None,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}
        if json_out:  # flush per query: a killed long run keeps its progress
            with open(json_out, "w") as f:
                json.dump(report, f, indent=2, sort_keys=True)

    for name in sorted(oracle):
        if name in done:
            print(f"SKIP {name} (already green in {json_out})")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failed.append(name)
            record(name, err="no_spark_output")
            continue
        got = pq.read_table(files[0])
        try:
            exp = con.execute(oracle[name]).arrow()
        except Exception as e:  # e.g. a twin OOMs: record, keep sweeping
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            record(name, err=f"oracle_error: {str(e)[:200]}")
            continue
        gcols, grows = rows_of(got)
        ecols, erows = rows_of(exp)
        nsg, nse = len(grows), len(erows)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            failed.append(name)
            record(name, rows_match=nsg == nse, schema_match=False,
                   hash_match=False, spark_rows=nsg, oracle_rows=nse)
            continue
        tbad = type_mismatches(got, exp)
        if tbad:
            print(f"FAIL {name}: type mismatch — {'; '.join(tbad)}")
            failed.append(name)
            record(name, rows_match=nsg == nse, schema_match=False,
                   hash_match=False, spark_rows=nsg, oracle_rows=nse)
            continue
        if grows != erows:
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows")
            for i, (g, e) in enumerate(zip(grows, erows)):
                if g != e:
                    print(f"  first diff at row {i}:\n   spark={g}\n   duck ={e}")
                    break
            else:
                print(f"  row-count-only diff (prefix equal)")
            failed.append(name)
            record(name, rows_match=nsg == nse, schema_match=True,
                   hash_match=False, spark_rows=nsg, oracle_rows=nse)
            continue
        print(f"OK   {name} ({len(grows)} rows)")
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=nsg, oracle_rows=nse)
    # queries without an oracle: report rows-only status
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        files = glob.glob(f"{d}*.parquet")
        n = pq.read_table(files[0]).num_rows if files else -1
        print(f"ROWS {name}: {n}")
        record(name, spark_rows=n, err="no_oracle")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print(f"\nall {len(oracle)} oracle queries match")


if __name__ == "__main__":
    # optional 3rd arg: write a CORRECTNESS_r{N}-style JSON report
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
