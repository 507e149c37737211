#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
named after the driver tables in <sfDir>, and compares:
  - schema: column names (sorted)
  - rows:   exact count
  - values: hash over all cells with columns sorted by name, rows in
            result order, and a second order-insensitive hash (rows sorted)
Exit non-zero if any query mismatches.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Oracle output-type lint: every oracle's DESCRIBE'd result columns must
# stay inside this allowlist. Types outside it (HUGEINT from uncast integer
# sums, DECIMAL, unsigned ints, FLOAT, INTERVAL, ...) render differently
# across normalizers (duckdb-python vs pandas/arrow vs Spark parquet) and
# break value hashes even when the values are numerically identical —
# exactly the q12_late_lines_priority r13 failure (DuckDB sum(int) →
# HUGEINT → pandas float "354.0" vs Spark int64 "354"). Fix at authoring
# time with CAST(... AS BIGINT/DOUBLE/...).
ALLOWED_ORACLE_TYPES = {"BIGINT", "BOOLEAN", "DATE", "DOUBLE", "INTEGER",
                        "JSON", "TIMESTAMP", "VARCHAR", "BLOB"}


def lint_type_ok(typ):
    t = typ.strip()
    while t.endswith("[]"):  # lists of allowed scalars hash stably
        t = t[:-2].strip()
    return t in ALLOWED_ORACLE_TYPES


def lint_oracle_types(con, oracle):
    """DESCRIBE every oracle result; return [(name, problem)] for any
    column whose type is outside ALLOWED_ORACLE_TYPES. Runs over ALL
    oracle entries (not just those with spark output) so targeted
    verify runs still lint the full surface at authoring time."""
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            rows = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:
            bad.append((name, f"type lint: DESCRIBE failed: {e}"))
            continue
        offenders = [f"{r[0]}:{r[1]}" for r in rows if not lint_type_ok(r[1])]
        if offenders:
            bad.append((name, "type lint: normalizer-dependent oracle "
                        f"output type(s) {offenders} — add an explicit "
                        "CAST (allowed: " +
                        ",".join(sorted(ALLOWED_ORACLE_TYPES)) + ")"))
    return bad


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_digest(cols, rows, order_sensitive=True):
    import hashlib
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = ["\x01".join(norm_cell(r[i]) for i in order) for r in rows]
    if not order_sensitive:
        lines = sorted(lines)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x02")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    missing = []
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written dataset directory
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        else:
            missing.append(t)
    if missing:
        print(f"ERROR: input tables missing from {sf_dir}: {missing}")
        sys.exit(2)
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    failures = []
    lint_bad = lint_oracle_types(con, oracle)
    for name, problem in lint_bad:
        failures.append((name, problem))
        print(f"FAIL {name}: {problem}")
    if not lint_bad:
        print(f"lint {len(oracle)} oracle result types all in allowlist")
    # rows-only check for queries without an oracle (sketch-based ops):
    # output must exist and be readable; report its row count
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir() or qdir.name in oracle:
            continue
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')").fetchone()[0]
            print(f"rows {qdir.name} ({n} rows, no oracle)")
            if n == 0:
                failures.append((qdir.name, "rows-only check returned 0 rows"))
                print(f"FAIL {qdir.name}: rows-only check returned 0 rows")
        except Exception as e:
            failures.append((qdir.name, f"rows-only read failed: {e}"))
            print(f"FAIL {qdir.name}: rows-only read failed: {e}")
    for name, sql in sorted(oracle.items()):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            failures.append((name, "no spark output"))
            print(f"FAIL {name}: spark output missing")
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
        except Exception as e:
            failures.append((name, f"read spark parquet: {e}"))
            print(f"FAIL {name}: read spark parquet: {e}")
            continue
        try:
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            failures.append((name, f"oracle sql error: {e}"))
            print(f"FAIL {name}: oracle sql error: {e}")
            continue

        problems = []
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        elif len(s_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
        else:
            sh = table_digest(s_cols, s_rows)
            oh = table_digest(o_cols, o_rows)
            if sh != oh:
                sh_u = table_digest(s_cols, s_rows, order_sensitive=False)
                oh_u = table_digest(o_cols, o_rows, order_sensitive=False)
                if sh_u == oh_u:
                    problems.append("hash mismatch ORDER ONLY (values match unordered)")
                else:
                    problems.append("hash mismatch (values differ)")
                    # show first differing row
                    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                    oorder = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
                        sl = [norm_cell(sr[j]) for j in order]
                        ol = [norm_cell(orow[j]) for j in oorder]
                        if sl != ol:
                            problems.append(
                                f"first diff row {i}:\n  spark : {sl}\n  oracle: {ol}\n  cols  : {sorted(s_cols)}")
                            break
        if problems:
            failures.append((name, "; ".join(problems[:1])))
            print(f"FAIL {name}: " + "\n  ".join(problems))
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")

    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
