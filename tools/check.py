#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs DuckDB on oracle_sql.json (tables registered as views over the
sf parquet files), loads each Spark parquet output, sorts columns by
name and rows by all columns, and compares values exactly.

Usage: check.py <sfDir> <outDir> [query ...]
"""
import json, re, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# The committed oracle SQL pins staged-fixture paths to the driver's
# sf0.01 gate corpus (sources/Sources.scala, pipeline/Reference.scala).
# When checking another scale factor locally, rewrite those paths to
# the requested sfDir so we compare against that sf's fixtures.
GATE_SF = "/root/testdata/sf0.01"


def stage_dir(d):
    # mirror of graft.sources.Sources.stageDir
    return "/tmp/graft_export/" + re.sub(r"[^A-Za-z0-9.]", "_", d)


def retarget(sql, sf_dir):
    return (sql.replace(stage_dir(GATE_SF), stage_dir(sf_dir))
               .replace(GATE_SF, sf_dir))


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaT/NaN
            return True
    except Exception:
        pass
    return a == b


def check_bounds(con, out_dir, name, spec):
    """Bounds-mode gate (ORACLES.md): the oracle is an EXACT aggregate
    for the same grouping; every joined row must satisfy each declared
    bound predicate (s = spark output, o = oracle). Returns error or
    None."""
    con.execute("CREATE OR REPLACE VIEW o_exact AS " + spec["oracle_sql"])
    con.execute(f"CREATE OR REPLACE VIEW s_out AS "
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
    n_s = con.sql("SELECT count(*) FROM s_out").fetchone()[0]
    n_o = con.sql("SELECT count(*) FROM o_exact").fetchone()[0]
    if n_s != n_o:
        return f"rows want={n_o} got={n_s}"
    on = " AND ".join(f"s.{k} = o.{k}" for k in spec["join_on"])
    n_j = con.sql(f"SELECT count(*) FROM s_out s JOIN o_exact o ON {on}"
                  ).fetchone()[0]
    if n_j != n_o:
        return f"join keys mismatch: {n_j} of {n_o} rows matched"
    for b in spec["bounds"]:
        n_viol = con.sql(f"SELECT count(*) FROM s_out s JOIN o_exact o "
                         f"ON {on} WHERE NOT ({b})").fetchone()[0]
        if n_viol:
            return f"bound violated on {n_viol} rows: {b}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    try:
        bounds_specs = json.load(open(f"{out_dir}/oracle_bounds.json"))
    except FileNotFoundError:
        bounds_specs = {}
    for name, spec in sorted(bounds_specs.items()):
        if only and name not in only:
            continue
        try:
            err = check_bounds(con, out_dir, name, spec)
        except Exception as e:
            err = f"bounds check error: {e}"
        if err:
            print(f"FAIL {name} [bounds]: {err}")
            n_bad += 1
        else:
            print(f"ok   {name} [bounds]")
            n_ok += 1
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        sql = retarget(sql, sf_dir)
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = canon(duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} "
                  f"got={list(got.columns)}")
            n_bad += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_bad += 1
            continue
        # dtype-strict: the driver hashes TYPED values, so a KIND
        # mismatch (int64-vs-float64 — the DuckDB HUGEINT trap,
        # ORACLES.md) fails there even when every cell compares
        # equal. Mirror that instead of letting cell_eq coerce.
        # Width-only mismatches (int32 vs int64) pass the driver's
        # hash — warn so the catalog can still converge on BIGINT.
        dt_bad, dt_warn = [], []
        for c in want.columns:
            wd, gd = want[c].dtype, got[c].dtype
            if wd == gd:
                continue
            if wd.kind == gd.kind:
                dt_warn.append((c, str(wd), str(gd)))
            else:
                dt_bad.append((c, str(wd), str(gd)))
        for c, wd, gd in dt_warn:
            print(f"warn {name}: dtype width col={c} oracle={wd} "
                  f"spark={gd} (driver-tolerated; prefer BIGINT both sides)")
        if dt_bad:
            c, wd, gd = dt_bad[0]
            print(f"FAIL {name}: dtype mismatch col={c} "
                  f"oracle={wd} spark={gd} (HUGEINT trap? see ORACLES.md)")
            n_bad += 1
            continue
        bad = None
        for c in want.columns:
            wv, gv = want[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(wv, gv)):
                if not cell_eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={c} row={i} "
                  f"want={a!r} ({type(a).__name__}) got={b!r} ({type(b).__name__})")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(want)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
