#!/usr/bin/env python3
"""Regression test for check.py's dtype-strict compare (the DuckDB
HUGEINT trap, ORACLES.md): an oracle whose SUM() is left uncast must
FAIL the pre-flight even though every cell compares equal, because the
driver's typed hash fails on int64-vs-float64. Round 6 shipped three
red rows precisely because cell_eq coerced 5.0 == 5.

Usage: python3 tools/test_check.py   (exit 0 = check.py behaves)
"""
import json, os, shutil, subprocess, sys, tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check.py")


def run_check(sf_dir, out_dir, *names):
    return subprocess.run(
        [sys.executable, CHECK, sf_dir, out_dir, *names],
        capture_output=True, text=True)


def main():
    tmp = tempfile.mkdtemp(prefix="graft_checktest_")
    try:
        sf_dir = os.path.join(tmp, "sf")
        out_dir = os.path.join(tmp, "out")
        os.makedirs(sf_dir)
        con = duckdb.connect()
        # a minimal 'lineitem' so check.py's view registration works
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"]:
            con.execute(
                f"COPY (SELECT CAST(1 AS BIGINT) AS k, "
                f"CAST(2 AS BIGINT) AS v) TO '{sf_dir}/{t}.parquet'")
        # spark-side output: BIGINT sum (what graft emits)
        os.makedirs(os.path.join(out_dir, "q_hugeint"))
        con.execute(
            f"COPY (SELECT CAST(1 AS BIGINT) AS k, CAST(2 AS BIGINT) "
            f"AS s) TO '{out_dir}/q_hugeint/part.parquet'")
        os.makedirs(os.path.join(out_dir, "q_cast"))
        shutil.copy(f"{out_dir}/q_hugeint/part.parquet",
                    f"{out_dir}/q_cast/part.parquet")
        # oracle 1: uncast SUM -> HUGEINT -> float64 in pandas: MUST FAIL
        # oracle 2: cast SUM -> BIGINT -> int64: must pass
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({
                "q_hugeint":
                    "SELECT k, SUM(v) AS s FROM lineitem GROUP BY k",
                "q_cast":
                    "SELECT k, CAST(SUM(v) AS BIGINT) AS s "
                    "FROM lineitem GROUP BY k",
            }, f)
        r = run_check(sf_dir, out_dir, "q_hugeint")
        assert r.returncode != 0, \
            f"uncast HUGEINT oracle passed pre-flight!\n{r.stdout}"
        assert "dtype mismatch" in r.stdout, r.stdout
        r = run_check(sf_dir, out_dir, "q_cast")
        assert r.returncode == 0, \
            f"cast oracle failed pre-flight:\n{r.stdout}"
        print("ok: check.py is dtype-strict (HUGEINT trap caught)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
