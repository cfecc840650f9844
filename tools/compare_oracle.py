#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Spark result
parquet written by graft.Verify. Usage:
  python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [only_query]
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def tz_schema_mismatch(got, want):
    """Driver-faithful schema check: a tz-aware Spark column vs a naive
    oracle column (or vice versa) fails schema_match; do NOT normalize."""
    bad = []
    for c in set(got.columns) & set(want.columns):
        if (pd.api.types.is_datetime64_any_dtype(got[c])
                and pd.api.types.is_datetime64_any_dtype(want[c])):
            gtz = getattr(got[c].dtype, "tz", None)
            wtz = getattr(want[c].dtype, "tz", None)
            if (gtz is None) != (wtz is None):
                bad.append(f"{c}: spark tz={gtz} oracle tz={wtz}")
    return bad

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}

def type_family(t, spark_side):
    """Collapse a DuckDB type name to the equivalence class the DRIVER's
    exact hash actually distinguishes (see calibration note at use site)."""
    t = t.upper()
    if t in INT_TYPES:
        return "int"
    if t == "HUGEINT":
        # pandas coerces to float64 → renders "x.0"; on the spark side this
        # type can't occur (Spark has no int128)
        return "float"
    if t.startswith("DECIMAL"):
        return "SPARK-DECIMAL-FATAL(cast to DOUBLE/BIGINT)" if spark_side \
            else "float"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        # FLOAT folds into float: both sides pandas-coerce to float64 and
        # a genuine float32-vs-float64 value gap fails the value compare
        return "float"
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return "datetime-tz" if "WITH TIME ZONE" in t else "datetime"
    return t

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # timestamps to iso strings (tz-aware keeps its offset suffix — a tz
    # mismatch must FAIL, like the driver's strict compare), floats rounded
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: v.isoformat() if hasattr(v, "isoformat") else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def connect(sf_dir):
    con = duckdb.connect()
    # out-of-core for scale drills: an in-memory duckdb has no temp dir and
    # a memory-bound hash agg dies with "Failed to allocate block" instead
    # of spilling (hit by word_entropy's 500k-doc token explosion at sf10)
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    # spill cap must leave the box usable: r12 saw an lsh_incremental
    # oracle spill 72G+ and drive / to 100%, starving every concurrent
    # job. 50GiB makes an over-budget oracle FAIL FAST (documented skip)
    # instead of wedging the machine; override per-run when the disk
    # genuinely has room.
    con.sql(f"SET max_temp_directory_size='{os.environ.get('DUCKDB_TMP_MAX', '50GiB')}'")
    # scale drills run this concurrently with a Spark JVM on the same box:
    # cap duckdb so the pair fits in RAM (spills instead of ballooning)
    if os.environ.get("DUCKDB_MEM"):
        con.sql(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # comma-separated list of query names (single name still works)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = connect(sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spath = f"{out_dir}/{name}"
        if not os.path.isdir(spath):
            print(f"FAIL {name}: spark output missing", flush=True); n_fail += 1; continue
        def reconnect(old):
            import gc, time
            try:
                old.close()
            except Exception:
                pass
            gc.collect()
            for backoff in (1, 5, 15):
                try:
                    return connect(sf_dir)
                except Exception:
                    time.sleep(backoff)
                    gc.collect()
            return connect(sf_dir)
        try:
            try:
                wrel = con.sql(sql)
                want = wrel.df()
            except duckdb.OutOfMemoryException:
                # a spilled-then-failed big oracle can leave the connection
                # pinning buffers, poisoning every later (tiny) allocation:
                # reconnect and retry once on a clean slate
                con = reconnect(con)
                wrel = con.sql(sql)
                want = wrel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}", flush=True); n_fail += 1
            con = reconnect(con)
            continue
        grel = con.sql(f"SELECT * FROM '{spath}/*.parquet'")
        got = grel.df()
        try:
            # TYPE-FAMILY gate (round-6 lesson, calibrated to the driver's
            # observed behavior across r06 green/red rows): the driver
            # reads the SPARK parquet type-faithfully but coerces the
            # ORACLE result through pandas, so
            #   - int-width diffs (INTEGER vs BIGINT) are invisible (both
            #     int64) — green in r06 (tpch_q7/q8/q9, yoy_growth, ...)
            #   - oracle HUGEINT → float64 ("5.0" vs spark "5") — RED
            #   - spark DECIMAL vs oracle DOUBLE — RED (spark side is
            #     type-faithful; any spark-side DECIMAL output is fatal)
            #   - int-family vs float-family — RED (er_blocking)
            #   - DATE vs naive TIMESTAMP both render midnight — green
            #     (retention_cohorts); tz-aware vs naive stays a failure
            #     via tz_schema_mismatch above
            gtypes = dict(zip(grel.columns, [str(t) for t in grel.types]))
            wtypes = dict(zip(wrel.columns, [str(t) for t in wrel.types]))
            tbad = []
            for c in sorted(set(gtypes) & set(wtypes)):
                gf = type_family(gtypes[c], spark_side=True)
                wf = type_family(wtypes[c], spark_side=False)
                if gf != wf:
                    tbad.append(f"{c}: spark={gtypes[c]} ({gf}) vs "
                                f"oracle={wtypes[c]} ({wf})")
            if tbad:
                print(f"FAIL {name}: type mismatch: " + "; ".join(tbad))
                n_fail += 1; continue
            tzbad = tz_schema_mismatch(got, want)
            if tzbad:
                print(f"FAIL {name}: tz schema mismatch: " + "; ".join(tzbad))
                n_fail += 1; continue
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1; continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}", flush=True); n_fail += 1; continue
            # value compare: exact for non-floats; floats keep a tight
            # relative tolerance — the driver itself passed r06 rows whose
            # float sums differ in the last ulp (tpch_q1 sum_charge), so
            # its hash rounds floats; bitwise-exact here would false-alarm
            mism = []
            for c in g.columns:
                a, b = g[c], w[c]
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    af = a.astype(float); bf = b.astype(float)
                    bad = ~((af == bf) | (af.isna() & bf.isna()) |
                            (abs(af - bf) <= 1e-9 * (1 + abs(bf))))
                else:
                    bad = ~((a == b) | (a.isna() & b.isna()))
                if bad.any():
                    i = bad.idxmax()
                    mism.append(f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r} ({int(bad.sum())} diffs)")
            if mism:
                print(f"FAIL {name}: " + "; ".join(mism[:3]), flush=True); n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)", flush=True); n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: compare error: {e}", flush=True); n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
