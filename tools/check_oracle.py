#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [nameRegex]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, sorts columns by name and rows by all columns,
and compares values. Exit 1 on any mismatch.

Runs oracles on a process pool (GATE_PAR env, default 8) and prints a
per-oracle timing table (slowest first) so the gate's own cost can be
profiled and budgeted.
"""
import sys, json, glob, os, re, time
from concurrent.futures import ProcessPoolExecutor

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def compare(name, spark_df, duck_df):
    """Driver-parity comparator: the driver sorts columns by name and
    hashes EXACT pandas values, so an int64 `12345` vs a float64
    `12345.0` is a hash mismatch even though the values are equal
    (round-7 a37/c25/c29 shipped exactly because the old comparator
    coerced both sides to float and passed on isclose). Rules here:
    int-vs-float dtype family mismatch = FAIL; float columns must be
    bit-exact (NaN==NaN allowed); everything else compares as strings.
    """
    import pandas as pd
    import numpy as np
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        fa = np.issubdtype(a[c].dtype, np.floating)
        fb = np.issubdtype(b[c].dtype, np.floating)
        if fa != fb:
            return (f"DTYPE col={c}: spark={a[c].dtype} vs oracle={b[c].dtype}"
                    f" — driver hashes these differently (e.g. 12345 vs 12345.0);"
                    f" CAST the oracle (or the Spark side) so dtypes agree")
        if fa and fb:
            av = a[c].values.astype(float)
            bv = b[c].values.astype(float)
            if not np.array_equal(av, bv, equal_nan=True):
                bad = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
                i = int(np.argmax(bad))
                return (f"VALUE col={c} row={i}: {av[i]!r} vs {bv[i]!r}"
                        f" (driver requires bit-exact floats)")
        else:
            av = a[c].astype(str).values
            bv = b[c].astype(str).values
            if not np.array_equal(av, bv):
                i = int(np.argmax(av != bv))
                return f"VALUE col={c} row={i}: {av[i]!r} vs {bv[i]!r}"
    return None

def run_one(task):
    """Worker: (name, sql_or_None, dir_or_None, sf_dir) -> (name, status, detail, secs).

    sf_dir rides in the task tuple (not a module global) so workers are
    correct under spawn/forkserver start methods, not just fork.
    """
    name, sql, d, sf_dir = task
    import pandas as pd
    t0 = time.time()
    if d is None:
        return (name, "FAIL", "no verify output written", 0.0)
    files = sorted(glob.glob(f"{d}/*.parquet"))
    spark_df = (pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
                if files else pd.DataFrame())
    if sql is None:
        return (name, "SKIP", f"rows-only: {len(spark_df)} rows", time.time() - t0)
    import duckdb
    con = duckdb.connect()
    # bound per-worker DuckDB threads so GATE_PAR workers don't
    # oversubscribe the box (DuckDB defaults to all cores per process)
    con.sql(f"SET threads={max(1, os.cpu_count() // int(os.environ.get('GATE_PAR', '8')))}")
    # Bound per-worker memory and spill to disk past it: at the sf1
    # stress scale a MATERIALIZED quadratic pair CTE ballooned one
    # worker to 41 GB and the kernel OOM-killed the pool (round-9).
    # DuckDB degrades to out-of-core gracefully with a temp dir.
    con.sql(f"SET memory_limit='{os.environ.get('GATE_MEM', '10GB')}'")
    con.sql("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (stress replicas): a DIRECTORY of part
            # files — glob them. Driver-generated sf dirs stay the
            # single-file form below.
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        return (name, "FAIL", f"oracle SQL error: {e}", time.time() - t0)
    err = compare(name, spark_df, duck_df)
    secs = time.time() - t0
    if err:
        return (name, "FAIL", err, secs)
    return (name, "PASS", f"{len(spark_df)} rows", secs)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    name_re = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    dirs = {os.path.basename(d.rstrip("/")): d
            for d in sorted(glob.glob(f"{out_dir}/*/"))}
    names = sorted(set(dirs) | set(oracles))
    if name_re:
        names = [n for n in names if name_re.search(n)]
    tasks = [(n, oracles.get(n), dirs.get(n), sf_dir) for n in names]
    par = int(os.environ.get("GATE_PAR", "8"))
    t0 = time.time()
    # Collect per-future and survive worker crashes: a DuckDB hard
    # abort (observed at sf1 under out-of-core pressure) kills its
    # worker and poisons every pending future in the pool. Unfinished
    # tasks fall through to the isolated retry lane below.
    results = []
    retry = []
    with ProcessPoolExecutor(max_workers=par) as ex:
        futs = {ex.submit(run_one, t): t for t in tasks}
        for fut, t in futs.items():
            # On a poisoned pool every unfinished future raises
            # BrokenProcessPool from result() immediately; those tasks
            # go to the ISOLATED retry lane (one task per throwaway
            # pool, so the actual crasher can only fail itself). No
            # cancel(): it races the broken-pool machinery's own
            # exception-setting (InvalidStateError).
            try:
                r = fut.result()
                results.append(r)
                print(f"{r[1]:5} {r[0]} [{r[3]:.1f}s]", flush=True)
            except Exception:
                retry.append(t)
    if retry:
        # sequential lane: grant each isolated task the whole box
        os.environ["GATE_PAR"] = "1"
        os.environ["GATE_MEM"] = os.environ.get("GATE_RETRY_MEM", "60GB")
    for t in retry:
        try:
            with ProcessPoolExecutor(max_workers=1) as ex1:
                r = ex1.submit(run_one, t).result()
            results.append(r)
            print(f"{r[1]:5} {r[0]} [{r[3]:.1f}s] (isolated retry)", flush=True)
        except Exception as e:
            results.append((t[0], "FAIL", f"worker crashed: {e}", 0.0))
            print(f"CRASH {t[0]}: {e}", flush=True)
    n_pass = n_fail = n_skip = 0
    for name, status, detail, secs in results:
        if status == "PASS":
            n_pass += 1
            print(f"PASS  {name} ({detail}) [{secs:.1f}s]")
        elif status == "SKIP":
            n_skip += 1
            print(f"SKIP  {name} ({detail})")
        else:
            n_fail += 1
            print(f"FAIL  {name}: {detail}")
    slow = sorted(results, key=lambda r: -r[3])[:15]
    print("== slowest oracles ==")
    for name, _, _, secs in slow:
        print(f"  {secs:7.1f}s  {name}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only "
          f"(wall {time.time()-t0:.1f}s, cpu-sum {sum(r[3] for r in results):.1f}s, par={par}) ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
