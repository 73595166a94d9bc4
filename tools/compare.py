#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev iteration only;
the driver runs its own copy). Usage:

  python3 tools/compare.py [--jobs N] <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle in DuckDB against the
parquet tables in <sfDir>, and compares rows / schema / value-hash
with columns sorted by name (the driver's documented semantics).

--jobs N shards the query list across N child processes of this same
script (each with its own DuckDB): the search-family oracles re-derive
the full tokenized index CTE per query, which is minutes each on the
x10/x100 scaled lakes — serial compare there is hours, sharded is the
same work in wall/N. Exit 0 iff every shard is green; exit 3 iff the
only failures were ENVIRONMENTAL (disk/memory exhaustion, below).

Env-var contracts:
  GRAFT_DUCKDB_MEM        per-shard memory limit, verbatim.
  GRAFT_DUCKDB_MEM_TOTAL  aggregate budget divided across --jobs
                          (default 24GB, 4GB/shard floor).
  GRAFT_DUCKDB_THREADS    per-shard thread cap (DuckDB defaults to
                          ALL cores per process).
  GRAFT_DUCKDB_TMP        PARENT of per-PID spill subdirs (shard-<pid>/
                          is created underneath) — NOT the spill dir
                          itself. Changed in round 16 when per-shard
                          subdirs landed: DuckDB names spill files
                          deterministically, so shards sharing one
                          temp_directory deleted each other's live
                          spill. Point it at a dedicated mount; don't
                          assert on the exact spill path.
  GRAFT_DISK_WATERMARK_GB refuse/queue threshold (default 12): before
                          each oracle the shard requires this much
                          free space on the spill filesystem, waiting
                          up to GRAFT_DISK_WAIT_SEC (default 600) for
                          a concurrent shard to release spill before
                          marking the query ENVIRONMENTAL unattempted.

ENVIRONMENTAL verdict: a DuckDB failure whose message is resource
exhaustion ("No space left on device", "Out of Memory Error") is the
box failing, not the query — at x100 a single raw_idx CTE spills
10-30 GB and two concurrent spillers can exhaust the disk. Those
print `name: ENVIRONMENTAL ...` (distinct from FAIL/ORACLE ERROR) and
the run exits 3 when they are the only non-green results, so a
harness can retry them serially instead of recording a red query.
"""
import os, re, sys, json, glob, time, shutil, hashlib, subprocess
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ENV_PATTERNS = ("No space left on device", "Out of Memory Error",
                "could not allocate block", "failed to pin block")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()


def shard_mem(jobs: int) -> str:
    """Per-shard DuckDB memory limit. GRAFT_DUCKDB_MEM (if set) is
    taken verbatim PER SHARD (the historical override contract);
    otherwise GRAFT_DUCKDB_MEM_TOTAL (default 24GB) is an AGGREGATE
    budget divided across --jobs shards with a 4GB floor — so the
    default can never multiply into more physical RAM than one serial
    run would have used (--jobs 6 at a naive per-shard 24GB default
    budgets 144GB on a 125GB box: exactly the kernel-OOM mode the
    memory limit exists to prevent)."""
    explicit = os.environ.get("GRAFT_DUCKDB_MEM")
    if explicit:
        return explicit
    total = os.environ.get("GRAFT_DUCKDB_MEM_TOTAL", "24GB")
    m = re.fullmatch(r"(\d+(?:\.\d+)?)\s*GB", total.strip(), re.I)
    if not m or jobs <= 1:
        return total
    return f"{max(4.0, float(m.group(1)) / jobs):g}GB"


def spill_parent(out_dir: str) -> str:
    return os.environ.get("GRAFT_DUCKDB_TMP", f"{out_dir}/.duckspill")


def purge_stale_shards(parent: str):
    """Reclaim shard-<pid> spill dirs left by crashed/killed shards.
    A dir is stale when its PID is not a live process (PIDs differ
    across runs, so no later run would otherwise ever reclaim them —
    the exact leak mode of an OOM-killed x100 shard)."""
    for d in glob.glob(os.path.join(parent, "shard-*")):
        pid = os.path.basename(d)[len("shard-"):]
        if pid.isdigit() and not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(d, ignore_errors=True)


def free_gb(path: str) -> float:
    try:
        return shutil.disk_usage(path).free / (1 << 30)
    except OSError:
        return float("inf")


def wait_for_disk(parent: str) -> bool:
    """Block until the spill filesystem has the watermark free, up to
    GRAFT_DISK_WAIT_SEC. Returns False if it never recovered."""
    need = float(os.environ.get("GRAFT_DISK_WATERMARK_GB", "12"))
    deadline = time.monotonic() + float(
        os.environ.get("GRAFT_DISK_WAIT_SEC", "600"))
    warned = False
    while free_gb(parent) < need:
        if time.monotonic() > deadline:
            return False
        if not warned:
            print(f"[disk] {free_gb(parent):.1f} GB free < "
                  f"{need:g} GB watermark; waiting", flush=True)
            warned = True
        time.sleep(10)
    return True


def main():
    args = sys.argv[1:]
    jobs = 1
    if args and args[0] == "--jobs":
        jobs = int(args[1])
        args = args[2:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    purge_stale_shards(spill_parent(out_dir))
    if jobs > 1:
        names = sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
        names = [n for n in names if not only or n in only]
        # children get their slice of the aggregate budget explicitly,
        # so the per-shard default cannot re-multiply downstream.
        env = dict(os.environ, GRAFT_DUCKDB_MEM=shard_mem(jobs))
        procs = [subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), sf_dir, out_dir]
            + names[i::jobs], env=env) for i in range(jobs) if names[i::jobs]]
        codes = [p.wait() for p in procs]
        # 1 (real failure) dominates 3 (environmental) dominates 0.
        sys.exit(1 if any(c not in (0, 3) for c in codes)
                 else (3 if 3 in codes else 0))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # dialect normalization, same class as the column-name sort: SQL
    # leaves NULL sort position implementation-defined; Spark's
    # default is NULLS FIRST on ASC / LAST on DESC, DuckDB's is the
    # opposite. Invisible on corpora without null sort keys (the
    # driver's sf0.01 gate); required for the degenerate-lake gate.
    con.execute("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    # Bounded memory + a spill dir: DuckDB's default limit (80% of
    # RAM) is per PROCESS, so --jobs shards plus a ×1000-scale
    # search-oracle CTE (the tokenized index materialized over ~600 M
    # lineitem rows) ran the box out of physical memory before any
    # operator chose to spill — the kernel OOM-killed the shard with
    # no output line at all. A hard limit makes DuckDB's own
    # spill-to-disk path take over instead. Override per run:
    # GRAFT_DUCKDB_MEM=40GB (verbatim per shard) or
    # GRAFT_DUCKDB_MEM_TOTAL=48GB (aggregate, auto-divided by --jobs);
    # temp dir defaults beside the output.
    mem = shard_mem(1)
    # Per-PROCESS temp subdir: DuckDB names its spill files
    # deterministically (duckdb_temp_storage-N.tmp), so --jobs shards
    # sharing one temp_directory delete each other's live spill files —
    # observed as a hard duckdb::IOException abort mid-compare at x100.
    parent = spill_parent(out_dir)
    tmp = os.path.join(parent, f"shard-{os.getpid()}")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmp}'")
    # Same aggregate-budget story as memory: DuckDB defaults threads to
    # ALL cores PER PROCESS, so --jobs shards multiply into jobs*cores
    # runnable threads — which starves a Spark Verify sharing the box.
    # GRAFT_DUCKDB_THREADS is per shard (the memory-override contract).
    threads = os.environ.get("GRAFT_DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        # a table may be a single parquet FILE (the driver's testdata)
        # or a Spark-written DIRECTORY (the degenerate lake, scaled
        # corpora) — glob the parts in the directory case.
        p = f"{sf_dir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    ok = True
    environmental = False
    try:
        for name, sql in sorted(oracle.items()):
            if only and name not in only:
                continue
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"{name}: MISSING spark output")
                ok = False
                continue
            if not wait_for_disk(parent):
                print(f"{name}: ENVIRONMENTAL disk below watermark, "
                      f"not attempted ({free_gb(parent):.1f} GB free)")
                environmental = True
                continue
            spark_df = norm(pq.read_table(files[0]).to_pandas())
            try:
                duck_df = norm(con.execute(sql).df())
            except Exception as e:
                msg = str(e)
                if any(p in msg for p in ENV_PATTERNS):
                    print(f"{name}: ENVIRONMENTAL {msg}")
                    environmental = True
                else:
                    print(f"{name}: ORACLE ERROR {msg}")
                    ok = False
                # exhausted spill from the failed oracle would
                # otherwise poison every later query in this shard.
                shutil.rmtree(tmp, ignore_errors=True)
                os.makedirs(tmp, exist_ok=True)
                continue
            rows = len(spark_df) == len(duck_df)
            schema = list(spark_df.columns) == list(duck_df.columns)
            # dtype-insensitive value compare (driver hashes values)
            hmatch = False
            if rows and schema:
                hmatch = value_hash(spark_df) == value_hash(duck_df)
                if not hmatch:
                    # retry with numeric normalization (int32 vs int64 etc.)
                    s2 = spark_df.astype(object).where(pd.notnull(spark_df), None)
                    d2 = duck_df.astype(object).where(pd.notnull(duck_df), None)
                    hmatch = value_hash(s2) == value_hash(d2)
            status = "OK" if (rows and schema and hmatch) else "FAIL"
            if status == "FAIL":
                ok = False
            print(f"{name}: {status} spark_rows={len(spark_df)} oracle_rows={len(duck_df)} "
                  f"rows={rows} schema={schema} hash={hmatch}")
            if status == "FAIL" and rows and schema:
                merged = spark_df.compare(duck_df) if spark_df.shape == duck_df.shape else None
                if merged is not None and not merged.empty:
                    print(merged.head(5))
        con.close()  # flushes + removes this shard's spill files
    finally:
        # unconditional: an unhandled exception (or the atexit path of
        # a SIGTERM) must not leave a 10-30 GB shard dir that no later
        # run reclaims (PIDs differ across runs).
        shutil.rmtree(tmp, ignore_errors=True)
    sys.exit(1 if not ok else (3 if environmental else 0))


if __name__ == "__main__":
    main()
