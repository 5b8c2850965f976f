"""TRUE multi-process concurrent-writer stress (VERDICT r9 ask #4).

Prior conflict tests simulated races in-process; here 3 OS processes
(each with its own JVM) race appends + a merge + a compaction over one
Delta table, one Iceberg table, and one catalog table (pointer CAS).
The contracts under test are the formats' optimistic concurrency:

- Delta: pure appends NEVER fail (``_commit_with_retry`` re-validates
  and re-claims the next version); rewrite commits raise
  ``ConcurrentModificationError`` only when a concurrent commit
  actually invalidated them (PROTOCOL.md §Optimistic Concurrency) —
  the caller re-runs against the new snapshot.
- Iceberg: a lost metadata-version claim raises ``FileExistsError``
  (the spec's CommitFailedException shape) — the caller re-runs; data
  already staged by the loser becomes orphan files, never phantom rows.
- Catalog: a lost pointer CAS raises ``CommitConflict`` and withdraws
  the local metadata versions (``run_committed``'s contract), so
  path-readers never see un-pointered snapshots.

Exactness is the assertion: after every process exits cleanly, each
table holds EXACTLY the union of all committed batches — no lost
updates, no duplicates — and the only exceptions any worker saw are
the spec-mandated conflict types (anything else fails the test).
Retry counts are logged for the record.
"""
import json
import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import json, os, sys, time
    sys.path.insert(0, {repo!r})
    wid = int(sys.argv[1])
    base = sys.argv[2]
    out_path = sys.argv[3]

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
             .appName(f"stress-w{{wid}}")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    from sling_cli_spark.sources import delta_py as D
    from sling_cli_spark.sources import iceberg_py as I
    from sling_cli_spark.sources.iceberg_catalog import (
        CommitConflict, SqlCatalog, write_table)

    cat = SqlCatalog(os.path.join(base, "cat.db"),
                     warehouse=os.path.join(base, "wh"))
    dt = os.path.join(base, "dt")
    it = os.path.join(base, "it")

    # the spec-mandated conflict surface — NOTHING else is acceptable
    RETRYABLE = (D.ConcurrentModificationError, FileExistsError,
                 CommitConflict)
    retries = {{"delta": 0, "iceberg": 0, "catalog": 0}}
    errors = []

    def with_retry(kind, fn, attempts=30):
        for _ in range(attempts):
            try:
                return fn()
            except RETRYABLE:
                retries[kind] += 1
                time.sleep(0.05 * (wid + 1))
        errors.append(f"{{kind}}: retries exhausted")

    def batch(r):
        lo = wid * 10_000 + r * 1_000
        return spark.createDataFrame(
            [(lo + i, f"w{{wid}}r{{r}}") for i in range(50)],
            "id long, v string")

    for r in range(4):
        df = batch(r)
        try:
            # Delta appends retry INTERNALLY (pure appends never
            # logically conflict) — an exception here is a bug
            D.write_delta(df, dt, mode="append")
        except Exception as e:
            errors.append(f"delta append: {{type(e).__name__}}: {{e}}")
        with_retry("iceberg",
                   lambda: I.write_iceberg(df, it, mode="append"))
        with_retry("catalog",
                   lambda: write_table(df, cat, "ns.t", mode="append"))
        if wid == 0 and r == 2:
            # update-only merge over this worker's OWN keys: row count
            # must not change; a concurrent rewrite invalidating it
            # raises ConcurrentModificationError -> re-run
            from pyspark.sql import functions as F
            upd = batch(0).withColumn("v", F.expr("substring(v, 1, 2)"))
            with_retry("delta",
                       lambda: D.merge_delta(spark, dt, upd, "id"))
            with_retry("iceberg",
                       lambda: I.merge_iceberg(spark, it, upd, "id"))
        if wid == 1 and r == 2:
            with_retry("delta", lambda: D.optimize_delta(
                spark, dt, target_file_bytes=1 << 30))
            with_retry("iceberg", lambda: I.compact_iceberg(
                spark, it, target_file_bytes=1 << 30))

    with open(out_path, "w") as f:
        json.dump({{"retries": retries, "errors": errors}}, f)
    spark.stop()
""")


def test_three_processes_race_appends_merge_compaction(spark, tmp_path):
    base = str(tmp_path)
    script = os.path.join(base, "worker.py")
    with open(script, "w") as f:
        f.write(_WORKER.format(
            repo=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))

    # pre-create all three tables so the workers race COMMITS, not
    # table creation (two concurrent creators double-writing the
    # metaData action is a different, less interesting race)
    from sling_cli_spark.sources.delta_py import write_delta
    from sling_cli_spark.sources.iceberg_catalog import (
        SqlCatalog, create_table)
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    seed = spark.createDataFrame([], "id long, v string")
    write_delta(seed, os.path.join(base, "dt"))
    write_iceberg(seed, os.path.join(base, "it"))
    cat0 = SqlCatalog(os.path.join(base, "cat.db"),
                      warehouse=os.path.join(base, "wh"))
    cat0.create_namespace("ns")
    create_table(cat0, "ns.t", seed.schema)

    procs = []
    outs = []
    for wid in range(3):
        out = os.path.join(base, f"w{wid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, script, str(wid), base, out],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    results = []
    for p, out in zip(procs, outs):
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, \
            f"worker died: {stderr.decode()[-2000:]}"
        with open(out) as f:
            results.append(json.load(f))
    for i, res in enumerate(results):
        assert res["errors"] == [], f"worker {i}: {res['errors']}"
    total_retries = {
        k: sum(r["retries"][k] for r in results)
        for k in ("delta", "iceberg", "catalog")}
    print(f"conflict retries across 3 workers: {total_retries}")

    # exactness: every batch exactly once on all three tables
    from sling_cli_spark.sources.delta_py import read_delta
    from sling_cli_spark.sources.iceberg_catalog import (
        SqlCatalog, read_table)
    from sling_cli_spark.sources.iceberg_py import read_iceberg

    expect = {w * 10_000 + r * 1_000 + i
              for w in range(3) for r in range(4) for i in range(50)}
    d = read_delta(spark, os.path.join(base, "dt"))
    assert {r.id for r in d.select("id").collect()} == expect
    assert d.count() == 600
    it = read_iceberg(spark, os.path.join(base, "it"))
    assert {r.id for r in it.select("id").collect()} == expect
    assert it.count() == 600
    cat = SqlCatalog(os.path.join(base, "cat.db"),
                     warehouse=os.path.join(base, "wh"))
    ct = read_table(cat, spark, "ns.t")
    assert {r.id for r in ct.select("id").collect()} == expect
    assert ct.count() == 600
    # worker 0's merge really applied: its round-0 rows carry the
    # 2-char updated value
    assert d.filter("id < 1000 and v = 'w0'").count() == 50
    assert it.filter("id < 1000 and v = 'w0'").count() == 50


_REST_WORKER = textwrap.dedent("""
    import json, sys, time
    sys.path.insert(0, {repo!r})
    wid = int(sys.argv[1])
    uri = sys.argv[2]
    out_path = sys.argv[3]

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
             .appName(f"rest-stress-w{{wid}}")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    from sling_cli_spark.sources.iceberg_catalog import (
        CommitConflict, write_table)
    from sling_cli_spark.sources.iceberg_rest import RestCatalog

    cat = RestCatalog(uri, token="s3")
    retries = 0
    errors = []
    for r in range(4):
        df = spark.createDataFrame(
            [(wid * 10_000 + r * 1_000 + i, f"w{{wid}}r{{r}}")
             for i in range(50)], "id long, v string")
        for attempt in range(40):
            try:
                write_table(df, cat, "db.t", mode="append")
                break
            except (CommitConflict, FileExistsError):
                retries += 1
                time.sleep(0.05 * (wid + 1))
        else:
            errors.append(f"round {{r}}: retries exhausted")
    with open(out_path, "w") as f:
        json.dump({{"retries": retries, "errors": errors}}, f)
    spark.stop()
""")


def test_three_processes_race_rest_catalog_commits(spark, tmp_path):
    """The same exactness contract through the REST commit handshake:
    3 processes append via requirements/updates commits over a real
    socket; a lost assert-ref-snapshot-id CAS surfaces as
    CommitConflict (409) and the worker re-runs — final table holds
    exactly the union."""
    from sling_cli_spark.sources.iceberg_catalog import (
        SqlCatalog, create_table, read_table)
    from sling_cli_spark.sources.iceberg_rest import RestCatalogServer

    base = str(tmp_path)
    store = SqlCatalog(os.path.join(base, "cat.db"),
                       warehouse=os.path.join(base, "wh"))
    srv = RestCatalogServer(store, token="s3").start()
    try:
        store.create_namespace("db")
        seed = spark.createDataFrame([], "id long, v string")
        create_table(store, "db.t", seed.schema)

        script = os.path.join(base, "rest_worker.py")
        with open(script, "w") as f:
            f.write(_REST_WORKER.format(
                repo=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))))
        procs, outs = [], []
        for wid in range(3):
            out = os.path.join(base, f"rw{wid}.json")
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, script, str(wid), srv.uri, out],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE))
        results = []
        for p, out in zip(procs, outs):
            _, stderr = p.communicate(timeout=600)
            assert p.returncode == 0, \
                f"worker died: {stderr.decode()[-2000:]}"
            with open(out) as f:
                results.append(json.load(f))
        for i, res in enumerate(results):
            assert res["errors"] == [], f"worker {i}: {res['errors']}"
        print("REST commit-conflict retries:",
              sum(r["retries"] for r in results))

        expect = {w * 10_000 + r * 1_000 + i
                  for w in range(3) for r in range(4) for i in range(50)}
        got = read_table(store, spark, "db.t")
        assert {r.id for r in got.select("id").collect()} == expect
        assert got.count() == 600
    finally:
        srv.stop()


_TXN_WORKER = textwrap.dedent("""
    import json, os, sys, time
    sys.path.insert(0, {repo!r})
    wid = int(sys.argv[1])
    base = sys.argv[2]
    out_path = sys.argv[3]

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
             .appName(f"txn-w{{wid}}")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    from sling_cli_spark.sources.iceberg_catalog import (
        CommitConflict, SqlCatalog, run_committed_many)
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    cat = SqlCatalog(os.path.join(base, "cat.db"),
                     warehouse=os.path.join(base, "wh"))
    retries = 0
    errors = []

    def batch(r):
        lo = wid * 10_000 + r * 1_000
        return spark.createDataFrame(
            [(lo + i, f"w{{wid}}r{{r}}") for i in range(50)],
            "id long, v string")

    for r in range(3):
        df = batch(r)
        # generous budget: a rival txn holds the hint for the length
        # of TWO Spark writes, which under a loaded machine is many
        # seconds — exhaustion here must mean livelock, not load.
        # FileNotFoundError is retryable too: a loser withdrawing its
        # staged metadata can momentarily vanish a file a racer's
        # re-read had just listed — the same claim race.
        deadline = time.time() + 300
        while True:
            try:
                # BOTH tables advance in one atomic pointer swap
                run_committed_many(cat, [
                    ("ns.a", lambda loc: write_iceberg(
                        df, loc, mode="append")),
                    ("ns.b", lambda loc: write_iceberg(
                        df, loc, mode="append")),
                ])
                break
            except (CommitConflict, FileExistsError,
                    FileNotFoundError):
                retries += 1
                if time.time() > deadline:
                    errors.append(f"round {{r}}: retries exhausted")
                    break
                time.sleep(0.1 * (wid + 1))

    with open(out_path, "w") as f:
        json.dump({{"retries": retries, "errors": errors}}, f)
    spark.stop()
""")


def test_processes_race_atomic_two_table_txns(spark, tmp_path):
    """r10: OS processes race ATOMIC two-table transactions
    (run_committed_many): losers retry on CommitConflict only, and the
    tables can never diverge — equal exact row counts at the end."""
    import json as _json
    import os as _os

    from sling_cli_spark.sources.iceberg_catalog import (
        SqlCatalog, create_table, read_table)

    base = str(tmp_path)
    cat = SqlCatalog(_os.path.join(base, "cat.db"),
                     warehouse=_os.path.join(base, "wh"))
    cat.create_namespace("ns")
    schema = spark.createDataFrame([], "id long, v string").schema
    create_table(cat, "ns.a", schema)
    create_table(cat, "ns.b", schema)

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(
        __file__)))
    script = _TXN_WORKER.format(repo=repo)
    procs, outs = [], []
    for wid in range(2):
        out = _os.path.join(base, f"w{wid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script, str(wid), base, out],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-800:]

    total_retries = 0
    for out in outs:
        got = _json.loads(open(out).read())
        assert got["errors"] == [], got["errors"]
        total_retries += got["retries"]
    a = read_table(cat, spark, "ns.a")
    b = read_table(cat, spark, "ns.b")
    # 2 workers x 3 rounds x 50 rows, in BOTH tables — exact
    assert a.count() == 300 and b.count() == 300
    assert {r.id for r in a.collect()} == {r.id for r in b.collect()}
    print(f"atomic txn stress: {total_retries} retries")
