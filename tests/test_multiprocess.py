"""Cross-PROCESS concurrency: the reference runs 5 writer JVMs against
one table (run.sh:36-46). Threads share a GIL and an OS page cache;
real processes exercise the link()-based CAS the way concurrent JVMs
would. Also drives the CLI end to end (create -> writers x5 ->
bookkeeper -> reaper -> history)."""

from __future__ import annotations

import json
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor

from java_iceberg_table_spark.cli import EVENTS_SPARK_SCHEMA
from java_iceberg_table_spark.table import create_table, load_table, truncate
from java_iceberg_table_spark.table.format import load_metadata

WIDTH = 300_000_000


def _writer_process(args: tuple[str, int, int]) -> int:
    root, wid, n_commits = args
    from java_iceberg_table_spark.ingest.writer import Writer
    from java_iceberg_table_spark.table import load_table as lt

    tbl = lt(root)
    w = Writer(tbl, writer_id=wid, seed=1000 + wid)
    for i in range(n_commits):
        entries = w.create_data_files(1, 10, timeperiod_us=i * WIDTH)
        tbl.append_entries(entries)
    return wid


def test_five_processes_direct_commit(tmp_path):
    root = str(tmp_path / "t")
    create_table(root, EVENTS_SPARK_SCHEMA, partition=truncate("timeperiod_loadedBy", WIDTH))
    n_proc, commits_each = 5, 4
    with ProcessPoolExecutor(n_proc) as pool:
        done = list(pool.map(_writer_process, [(root, i, commits_each) for i in range(n_proc)]))
    assert sorted(done) == list(range(n_proc))
    md = load_metadata(root)
    appends = [s for s in md.snapshots if s.operation == "append"]
    assert len(appends) == n_proc * commits_each  # no lost commits across processes
    tbl = load_table(root)
    files = tbl.current_files()
    assert len(files) == n_proc * commits_each
    assert sum(e["rows"] for e in files) == n_proc * commits_each * 10


def _cli(*args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "java_iceberg_table_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_cli_roles_end_to_end(tmp_path):
    root = str(tmp_path / "cli_tbl")
    _cli("create", root)
    # 3 concurrent writer processes, decoupled-commit mode
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "java_iceberg_table_spark.cli",
                "writers", root, "--iterations", "2", "--files", "2",
                "--rows", "5", "--writer-id", str(i),
            ],
            cwd="/root/repo",
            stdout=subprocess.PIPE,
        )
        for i in range(3)
    ]
    for p in procs:
        assert p.wait(timeout=120) == 0
    out = _cli("bookkeeper", root, "--iterations", "1")
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["files"] == 3 * 2 * 2  # 3 writers x 2 iters x 2 files
    tbl = load_table(root)
    assert sum(e["rows"] for e in tbl.current_files()) == 12 * 5
    _cli("reaper", root, "--iterations", "1")
    hist = json.loads(_cli("history", root))
    assert any(s["operation"] == "append" for s in hist)
    _cli("clean", root)
    import os

    assert not os.path.exists(root)


def _maintainer_process(args: tuple[str, int]) -> int:
    """Metadata-plane maintenance racing the writers: snapshot expiry +
    orphan clean in a loop. Must never lose a committed row or delete
    a live file (expiry's CAS retries around writer commits; clean's
    grace window protects in-flight writer output)."""
    root, iterations = args
    from java_iceberg_table_spark.table import load_table as lt

    import time as _time

    tbl = lt(root)
    for _ in range(iterations):
        # cutoff = now: every snapshot is "old enough"; retain_last=3
        # is the only floor — the aggressive end of the expiry race
        tbl.expire_snapshots(
            older_than_ms=int(_time.time() * 1000) + 1, retain_last=3
        )
        tbl.clean()
        _time.sleep(0.05)  # stay overlapped with the writers' commits
    return -1


def test_writers_race_maintenance(tmp_path):
    """4 writer processes commit while a 5th runs expiry loops: every
    committed row survives, every live file exists on disk, and the
    final metadata chain is loadable. The race the reference runs in
    production (writers + bookkeeper/reaper on one table, run.sh) at
    the metadata plane."""
    import os

    root = str(tmp_path / "race")
    create_table(
        root, EVENTS_SPARK_SCHEMA, partition=truncate("timeperiod_loadedBy", WIDTH)
    )
    n_writers, commits_each = 4, 5
    jobs = [(root, i, commits_each) for i in range(n_writers)]
    with ProcessPoolExecutor(n_writers + 1) as pool:
        maint = pool.submit(_maintainer_process, (root, 12))
        done = list(pool.map(_writer_process, jobs))
        assert maint.result() == -1
    assert sorted(done) == list(range(n_writers))
    tbl = load_table(root)
    files = tbl.current_files()
    # every committed row survives expiry (expiry reaps SNAPSHOTS, not
    # the current state), and every live file is physically present
    assert sum(e["rows"] for e in files) == n_writers * commits_each * 10
    for e in files:
        assert os.path.exists(os.path.join(root, e["path"])), e["path"]
    md = load_metadata(root)
    assert md.current_snapshot() is not None
    # one more expiry AFTER the writers stop bounds history
    # deterministically (the racing loop may have finished early);
    # the race above is the stressor, this is the assertable state
    import time as _t

    tbl.expire_snapshots(older_than_ms=int(_t.time() * 1000) + 1, retain_last=3)
    tbl.clean()
    md = load_metadata(root)
    assert len(md.snapshots) <= 3
    files = load_table(root).current_files()
    assert sum(e["rows"] for e in files) == n_writers * commits_each * 10
    for e in files:
        assert os.path.exists(os.path.join(root, e["path"])), e["path"]
