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
