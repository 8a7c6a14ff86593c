"""Effective-cores evidence for the scaling protocol (BASELINE.md).

On a single shared box, a ``local[C]`` leg does NOT use C cores: every
pandas-UDF task runs a separate CPU-bound Python worker process, and the
driver / JVM service threads (codegen, shuffle, GC) run unpinned besides.
So the LOW-core leg of an N→4N pair gets proportionally more "free" compute
than the high-core leg, structurally capping the measurable nominal-core
efficiency below the true executor-isolated value.

This script quantifies that: it runs one crawl-only bench leg at the given
nominal core count while SAMPLING the whole process tree's cumulative CPU
(/proc/<pid>/stat utime+stime of every descendant, 1 Hz; a process that
dies keeps its last observed value), and reports actual-CPU / wall =
EFFECTIVE cores used.

Run: python scripts/effective_cores.py <cpus> [sf_dir]
Prints one JSON line {nominal_cores, effective_cores, wall_s, cpu_s, bench}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HZ = os.sysconf("SC_CLK_TCK")


def _descendants(root_pid: int) -> set[int]:
    ppid_of: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid_of[int(d)] = int(parts[1])  # field 4 (ppid)
        except (OSError, IndexError, ValueError):
            continue
    out = {root_pid}
    changed = True
    while changed:
        changed = False
        for pid, ppid in ppid_of.items():
            if ppid in out and pid not in out:
                out.add(pid)
                changed = True
    return out


def _cpu_ticks(pid: int) -> int | None:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return int(parts[11]) + int(parts[12])  # utime + stime
    except (OSError, IndexError, ValueError):
        return None


def main():
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_CRAWL_ONLY="1",
        SPARK_GRAFT_BODY_WORDS=os.environ.get("SPARK_GRAFT_BODY_WORDS", "6000"),
        SPARK_GRAFT_WEB_PAGES=os.environ.get("SPARK_GRAFT_WEB_PAGES", "150000"),
        SPARK_GRAFT_TIMED_ROUNDS=os.environ.get("SPARK_GRAFT_TIMED_ROUNDS", "3"),
    )
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    seen_ticks: dict[int, int] = {}
    stop = threading.Event()

    def _sample():
        while not stop.is_set():
            for pid in _descendants(proc.pid):
                t = _cpu_ticks(pid)
                if t is not None:
                    seen_ticks[pid] = max(seen_ticks.get(pid, 0), t)
            stop.wait(1.0)

    sampler = threading.Thread(target=_sample, daemon=True)
    sampler.start()
    out = proc.stdout.read()
    proc.wait()
    stop.set()
    sampler.join(timeout=5)
    wall = time.time() - t0
    cpu = sum(seen_ticks.values()) / HZ
    bench = None
    for line in out.replace("\r", "\n").splitlines():
        if line.startswith("{") and '"metric"' in line:
            bench = json.loads(line)
    print(
        json.dumps(
            {
                "nominal_cores": cpus,
                "effective_cores": round(cpu / wall, 2),
                "wall_s": round(wall, 1),
                "cpu_s": round(cpu, 1),
                "n_procs_seen": len(seen_ticks),
                "bench": bench,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
