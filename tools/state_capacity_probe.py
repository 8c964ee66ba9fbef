#!/usr/bin/env python
"""Beyond-memory state-store crossover probe (VERDICT r11 #6).

The r11 store-provider A/B ran at 1M state rows comfortably IN-HEAP,
where the HDFS-backed map store wins (RocksDB read 1.1-1.2x slower).
The 100 TB playbook — "flip the provider when per-partition state
approaches executor memory" — therefore had a measured LOSS region
but only an asserted WIN region. This probe measures the win region:
replay the salted decade fixture through `streaming_dedup` (union of
the stream with itself -> dropDuplicates(event_id); state rows =
distinct event ids = 100k x replicas; driven into a streaming NOOP
sink — _run_dedup_noop explains why not the registered query's
memory sink) in a FRESH subprocess per arm,
with a deliberately small JVM heap, and record where the HDFS-backed
provider degrades (GC thrash / OOM) while RocksDB — whose working set
lives in NATIVE memory and on local disk, outside -Xmx — stays flat.

    python tools/restage_decade.py                     # sf1 (1M keys)
    python tools/restage_decade.py --replicas 20 \\
        --out .tmp/decadedata/sf2                      # sf2 (2M keys)
    python tools/restage_decade.py --replicas 40 \\
        --out .tmp/decadedata/sf4                      # sf4 (4M keys)
    python tools/state_capacity_probe.py --heaps 8g,1300m

Each arm = (fixture, provider, heap) in its own interpreter/JVM so
-Xmx and the state-store singleton caches cannot leak across arms.
The child reports one JSON line: wall, summed addBatch/commit ms,
peak state rows/bytes (StreamingQueryProgress.stateOperators), JVM
GC time, Runtime.maxMemory (verifies the heap pin took), and outcome
ok | error(msg) — an OOMed JVM surfaces as error/timeout. The RocksDB
arm also enables changelog checkpointing, the form a long-running
100 TB deployment would use (delta-commit to the checkpoint log
instead of full SST upload).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

FIXTURES = [
    ("sf1", os.path.join(REPO, ".tmp", "decadedata", "sf1")),
    ("sf2", os.path.join(REPO, ".tmp", "decadedata", "sf2")),
    ("sf3", os.path.join(REPO, ".tmp", "decadedata", "sf3")),
    ("sf4", os.path.join(REPO, ".tmp", "decadedata", "sf4")),
]


def _gc_ms(spark) -> int:
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


class _StallTimeout(TimeoutError):
    """Stream still running at the probe deadline — or dead mid-replay
    (see _run_dedup_noop's except clause); either way it carries the
    partial per-batch progress so a failed arm still reports its
    curve (n_batches, state rows, first_warn_batch)."""

    def __init__(self, msg: str, progress: list[dict]):
        super().__init__(msg)
        self.progress = progress


def _run_dedup_noop(spark, sf_dir: str, mpt: int | None) -> list[dict]:
    """The probe pipeline: streaming_dedup's exact state shape (stream
    unioned with itself -> dropDuplicates(event_id), state rows =
    distinct event ids) but driven into a streaming NOOP sink instead
    of the registered query's memory sink. The memory sink would hold
    every deduped row on the driver (~4M rows at sf4 — GBs of heap
    that BOTH providers pay equally), which at a small -Xmx would OOM
    the arm on sink memory and mask the state-store crossover this
    probe exists to measure. State-partition pin 8 matches the
    registered query (session conf is pinned into the offset log at
    the first batch; one query per child process, so no lock needed).
    Returns per-batch progress dicts."""
    import json as _json
    import tempfile

    from gostream_spark.streaming.ops import dedup_stream
    from gostream_spark.streaming.source import file_stream

    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ev = file_stream(spark, sf_dir, "events", mpt)
    doubled = ev.union(file_stream(spark, sf_dir, "events", mpt))
    dd = dedup_stream(doubled, keys=["event_id"], unbounded_state=True)
    ckpt = tempfile.mkdtemp(prefix="gs-capacity-ckpt-")
    q = (
        dd.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(2100):
            # Keep the per-batch curve: the r12 sf4/1300m stall showed
            # batches committing at full speed right up to the cliff,
            # and that reading had to be reconstructed from checkpoint
            # offset mtimes because the progress list was lost here.
            partial = [_json.loads(p.json) for p in q.recentProgress]
            raise _StallTimeout(
                "probe stream still running after 2100s", partial
            )
        out = [_json.loads(p.json) for p in q.recentProgress]
        # Disk-budget reading (r13): du of the checkpoint tree (state
        # snapshots + RocksDB changelog + offsets/commits) before the
        # finally-block rmtree — the `spark.local.dir`/checkpoint
        # space a production flip must budget alongside RAM. Rides on
        # the function attribute (last_ckpt_mib) read by child().
        total = 0
        for root, _dirs, files in os.walk(ckpt):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        _run_dedup_noop.last_ckpt_mib = round(total / 1048576, 1)
        return out
    except _StallTimeout:
        raise
    except Exception as e:  # noqa: BLE001
        # A mid-replay death (StreamingQueryException from a task OOM
        # — observed 1-in-8 on the r13 cliff-arm trials) must carry
        # its partial curve too, or the arm reports outcome=error with
        # n_batches/first_warn_batch lost (exactly the data that shows
        # whether the guard warned before the death). Re-raise as
        # _StallTimeout so the child's handler extracts the tail the
        # same way; the message keeps the original exception type.
        try:
            partial = [_json.loads(p.json) for p in q.recentProgress]
        except Exception:  # noqa: BLE001 — gateway may be dead
            raise e from None
        raise _StallTimeout(
            f"stream died mid-replay: {type(e).__name__}: "
            f"{str(e)[:200]}",
            partial,
        ) from e
    finally:
        # In the mid-replay-death path the gateway may already be
        # dead; an unguarded stop() raising here would REPLACE the
        # in-flight _StallTimeout carrying the partial per-batch
        # curve — the very data the recovery path preserves.
        try:
            q.stop()
        except Exception:  # noqa: BLE001
            pass
        # RocksDB changelog checkpointing writes GBs of SST/changelog
        # per sf4 arm; 16 arms of leaked mkdtemp dirs is real disk.
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)


def _jvm_mem_mib(spark) -> dict:
    """JVM-process memory snapshot from /proc (Linux): resident set,
    peak resident (VmHWM), and committed/used heap. RSS - committed
    heap ≈ native footprint (RocksDB memtables + block cache + SST
    page cache pins + JVM metaspace/threads) — the part that must be
    budgeted as `spark.executor.memoryOverhead`, invisible to -Xmx.
    Differencing RSS across arms with growing state rows at the SAME
    heap cancels the constant JVM baseline and yields native B/row."""
    try:
        jvm = spark.sparkContext._jvm
        pid = jvm.java.lang.ProcessHandle.current().pid()
        rt = jvm.java.lang.Runtime.getRuntime()
        fields = {}
        with open(f"/proc/{pid}/status") as fh:
            for ln in fh:
                if ln.startswith(("VmRSS:", "VmHWM:")):
                    k, v = ln.split(":", 1)
                    fields[k] = int(v.strip().split()[0]) // 1024  # kB->MiB
        return {
            "rss_mib": fields.get("VmRSS", 0),
            "rss_peak_mib": fields.get("VmHWM", 0),
            "heap_committed_mib": int(rt.totalMemory() / 1048576),
            "heap_used_mib": int(
                (rt.totalMemory() - rt.freeMemory()) / 1048576
            ),
        }
    except Exception:  # noqa: BLE001 — JVM gone or non-Linux /proc
        return {}


def child(sf_dir: str, provider: str, warmup_dir: str) -> None:
    from gostream_spark.session import get_spark

    spark = get_spark(app_name="state_capacity_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
    _run_dedup_noop(spark, warmup_dir, None)  # JIT warm-up
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    gc0, t0 = _gc_ms(spark), time.perf_counter()
    out: dict = {
        "provider": provider,
        "max_heap_mib": int(rt.maxMemory() / 1048576),
    }
    try:
        progress = _run_dedup_noop(spark, sf_dir, 1)
        wall = time.perf_counter() - t0
        # Guard lead time (r13): evaluate the runtime guard's pure
        # core on each batch's progress and report the first batch
        # it would warn at — turns "the 0.5x flip rule warns before
        # the ~0.7x cliff" from an inference into a per-arm reading.
        from gostream_spark.streaming.runner import (
            state_pressure_warning,
        )

        first_warn = next(
            (
                b.get("batchId")
                for b in progress
                if state_pressure_warning(b, rt.maxMemory())
            ),
            None,
        )
        batches = [
            {
                "add": (b.get("durationMs") or {}).get("addBatch", 0),
                "commit": sum(
                    o.get("commitTimeMs", 0)
                    for o in (b.get("stateOperators") or [])
                ),
                "rows": sum(
                    o.get("numRowsTotal", 0)
                    for o in (b.get("stateOperators") or [])
                ),
                "bytes": sum(
                    o.get("memoryUsedBytes", 0)
                    for o in (b.get("stateOperators") or [])
                ),
            }
            for b in progress
        ]
        out.update(
            outcome="ok",
            wall_s=round(wall, 2),
            gc_ms=_gc_ms(spark) - gc0,
            add_batch_ms=sum(b["add"] for b in batches),
            commit_ms=sum(b["commit"] for b in batches),
            state_rows=max((b["rows"] for b in batches), default=0),
            state_mib=round(
                max((b["bytes"] for b in batches), default=0) / 1048576, 1
            ),
            n_batches=len(batches),
            first_warn_batch=first_warn,
            ckpt_mib=getattr(_run_dedup_noop, "last_ckpt_mib", None),
            **_jvm_mem_mib(spark),
        )
    except Exception as e:  # noqa: BLE001 — OOM arms die many ways
        # _gc_ms is a Py4J round-trip; if the JVM is already dead (the
        # OOM case this probe exists to catch) it raises INSIDE this
        # handler and the CAPACITY_JSON line is lost, downgrading a
        # classified error to a bare 'died' row. Never let it.
        try:
            gc_delta = _gc_ms(spark) - gc0
        except Exception:  # noqa: BLE001
            gc_delta = 0
        out.update(
            outcome="error",
            wall_s=round(time.perf_counter() - t0, 2),
            gc_ms=gc_delta,
            error=f"{type(e).__name__}: {str(e)[:300]}",
            **_jvm_mem_mib(spark),
        )
        if isinstance(e, _StallTimeout) and e.progress:
            tail = [
                {
                    "batch": b.get("batchId"),
                    "add_ms": (b.get("durationMs") or {}).get("addBatch", 0),
                    "rows": sum(
                        o.get("numRowsTotal", 0)
                        for o in (b.get("stateOperators") or [])
                    ),
                }
                for b in e.progress
            ]
            try:
                from gostream_spark.streaming.runner import (
                    state_pressure_warning,
                )

                fw = next(
                    (
                        b.get("batchId")
                        for b in e.progress
                        if state_pressure_warning(b, rt.maxMemory())
                    ),
                    None,
                )
            except Exception:  # noqa: BLE001
                fw = None
            out.update(
                n_batches=len(e.progress),
                state_rows=max((b["rows"] for b in tail), default=0),
                batch_tail=tail[-8:],
                first_warn_batch=fw,
            )
    print("CAPACITY_JSON " + json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--sf-dir")
    ap.add_argument("--provider", choices=("hdfs", "rocksdb"))
    ap.add_argument("--heaps", default="8g,1300m")
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument(
        "--warmup-dir",
        default=os.environ.get(
            "SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.01"
        ),
        help="small fixture for the JIT warm-up pass (restage_decade's "
        "--src pattern: env/flag with the sandbox path as default, so "
        "the probe ports to machines without /root/testdata)",
    )
    ap.add_argument(
        "--providers",
        default="hdfs,rocksdb",
        help="comma list; e.g. --providers rocksdb for a native-memory-"
        "only sweep",
    )
    opts = ap.parse_args()
    if opts.child:
        child(opts.sf_dir, opts.provider, opts.warmup_dir)
        return

    heaps = [h.strip() for h in opts.heaps.split(",") if h.strip()]
    providers = [p.strip() for p in opts.providers.split(",") if p.strip()]
    print(
        "| fixture | heap | provider | outcome | wall | gc s | addBatch s "
        "| commit s | state rows | state MiB | rss MiB | rss peak "
        "| heap comm | heap used | warn@ |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for label, sf_dir in FIXTURES:
        if not os.path.isdir(sf_dir):
            continue
        for heap in heaps:
            for provider in providers:
                env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=heap)
                try:
                    p = subprocess.run(
                        [
                            sys.executable,
                            os.path.abspath(__file__),
                            "--child",
                            "--sf-dir",
                            sf_dir,
                            "--provider",
                            provider,
                            "--warmup-dir",
                            opts.warmup_dir,
                        ],
                        capture_output=True,
                        text=True,
                        timeout=opts.timeout,
                        env=env,
                        cwd=REPO,
                    )
                    line = next(
                        (
                            ln
                            for ln in p.stdout.splitlines()
                            if ln.startswith("CAPACITY_JSON ")
                        ),
                        None,
                    )
                    if line:
                        r = json.loads(line[len("CAPACITY_JSON "):])
                    else:  # JVM died before reporting (hard OOM)
                        tail = (p.stderr or p.stdout).strip().splitlines()
                        r = {
                            "outcome": "died",
                            "error": (tail[-1][:200] if tail else "no output"),
                        }
                except subprocess.TimeoutExpired:
                    r = {"outcome": f"timeout>{opts.timeout}s"}
                cells = (
                    f"| {label} | {heap} | {provider} | {r['outcome']} "
                    f"| {r.get('wall_s', '-')}s "
                    f"| {r.get('gc_ms', 0) / 1000:.1f} "
                    f"| {r.get('add_batch_ms', 0) / 1000:.1f} "
                    f"| {r.get('commit_ms', 0) / 1000:.1f} "
                    f"| {r.get('state_rows', '-')} "
                    f"| {r.get('state_mib', '-')} "
                    f"| {r.get('rss_mib', '-')} "
                    f"| {r.get('rss_peak_mib', '-')} "
                    f"| {r.get('heap_committed_mib', '-')} "
                    f"| {r.get('heap_used_mib', '-')} "
                    f"| {r.get('first_warn_batch', '-')} |"
                )
                print(cells, flush=True)
                if r.get("error"):
                    print(f"  <!-- {label}/{heap}/{provider}: {r['error']} -->")


if __name__ == "__main__":
    main()
