"""N → 4N scaling-efficiency evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the two cluster sizes are
emulated as two parallelism levels of the same job on the same input
(spark-submit --master local[N] — the driver-sanctioned proxy).
Efficiency = (docs_per_sec_4N / docs_per_sec_N) / 4.

The pair is CAPACITY-GATED (round 5): this VM's deliverable parallelism
varies by hours-scale "host weather" (r4 measured ~8.7 effective cores
in a window where r3 had ~18), so a fixed pair can silently measure the
hypervisor ceiling instead of the engine. A CPU microbenchmark now runs
as a pre-flight: k concurrent hash-loop processes vs one, effective
cores = total work ratio. Each PySpark task slot in the fused extraction
stage drives TWO threads (JVM consumer + Arrow python worker), so
``local[k]`` occupies ~2k busy cores; the pre-flight picks the largest
pair whose UPPER level fits today's capacity at ≥85%:

    local[1] → local[4]  needs ~8 busy cores  (ratio 4, the default)
    local[1] → local[2]  needs ~4 busy cores  (ratio 2, documented
                         fallback interpretation: same job, same input,
                         half the step — efficiency is per-doubling)

and REFUSES with a machine-readable reason (exit 2, refusal note in
BENCH/scaling_latest.md) when even the 2-way pair does not fit — a junk
number is worse than no number. SPARK_SCALE_N / SPARK_SCALE_4N override
the auto-selection (capacity is still measured and recorded).

Usage: python tools/scaling_bench.py [n_pages] [runs]
Writes results to BENCH/scaling_latest.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # running as `python tools/scaling_bench.py`
# puts tools/ (not the repo root) on sys.path — the in-process imports
# (corpus_fingerprint, gen_pages) need the package importable
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


_CORE_PROBE = r'''
import hashlib, time, sys
deadline = time.time() + float(sys.argv[1])
b = b"x" * 4096
n = 0
while time.time() < deadline:
    for _ in range(200):
        b = hashlib.md5(b).digest() * 256
    n += 200
print(n)
'''


def measure_effective_cores(k: int, secs: float = 3.0) -> float:
    """How many cores the host actually delivers at concurrency k:
    total hash-loop iterations of k concurrent processes divided by one
    process's iterations over the same wall window. CPU-bound, no IO —
    the same probe whose ~18 → ~8.7 swing diagnosed the r4 host
    degradation (BENCH/BASELINE.md round-4 section)."""

    def run(n: int) -> int:
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _CORE_PROBE, str(secs)],
                stdout=subprocess.PIPE,
            )
            for _ in range(n)
        ]
        return sum(int(p.communicate()[0]) for p in procs)

    base = run(1)
    return round(run(k) / base, 2)


# (n_level, upper_level, busy cores the upper level needs = 2*upper)
_PAIR_LADDER = [(1, 4, 8), (1, 2, 4)]
_FIT_FRACTION = 0.85


def select_pair() -> tuple[dict, tuple[int, int] | None]:
    """Pre-flight: measure capacity at each candidate's busy-core level,
    pick the largest pair that fits, or None (refuse)."""
    readings: dict[str, float] = {}
    for n, up, busy in _PAIR_LADDER:
        eff = measure_effective_cores(busy)
        readings[f"effective_cores_at_{busy}"] = eff
        if eff >= _FIT_FRACTION * busy:
            return readings, (n, up)
    return readings, None


def build_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(REPO, "indra_db_spark")
        for root, _, files in os.walk(pkg):
            for f_ in files:
                if f_.endswith(".py"):
                    full = os.path.join(root, f_)
                    z.write(full, os.path.relpath(full, REPO))


def gen_pages(n: int, pages_dir: str) -> None:
    sys.path.insert(0, REPO)
    from indra_db_spark.session import get_spark
    from indra_db_spark.sources.synth import synth_pages

    spark = get_spark(app_name="scaling_gen", master="local[32]")
    synth_pages(spark, n, seed=42).write.mode("overwrite").parquet(pages_dir)
    spark.stop()


def run_job(master: str, pkg_zip: str, pages_dir: str, runs: int) -> list[dict]:
    results = []
    for r in range(runs):
        shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
        out_dir = tempfile.mkdtemp(
            prefix=f"kg_scale_{master.replace('[','').replace(']','')}_", dir=shm
        )
        cmd = [
            SPARK_SUBMIT,
            "--master", master,
            "--conf", "spark.sql.shuffle.partitions=64",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.adaptive.coalescePartitions.enabled=true",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.driver.memory=24g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
            # tmpfs for table + shuffle storage: on a real cluster IO
            # bandwidth scales with executor count; a single shared disk
            # would impose a serial floor that misrepresents the engine
            *(["--conf", f"spark.local.dir={shm}/spark_local"] if shm else []),
            "--py-files", pkg_zip,
            os.path.join(REPO, "tools", "kg_job.py"),
            pages_dir, out_dir, f"scale_{master}_{r}",
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not line:
            sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-3000:])
            raise RuntimeError(f"job failed at {master}")
        rec = json.loads(line[-1])
        results.append(rec)
        shutil.rmtree(out_dir, ignore_errors=True)
        print(f"{master} run {r}: {rec['wall_secs']}s, {rec['docs_per_sec']} docs/s", file=sys.stderr)
    return results


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    from indra_db_spark.sources.synth import corpus_fingerprint

    # cache keyed by generator CONTENT, not just size: a grammar/renderer
    # change must regenerate, not silently benchmark stale data
    pages_dir = os.path.join(
        shm, f"kg_scale_pages_{n_pages}_{corpus_fingerprint()}"
    )
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        gen_pages(n_pages, pages_dir)

    pkg_zip = os.path.join(tempfile.gettempdir(), "indra_db_spark.zip")
    build_zip(pkg_zip)

    readings, pair = select_pair()
    print(f"capacity pre-flight: {readings}", file=sys.stderr)
    if os.environ.get("SPARK_SCALE_N") or os.environ.get("SPARK_SCALE_4N"):
        m_n = os.environ.get("SPARK_SCALE_N", "local[1]")
        m_4n = os.environ.get("SPARK_SCALE_4N", "local[4]")
    elif pair is None:
        reason = (
            "host capacity below every candidate pair: "
            + ", ".join(f"{k}={v}" for k, v in readings.items())
            + f" (upper level must fit at >={_FIT_FRACTION:.0%} of its"
            " busy-core need; local[1]/local[2] needs 4)"
        )
        print(json.dumps({"refused": True, "reason": reason, **readings}))
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "scaling_latest.md"), "w") as f:
            f.write(
                "# BENCH — scaling run REFUSED by capacity pre-flight\n\n"
                f"{reason}\n\nA junk number is worse than no number; "
                "re-run when the host recovers.\n"
            )
        sys.exit(2)
    else:
        m_n, m_4n = f"local[{pair[0]}]", f"local[{pair[1]}]"
    ratio = int(m_4n.strip("local[]")) // int(m_n.strip("local[]"))
    res8 = run_job(m_n, pkg_zip, pages_dir, runs)
    res32 = run_job(m_4n, pkg_zip, pages_dir, runs)

    med8 = statistics.median(r["docs_per_sec"] for r in res8)
    med32 = statistics.median(r["docs_per_sec"] for r in res32)
    eff = (med32 / med8) / ratio
    summary = {
        "capacity": readings,
        "ratio": ratio,
        "n_pages": n_pages,
        "runs": runs,
        "masters": [m_n, m_4n],
        "docs_per_sec_n": med8,
        "docs_per_sec_4n": med32,
        "wall_secs_n": statistics.median(r["wall_secs"] for r in res8),
        "wall_secs_4n": statistics.median(r["wall_secs"] for r in res32),
        "scaling_efficiency": round(eff, 3),
        # stage table from the run with the MEDIAN wall time (chronological
        # middle could be any run)
        "stages_n": sorted(res8, key=lambda r: r["wall_secs"])[len(res8) // 2]["stages"],
        "stages_4n": sorted(res32, key=lambda r: r["wall_secs"])[len(res32) // 2]["stages"],
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # write the fresh table to a scratch file — BENCH/BASELINE.md is a
    # curated document carrying multi-round history; merge by hand
    md = os.path.join(REPO, "BENCH", "scaling_latest.md")
    stage_rows = "\n".join(
        f"| {s} | {summary['stages_n'].get(s)} | {summary['stages_4n'].get(s)} |"
        for s in summary["stages_4n"]
    )
    with open(md, "w") as f:
        f.write(f"""# BENCH — measured throughput & scaling efficiency

Protocol (BASELINE.md): same full-pipeline job (`tools/kg_job.py` via
`spark-submit --py-files`) on the SAME synthesized input
({n_pages:,} pages, seed 42, pre-materialized parquet), run at two
parallelism levels as the sandbox proxy for N→{ratio}N executors;
{runs} runs each, median reported. Pair = {m_n} vs {m_4n},
CAPACITY-GATED: the pre-flight CPU microbenchmark measured
{readings} effective cores this session, and the pair is the largest
whose upper level (≈2 busy cores per task slot in the fused extraction
stage) fits ≥{_FIT_FRACTION:.0%} of today's capacity — a pair above
capacity measures the hypervisor ceiling, not the engine.
Input, output tables and spark.local.dir live on tmpfs: a cluster's
aggregate IO bandwidth scales with executor count, so a single shared
disk would impose a serial floor that misrepresents the engine.

| metric | {m_n} (N) | {m_4n} ({ratio}N) |
|---|---|---|
| wall seconds (median) | {summary['wall_secs_n']} | {summary['wall_secs_4n']} |
| docs/sec (median) | {med8} | {med32} |

**Scaling efficiency (docs/sec_{ratio}N / docs/sec_N) / {ratio} = {eff:.3f}**
(target ≥ 0.8 per BASELINE.json)

Per-stage wall seconds (from lineage manifests, median run):

| stage | {m_n} | {m_4n} |
|---|---|---|
{stage_rows}

Raw per-run docs/sec — {m_n}: {[r['docs_per_sec'] for r in res8]},
{m_4n}: {[r['docs_per_sec'] for r in res32]}.

Headline-query timings at sf0.1 live in the driver-recorded
`BENCH_r{{N}}.json` (`bench.py`).
""")
    print(f"wrote {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
