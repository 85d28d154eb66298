"""N → 4N scaling-efficiency evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the two cluster sizes are
emulated as two parallelism levels of the same job on the same input
(spark-submit --master local[N] — the driver-sanctioned proxy).
Efficiency = (docs_per_sec_4N / docs_per_sec_N) / 4.

The pair defaults to ``local[1]`` → ``local[4]`` (override with
SPARK_SCALE_N / SPARK_SCALE_4N). Why so low: (a) a CPU microbenchmark
shows this VM delivers ~18 effective cores (32 procs complete 32x work
in ~2.2x single-proc time), so an 8→32 pair measures the hypervisor
ceiling, not the engine; (b) each PySpark task slot in the fused
extraction stage drives TWO threads (JVM consumer + Arrow python
worker), so local[k] really occupies ~2k cores — local[4] ≈ 8 busy
cores stays inside the machine's real parallelism while preserving the
4x resource ratio.

Usage: python tools/scaling_bench.py [n_pages] [runs]
Writes results to BENCH/BASELINE.md and prints a JSON summary.
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

    import os as _os

    m_n = _os.environ.get("SPARK_SCALE_N", "local[1]")
    m_4n = _os.environ.get("SPARK_SCALE_4N", "local[4]")
    res8 = run_job(m_n, pkg_zip, pages_dir, runs)
    res32 = run_job(m_4n, pkg_zip, pages_dir, runs)

    med8 = statistics.median(r["docs_per_sec"] for r in res8)
    med32 = statistics.median(r["docs_per_sec"] for r in res32)
    eff = (med32 / med8) / 4.0
    summary = {
        "n_pages": n_pages,
        "runs": runs,
        "masters": [m_n, m_4n],
        "docs_per_sec_n": med8,
        "docs_per_sec_4n": med32,
        "wall_secs_n": statistics.median(r["wall_secs"] for r in res8),
        "wall_secs_4n": statistics.median(r["wall_secs"] for r in res32),
        "scaling_efficiency_n_to_4n": round(eff, 3),
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
parallelism levels as the sandbox proxy for N→4N executors; {runs} runs
each, median reported. Pair = {m_n} vs {m_4n}: a CPU microbenchmark shows
this VM delivers ~18 effective cores (32 parallel procs run 32x work in
~2.2x single-proc time), so both levels are kept inside the machine's
real parallelism — an 8→32 pair measures the hypervisor ceiling, not the
engine (observed: local[32] ~= local[8] wall on identical input).
Input, output tables and spark.local.dir live on tmpfs: a cluster's
aggregate IO bandwidth scales with executor count, so a single shared
disk would impose a serial floor that misrepresents the engine.

| metric | {m_n} (N) | {m_4n} (4N) |
|---|---|---|
| wall seconds (median) | {summary['wall_secs_n']} | {summary['wall_secs_4n']} |
| docs/sec (median) | {med8} | {med32} |

**Scaling efficiency (docs/sec_4N / docs/sec_N) / 4 = {eff:.3f}**
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
