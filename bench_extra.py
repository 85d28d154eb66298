"""Per-query bench harness for optimization work (guide §1.4 noop-sink
isolation). NOT the frozen driver bench — bench.py is the measured one;
this exists so a single query can be re-timed in seconds while iterating.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [-n N] q1 q2 ...
  python bench_extra.py --all            # every headline query
  python bench_extra.py --plans DIR SUF  # also dump explain("formatted")
                                         # to DIR/<query>_<SUF>.txt

Methodology identical to bench.py: build the DataFrame once, one warm
noop force, then N timed noop forces (default 1) — min and median
reported.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entrymod
    from indra_db_spark.session import get_spark

    args = sys.argv[1:]
    n_rep = 1
    plans_dir = plans_suffix = None
    if "-n" in args:
        i = args.index("-n")
        n_rep = int(args[i + 1])
        del args[i : i + 2]
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir, plans_suffix = args[i + 1], args[i + 2]
        del args[i : i + 3]
        os.makedirs(plans_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")

    qs = entrymod.queries()

    # Same production overrides bench.py times (xxhash64 family).
    from indra_db_spark.operators.dedup_docs import minhash_lsh_candidates, simhash
    from indra_db_spark.operators.textops import winnow_fingerprints

    def _minhash_prod(spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_lsh_candidates(d, hash_fn="xxhash64")

    def _simhash_prod(spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return simhash(d, bits=64, hash_fn="xxhash64")

    def _winnow_prod(spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return winnow_fingerprints(d, k=8, w=4, hash_fn="xxhash64").select(
            "doc_id", "n_fps", "min_fp", "max_fp"
        )

    qs = dict(qs)
    qs["docs_minhash_lsh"] = _minhash_prod
    qs["docs_simhash"] = _simhash_prod
    qs["docs_winnow_prod"] = _winnow_prod

    if "--all" in args:
        import bench as benchmod

        names = list(benchmod.HEADLINE)
    else:
        names = args
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df = qs[name](spark, sf_dir)
        if plans_dir:
            with open(
                os.path.join(plans_dir, f"{name}_{plans_suffix}.txt"), "w"
            ) as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        if n_rep == 0:  # plans-only mode: no execution at all
            out[name] = {}
            continue
        _force(df)  # warm
        samples = []
        for _ in range(n_rep):
            t0 = time.time()
            _force(df)
            samples.append(round(time.time() - t0, 3))
        out[name] = {
            "min": min(samples),
            "med": sorted(samples)[len(samples) // 2],
            "samples": samples,
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
