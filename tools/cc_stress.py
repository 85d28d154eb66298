"""Connected-components stress benchmark — large random graph, measured
rounds + wall (backs the 'CC beyond sandbox corpora' scale claim with a
number; see BENCH/BASELINE.md notes).

Usage: python tools/cc_stress.py [n_edges] [n_nodes] [local|reliable]

The edge list is generated distributed (spark.range → xxhash64-derived
endpoints, no driver-side materialization) — a supernode-free sparse
random graph whose giant component covers most nodes, the hard case for
label-propagation-style CC (many rounds, big frontier).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else n_edges // 3
    mode = sys.argv[3] if len(sys.argv) > 3 else "local"

    from pyspark.sql import functions as F

    from indra_db_spark.operators.components import connected_components
    from indra_db_spark.session import get_spark

    spark = get_spark(app_name="cc_stress")
    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_nodes)).alias(
            "supported_mk_hash"
        ),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(n_nodes)).alias(
            "supporting_mk_hash"
        ),
    )

    ckpt_dir = None
    if mode == "reliable":
        base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
        ckpt_dir = f"{base}/cc_stress_ckpt"
    stats: dict = {}
    t0 = time.time()
    cc = connected_components(
        edges, checkpoint=mode, checkpoint_dir=ckpt_dir, stats=stats
    )
    n_comp = cc.select("component_id").distinct().count()
    n_nodes_seen = cc.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "n_edges_requested": n_edges,
                "n_edges_distinct": stats.get("edges_in"),
                "n_nodes": n_nodes_seen,
                "n_components": n_comp,
                "rounds": stats.get("rounds"),
                "star_tests": stats.get("star_tests"),
                "wall_sec": round(wall, 2),
                "edges_per_sec": round(stats.get("edges_in", 0) / wall, 1),
                "checkpoint": mode,
            }
        )
    )


if __name__ == "__main__":
    main()
