"""Scale probe: replicate the fixture tables Nx (key-offset so join
cardinalities stay realistic) and measure how the headline plans scale.

The local bench (sf0.1) verifies latency shape; this probe is the
next-best local evidence for the 100 TB question: if a plan's latency
scales ~linearly from sf0.1 to sf1-equivalent on the same 32 cores, its
shuffle/join structure has no quadratic or driver-bound term hiding in
it (a plan with one would blow past linear immediately at 10x).

Usage: python tools/scale_probe.py [src_sf_dir] [replicas] [--mutate]
       [--reuse] [query ...]

--reuse: skip the replica rebuild when the destination already holds a
COMPLETE build from the same source (tracked by a .source marker
written last; a marker from a different source refuses the run).
Writes /tmp/gpe_scale_x{N} (or ..._mut); prints one JSON line per query
with base and scaled steady-state latencies and the ratio.

--mutate: perturb ~5% of words per documents replica (deterministic
hash-positioned, suffix-tagged) so replicas are NEAR-duplicates of the
original rather than exact copies.  This is the honest adversary for
the post-r3 dedup family: exact copies collapse via exact_text_groups
before any LSH work, so exact-copy replicas no longer stress the
banding/verification path at all — mutated copies cannot collapse and
must flow through the full LSH + verify machinery.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.catalog import TABLES, t
from go_pulsar_elasticsearch_spark.registry import QUERIES
from go_pulsar_elasticsearch_spark.session import get_spark

gpe.load_all()

from pyspark.sql import DataFrame, functions as F

# per-replica key offsets: keep PK/FK relationships intact per replica
# (replica i's orders reference replica i's customers), so joins scale
# linearly instead of multiplying across replicas
_OFFSETS = {
    "orders": {"o_orderkey": 10**12, "o_custkey": 10**9},
    "lineitem": {"l_orderkey": 10**12},
    "customer": {"c_custkey": 10**9},
    "events": {"event_id": 10**12, "user_id": 10**9},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
}
_DIMS = ("region", "nation", "supplier", "part")  # shared, not replicated


def build(spark, src: str, dst: str, replicas: int, mutate: bool = False) -> None:
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    for name in TABLES:
        df = t(spark, src, name)
        if name in _DIMS:
            out = df
        else:
            parts = []
            for i in range(replicas):
                p = df
                for col, step in _OFFSETS[name].items():
                    p = p.withColumn(col, F.col(col) + F.lit(i * step))
                if mutate and name == "documents" and i > 0:
                    # ~5% of word positions per copy get a replica-tagged
                    # suffix; positions vary by (doc, position, replica)
                    # via murmur3 (deterministic for fixed args), so each
                    # copy is a ~0.95-Jaccard NEAR-dup of the original —
                    # it cannot exact-collapse, and its shingles/sigs
                    # genuinely differ
                    p = p.withColumn(
                        "text",
                        F.expr(
                            "concat_ws(' ', transform(split(text, ' '),"
                            f" (w, j) -> CASE WHEN pmod(hash(doc_id, j, {i}), 20) = 0"
                            f" THEN concat(w, '~{i}') ELSE w END))"
                        ),
                    )
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
    # marker written LAST: its presence certifies a complete build from
    # this source (an interrupted build has no marker and is rebuilt;
    # a --reuse against a different src is rejected in main)
    with open(os.path.join(dst, ".source"), "w") as fh:
        fh.write(os.path.abspath(src))


def steady(spark, name: str, sf_dir: str, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
    return round(best, 3)


DEFAULT_QUERIES = [
    "agg_grouped",
    "join_multiway_star",
    "tpch_q5",
    "tpch_q18",
    "win_ranking",
    "exact_dedup",
    "near_dedup_minhash",
    "events_sessionize",
    "curation_pipeline",
    "gopher_quality_filter",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    mutate = "--mutate" in args
    if mutate:
        args.remove("--mutate")
    reuse = "--reuse" in args
    if reuse:
        args.remove("--reuse")
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    replicas = int(args[1]) if len(args) > 1 else 10
    names = args[2:] or DEFAULT_QUERIES
    dst = f"/tmp/gpe_scale_x{replicas}" + ("_mut" if mutate else "")
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    marker = os.path.join(dst, ".source")
    built_from = None
    if os.path.exists(marker):
        with open(marker) as fh:
            built_from = fh.read().strip()
    if reuse and built_from is not None and built_from != os.path.abspath(src):
        sys.exit(
            f"--reuse refused: {dst} was built from {built_from}, "
            f"not {src}; drop --reuse to rebuild"
        )
    # reuse only a COMPLETE build from the same source (marker is the
    # last file build() writes)
    if not (reuse and built_from == os.path.abspath(src)):
        build(spark, src, dst, replicas, mutate)
    for name in names:
        base = steady(spark, name, src)
        big = steady(spark, name, dst)
        print(
            json.dumps(
                {
                    "query": name,
                    "base_s": base,
                    f"x{replicas}_s": big,
                    "ratio": round(big / base, 2) if base > 0 else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
