"""Near-duplicate cluster resolution: connected components over the
MinHash candidate-pair graph, by iterative min-label propagation.

Dedup at corpus scale isn't done pair-by-pair: candidate pairs form a
graph whose connected components are duplicate clusters; one canonical
doc (min doc_id) survives per cluster.  This is the engine's iterative-
algorithm pattern — a driver-side loop of distributed joins with a
convergence check (the shape GraphX/Pregel formalizes), each iteration
one shuffle.  Converges in O(graph diameter) iterations; duplicate
clusters are near-cliques, so 2-3 in practice.

Still fully oracled: DuckDB expresses min-reachable-id with a recursive
CTE — the rare case where "iterative" has an exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.dedup import minhash_band_sigs
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 20) -> DataFrame:
    """Min-label propagation: every node ends labeled with the smallest
    node id in its component.  Returns (node, component).  Each iteration
    is one grouped aggregation over the (bidirectional) edge list; stops
    when an iteration changes nothing."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("component"))
    bi = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            bi.join(labels, bi.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            # checkpoint BEFORE the change check so the propagation join
            # runs once per iteration, not once for the count and again
            # for the checkpoint
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations (graph diameter exceeds max_iter) — labels would "
            "be wrong; raise max_iter"
        )
    return labels


_COMPONENTS_ORACLE = """
WITH RECURSIVE words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), shingles AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM words)
), sigs AS (
  SELECT doc_id, band, MIN(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS sig
  FROM (SELECT doc_id, shingle, unnest(range(0, 8)) AS band FROM shingles)
  GROUP BY doc_id, band
), pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
                          AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 4
), bi AS (
  SELECT src AS a, dst AS b FROM pairs
  UNION ALL SELECT dst, src FROM pairs
), reach AS (
  SELECT a AS node, a AS reached FROM (SELECT DISTINCT a FROM bi)
  UNION
  SELECT r.node, bi.b FROM reach r JOIN bi ON bi.a = r.reached
)
SELECT node AS doc_id, CAST(MIN(reached) AS BIGINT) AS component
FROM reach GROUP BY node
"""


@register("dedup_components", _COMPONENTS_ORACLE)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: MinHash candidate pairs (>=4/8 bands) ->
    connected components -> (doc_id, component=min id in cluster).
    Docs with no near-dup edge are excluded (their cluster is trivially
    themselves).

    Duplicate-heavy safety: exact duplicates collapse before the band
    join AND before label propagation, so the edge list and the
    iterative joins track unique texts; members rejoin their
    representative's component at the end.  A copy group whose rep has
    no near-dup edge still forms its own cluster (every copy is an
    8/8-band duplicate of its rep), labeled by the rep id — identical
    to what the uncollapsed graph computes, since rep = min(group) and
    component ids are cluster-minimum doc_ids.  Output stays linear in
    corpus size (one row per clustered doc) at ANY copy count — unlike
    the pair-emitting ops, components has no quadratic contract."""
    from go_pulsar_elasticsearch_spark.llm.dedup import exact_text_groups

    tune(spark)
    docs = t(spark, sf_dir, "documents")
    members, rep_docs = exact_text_groups(docs, "components_groups")
    sigs = minhash_band_sigs(rep_docs)
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .agg(F.count("*").alias("n_bands"))
        .filter(F.col("n_bands") >= 4)
        .select("src", "dst")
    )
    comps = connected_components(pairs)  # over representatives
    # multi-copy groups whose rep has no edge are clusters of their own
    lonely_multi = (
        members.groupBy("rep")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .join(comps, F.col("rep") == F.col("node"), "left_anti")
        .select(F.col("rep").alias("node"), F.col("rep").alias("component"))
    )
    rep_comp = comps.unionByName(lonely_multi)
    return members.join(
        rep_comp, members.rep == rep_comp.node
    ).select("doc_id", "component")
