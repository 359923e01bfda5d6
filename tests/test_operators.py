"""Operator smoke + spot-semantic tests at sf0.001 (the full DuckDB
cross-check runs in tools/check_oracle.py; these are fast invariants)."""

from __future__ import annotations

import duckdb
import pytest

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.catalog import TABLES
from go_pulsar_elasticsearch_spark.registry import ORACLES, QUERIES

gpe.load_all()


def test_every_query_runs_and_has_stable_schema(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.schema == fn(spark, sf_dir).schema, name
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
    # rows-only ops must be the known exceptions, nothing silently dropped
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == {
        "agg_approx", "stream_ingest_e2e",
        "similarity_topk_fast", "near_dedup_minhash_ml", "ann_pq",
        "ann_pq_stored",  # float codebooks like ann_pq; stored==fresh pytest
        "ann_pq_append",  # frozen-codebook delta; append==one-shot pytest
        "ann_ivfpq",  # IVF lists + PQ ADC; recall-vs-IVF/exact pytest
        "ann_sq8",  # int8 scalar quantization; recall + exact-rerank pytest
        "quality_classifier_lr", "embedding_pca_project", "bpe_encode",
        "sketch_union_hll", "agg_count_min",
        "unigram_tokenizer_train",   # iterative Viterbi-EM, like bpe_encode
        "unigram_encode_fertility",  # encodes with the EM-trained model
        "wordpiece_encode",  # greedy longest-match; independent-reference
        # piece-for-piece pytest (tests/test_wordpiece.py)
        "pack_sequences_bestfit",  # sequential per-shard bin state
        # (grouped-map BFD); bin-for-bin vs an independent Python BFD
        # in tests/test_es_parity4.py
    }


@pytest.mark.parametrize("name", [
    "agg_grouped", "join_multiway_star", "win_ranking",
    "domain_caps", "domain_caps_twophase", "per_domain_quota_sample",
])
def test_spot_oracle_match(spark, sf_dir, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = con.sql(ORACLES[name]).df()
    assert len(spdf) == len(odf)
    cols = sorted(spdf.columns)
    assert cols == sorted(odf.columns)
    a = spdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
    b = odf[cols].astype(str).sort_values(cols).reset_index(drop=True)
    assert a.equals(b), name


def test_dedup_upsert_semantics(spark):
    from pyspark.sql import functions as F

    from go_pulsar_elasticsearch_spark.ingest.pipeline import upsert_last_write_wins

    df = spark.createDataFrame(
        [
            ("k1", 1, 10.0),
            ("k1", 3, 30.0),  # winner: latest ts
            ("k1", 2, 20.0),
            ("k2", 1, 99.0),
        ],
        "uuid string, ts long, payload double",
    ).withColumn("ts", F.timestamp_millis(F.col("ts") * 1000))
    out = upsert_last_write_wins(df, ["uuid"], "ts", "payload").collect()
    got = {r["uuid"]: r["payload"] for r in out}
    assert got == {"k1": 30.0, "k2": 99.0}


def test_dlq_split_is_partition(spark, sf_dir):
    from pyspark.sql import functions as F

    from go_pulsar_elasticsearch_spark.catalog import t
    from go_pulsar_elasticsearch_spark.ingest.pipeline import dlq_split

    ev = t(spark, sf_dir, "events")
    main_df, dlq_df = dlq_split(ev, F.col("value") >= 1.0)
    assert main_df.count() + dlq_df.count() == ev.count()
    assert main_df.intersect(dlq_df).count() == 0


def test_bench_headline_names_exist():
    """bench.py's headline list must reference registered queries — a
    rename that breaks the driver's bench run should fail here first."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert missing == []


@pytest.mark.parametrize(
    "sfd", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_agg_approx_within_published_error_bounds(spark, sfd):
    """The one perpetually rows-only query gains real evidence:
    approx_count_distinct(rsd=0.01) is HLL++ with ~1% standard error —
    assert every group lands within 5 sigma (0.05 relative) of the exact
    distinct count; percentile_approx(accuracy=10000) guarantees rank
    error <= n/10000, so the returned value must sit between the exact
    quantiles at rank +/- n/10000 (with epsilon slack at the boundary)."""
    from pyspark.sql import functions as F

    from go_pulsar_elasticsearch_spark.catalog import t as load

    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx"](spark, sfd).collect()
    }
    li = load(spark, sfd, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("nd"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    for flag, a in approx.items():
        e = exact[flag]
        rel = abs(a["approx_orders"] - e["nd"]) / e["nd"]
        assert rel <= 0.05, (flag, a["approx_orders"], e["nd"], rel)
        # rank-error bound for the approximate median
        n, eps = e["n"], e["n"] / 10000 + 1
        lo_q, hi_q = max(0.5 - eps / n, 0.0), min(0.5 + eps / n, 1.0)
        bounds = (
            li.filter(F.col("l_returnflag") == flag)
            .agg(
                F.expr(
                    f"percentile(l_extendedprice, array({lo_q}, {hi_q}))"
                ).alias("b")
            )
            .collect()[0]["b"]
        )
        assert bounds[0] <= a["approx_median_price"] <= bounds[1], (
            flag, a["approx_median_price"], bounds
        )


def test_collapse_gate_branches_are_equivalent(spark):
    """exact_text_groups' mode gate is a pure performance device: on a
    copy-heavy corpus the collapsed ("always") and direct ("never")
    paths must emit IDENTICAL pair sets with identical band counts, and
    "auto" must pick collapse there (dup ratio ~0.67 >> the 2% gate)
    while picking the direct path on an all-unique corpus."""
    import go_pulsar_elasticsearch_spark.llm.dedup as dd
    from pyspark.sql import functions as F

    base = [
        (i, " ".join(f"tok{i}w{j}" for j in range(30))) for i in range(20)
    ]
    # 3 exact copies of every text -> 60 docs, 20 unique
    rows = [(i + 100 * c, txt) for i, txt in base for c in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(mode):
        members, rep_docs = dd.exact_text_groups(docs, f"gate_{mode}", mode)
        sigs = dd.minhash_band_sigs(rep_docs)
        a, b = sigs.alias("a"), sigs.alias("b")
        rp = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count("*").alias("n_bands_agree"))
        )
        if members is None:
            return rp, members
        ma = members.select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("ia"))
        mb = members.select(F.col("rep").alias("doc_b"), F.col("doc_id").alias("ib"))
        cross = (
            rp.join(ma, "doc_a").join(mb, "doc_b")
            .select(
                F.least("ia", "ib").alias("doc_a"),
                F.greatest("ia", "ib").alias("doc_b"),
                "n_bands_agree",
            )
        )
        x, y = members.alias("x"), members.alias("y")
        within = x.join(
            y,
            (F.col("x.rep") == F.col("y.rep"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        ).select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.lit(8).cast("bigint").alias("n_bands_agree"),
        )
        return cross.unionByName(within), members

    collapsed, m_always = pairs("always")
    direct, m_never = pairs("never")
    assert m_always is not None and m_never is None
    got_a = {tuple(r) for r in collapsed.collect()}
    got_n = {tuple(r) for r in direct.collect()}
    assert got_a == got_n and len(got_a) >= 60  # 20 groups x C(3,2) within

    # auto picks by data
    m_auto, _ = dd.exact_text_groups(docs, "gate_auto_dup", "auto")
    assert m_auto is not None
    uniq = spark.createDataFrame(base, "doc_id long, text string")
    m_auto2, rep2 = dd.exact_text_groups(uniq, "gate_auto_uniq", "auto")
    assert m_auto2 is None
    assert rep2.schema["cnt"].dataType.simpleString() == "bigint"
