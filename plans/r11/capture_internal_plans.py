"""Capture .explain("formatted") evidence for the r11 optimizations.

Most gate queries return an eagerly localCheckpoint-ed DataFrame, whose
public plan is a flat ExistingRDD scan — the meaningful plan is the one
materialized during construction. This harness rebuilds, for each
optimization, the BEFORE shape (the pre-r11 code, reproduced inline and
labeled) and the AFTER shape (the current operator code), and explains
both lazily so the Exchange/join structure is visible.

Usage:
    python plans/r11/capture_internal_plans.py [name ...]

writes plans/r11/<name>_before.txt and plans/r11/<name>_after.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from blockchain_data_engineering_spark.catalog import load_table, spread
from blockchain_data_engineering_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ----------------------------------------------------------------- edges --


def _edges_before(spark):
    """Pre-r11 _edges_df: distinct over the concatenated node strings."""
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    j = orders.join(li, orders.o_orderkey == li.l_orderkey, "inner")
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    is_ret = F.col("l_returnflag") == "R"
    return j.select(
        F.when(is_ret, s).otherwise(c).alias("src"),
        F.when(is_ret, c).otherwise(s).alias("dst"),
    ).distinct()


def _edges_after(spark):
    """Current _edges_df (int-grain distinct, strings built after)."""
    from blockchain_data_engineering_spark.plans.graph_queries import _edges_df

    return _edges_df(spark, SF_DIR)


def graph_edges(spark, which):
    return _edges_before(spark) if which == "before" else _edges_after(spark)


# ----------------------------------------------------------------- kcore --


def graph_kcore(spark, which):
    """ONE peel round over the materialized symmetric edge set — the
    shape the loop repeats. BEFORE: persist()+count() rounds over a
    (src,dst)-partitioned distinct (the per-round degree aggregate
    plans its own Exchange). AFTER: round_checkpoint rounds over an
    'a'-co-partitioned distinct (no per-round Exchange, flat scans)."""
    from blockchain_data_engineering_spark.operators.graph import _hint
    from blockchain_data_engineering_spark.plans.graph_queries import (
        KCORE_K,
        _edges_df,
    )

    edges = _edges_df(spark, SF_DIR)
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .where(F.col("a") != F.col("b"))
    )
    if which == "before":
        alive = sym.distinct().persist()
        alive.count()
    else:
        alive = sym.repartition("a").distinct().localCheckpoint(eager=True)
    keep = (
        alive.groupBy("a")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") >= KCORE_K)
        .select("a")
        .persist()
    )
    nxt = alive.join(_hint(keep, True), "a", "left_semi").join(
        _hint(keep.select(F.col("a").alias("b")), True), "b", "left_semi"
    )
    return nxt.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


# ------------------------------------------------------------ ER cluster --


def er_entity_clusters(spark, which):
    """ONE propagate round of the CC loop over the undirected match
    graph. BEFORE: (a,b)-partitioned distinct cache, per-round
    Exchange for the min-label groupBy. AFTER: 'a'-co-partitioned
    cache, no per-round Exchange."""
    from blockchain_data_engineering_spark.operators import linkage as L
    from blockchain_data_engineering_spark.operators.graph import (
        _hint,
        vertices_of,
    )
    from blockchain_data_engineering_spark.plans.linkage_queries import (
        ER_MAX_DIST,
    )

    part = spread(load_table(spark, SF_DIR, "part"))
    first_tok = lambda df: F.element_at(F.split(F.col("p_name"), " "), 1)  # noqa: E731
    last_tok = lambda df: F.element_at(F.split(F.col("p_name"), " "), -1)  # noqa: E731
    pairs = L.fuzzy_pairs(
        part,
        name_col="p_name",
        block_keys=[first_tok, last_tok],
        max_distance=ER_MAX_DIST,
    )
    edges = pairs.select(
        F.col("name_a").alias("src"), F.col("name_b").alias("dst")
    ).persist()
    nodes = vertices_of(edges, "src", "dst")
    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .union(nodes.select(F.col("node").alias("a"), F.col("node").alias("b")))
    )
    und = (und.distinct() if which == "before" else und.repartition("a").distinct()).cache()
    und.count()
    labels = nodes.select(F.col("node"), F.col("node").alias("label"))
    return (
        und.join(_hint(labels.withColumnRenamed("node", "b"), True), "b")
        .groupBy(F.col("a").alias("node"))
        .agg(F.min("label").alias("label"))
    )


# ------------------------------------------------------------ classifier --


def text_quality_classifier(spark, which):
    """One training round's gradient aggregate. BEFORE: un-partitioned
    feature cache — the per-doc z groupBy and the fx⋈e join each plan
    an Exchange over the feature stream per round. AFTER: fx and y
    co-partitioned on doc_id — the round's only Exchange is the
    ≤257-row per-bucket gradient aggregate."""
    from blockchain_data_engineering_spark.operators.text import (
        QC_SW,
        QC_SX,
        _fdiv,
        _hash_bucket,
    )

    docs = spread(load_table(spark, SF_DIR, "documents"))
    id_col, text_col = "doc_id", "text"
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    )
    counts = toks.groupBy(id_col, _hash_bucket("t").alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ntok = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    fx = (
        counts.join(ntok, id_col)
        .selectExpr(id_col, "b", f"(cnt * {QC_SX}) div n AS xq")
        .unionByName(
            docs.select(
                F.col(id_col), F.lit(-1).alias("b"), F.lit(QC_SX).alias("xq")
            )
        )
    )
    y = docs.select(F.col(id_col), (F.col("lang") == "en").cast("int").alias("y"))
    if which == "after":
        fx = fx.repartition(id_col)
        y = y.repartition(id_col)
    fx = fx.persist()
    fx.count()
    y = y.persist()
    y.count()
    e = y.select(
        id_col, F.expr(f"{QC_SW // 2} - y * {QC_SW}").alias("err")
    ).withColumn("g", F.lit(True))
    grad = (
        fx.join(e, id_col)
        .selectExpr(
            "b",
            f"CASE WHEN g THEN {_fdiv('err * xq', QC_SX, 10**10)}"
            " ELSE 0 END AS c",
        )
        .groupBy("b")
        .agg(F.sum("c").alias("grad"))
    )
    # round-1 weights, then show round 2's per-doc z aggregate — the
    # stage whose Exchange the co-partitioning removes
    n_docs = docs.count()
    step = _fdiv(_fdiv("grad", "nd", 10**10), 16, 10**9)
    w = (
        grad.withColumn("nd", F.lit(n_docs))
        .selectExpr("b", f"0 - ({step}) AS wq")
        .localCheckpoint(eager=True)
    )
    return (
        fx.join(F.broadcast(w), "b")
        .withColumn("pr", F.expr("wq * xq"))
        .groupBy(id_col)
        .agg(F.sum("pr").alias("s"))
        .selectExpr(id_col, _fdiv("s", QC_SX, 10**12) + " AS zq")
    )


# ----------------------------------------------------------- corpus dedup --


def pipeline_corpus_dedup(spark, which):
    """One min-label-propagation round over the dup graph. BEFORE:
    un-partitioned, un-materialized cache — each round plans its own
    Exchange. AFTER: 'a'-co-partitioned and materialized before the
    loop compiles — no per-round Exchange."""
    from blockchain_data_engineering_spark.operators import dedup as D
    from blockchain_data_engineering_spark.plans.dedup_queries import (
        BAND_SIZE,
        DUP_THRESHOLD,
        N_HASHES,
        SHINGLE_K,
    )

    docs = spread(load_table(spark, SF_DIR, "documents"))
    sh = D.shingle_set(docs, k=SHINGLE_K).persist()
    sig = D.minhash_signatures(sh, N_HASHES).persist()
    cand = D.lsh_candidate_pairs(D.lsh_bands(sig, N_HASHES, BAND_SIZE))
    arr = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shingles"))
    dup = D.jaccard_verify_arrays(cand, arr).where(
        F.col("jaccard") >= DUP_THRESHOLD
    )
    und = (
        dup.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("a"), F.col("id_b").alias("b")),
                    F.struct(F.col("id_b").alias("a"), F.col("id_a").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .union(docs.select(F.col("doc_id").alias("a"), F.col("doc_id").alias("b")))
    )
    if which == "after":
        und = und.repartition("a")
    und = und.persist()
    if which == "after":
        und.count()
    labels = docs.select(F.col("doc_id").alias("node"), F.col("doc_id").alias("label"))
    return (
        und.join(F.broadcast(labels.select(F.col("node").alias("b"), "label")), "b")
        .groupBy(F.col("a").alias("node"))
        .agg(F.min("label").alias("label"))
    )


# ---------------------------------------------------------------- kmeans --


def sim_kmeans_round(spark, which):
    """One Lloyd round's centroid update (feeds sim_semantic_dedup and
    sim_ivf_ann_trained). BEFORE: un-partitioned component cache — the
    argmin groupBy(id, cid), the argmin window and the mean-update join
    each plan an Exchange per round. AFTER: components co-partitioned
    on vec_id — only the k·dim-grain mean aggregate exchanges."""
    from blockchain_data_engineering_spark.functions.scalar import (
        bounded_window_key,
    )
    from blockchain_data_engineering_spark.operators.similarity import (
        _KM_OFF,
        _KM_SCALE,
    )

    emb = spread(load_table(spark, SF_DIR, "embeddings"))
    id_col, vec_col = "vec_id", "embedding"
    q6 = F.floor(
        F.col("x").cast("double") * F.lit(float(_KM_SCALE)) + F.lit(0.5)
    ).cast("long")
    v = emb.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim0", "x")
    ).select(id_col, "dim0", q6.alias("vq"))
    if which == "after":
        v = v.repartition(id_col)
    v = v.persist()
    v.count()
    h = F.md5(F.col(id_col).cast("string"))
    seeds = (
        emb.select(id_col)
        .orderBy(h, F.col(id_col))
        .limit(8)
        .select(
            id_col,
            F.row_number()
            .over(
                Window.partitionBy(bounded_window_key(F.col(id_col))).orderBy(
                    F.md5(F.col(id_col).cast("string")), F.col(id_col)
                )
            )
            .cast("int")
            .alias("cid"),
        )
    )
    cent = v.join(seeds, id_col).select("cid", "dim0", F.col("vq").alias("cq"))
    diff = F.col("vq") - F.col("cq")
    d2 = (
        v.join(F.broadcast(cent), "dim0")
        .groupBy(id_col, "cid")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    w = Window.partitionBy(id_col).orderBy("d2", "cid")
    assign = (
        d2.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, "cid")
    )
    return (
        v.join(assign, id_col)
        .groupBy("cid", "dim0")
        .agg(
            F.sum(F.col("vq") + F.lit(_KM_OFF)).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            "cid",
            "dim0",
            (F.expr("(2 * __s + __n) div (2 * __n)") - F.lit(_KM_OFF)).alias("cq"),
        )
    )


# ----------------------------------------------------- krippendorff alpha --


def _kripp_votes(spark):
    from blockchain_data_engineering_spark.operators import text as TX
    from blockchain_data_engineering_spark.plans.text_queries import (
        _KINT_LEN_MIN,
        _KINT_TOK_MIN,
    )

    scored = TX.quality_score(spread(load_table(spark, SF_DIR, "documents")))
    tiers = scored.select(
        "lang",
        "doc_id",
        "n_chars_m",
        "n_tokens",
        F.least(
            F.expr("CAST(floor(quality_score + 0.5) AS BIGINT) div 20"),
            F.lit(5).cast("long"),
        ).alias("tier_quality"),
        F.least(F.expr("n_chars_m div 100"), F.lit(5).cast("long")).alias(
            "tier_length"
        ),
        F.least(F.expr("n_tokens div 15"), F.lit(5).cast("long")).alias(
            "tier_tokens"
        ),
    ).persist()
    vote = lambda df_, cat: df_.select(  # noqa: E731
        "lang", F.col("doc_id").alias("item"), F.col(cat).alias("cat")
    )
    votes = (
        vote(tiers, "tier_quality")
        .unionByName(
            vote(tiers.where(F.col("n_chars_m") >= _KINT_LEN_MIN), "tier_length")
        )
        .unionByName(
            vote(tiers.where(F.col("n_tokens") >= _KINT_TOK_MIN), "tier_tokens")
        )
        .persist()
    )
    votes.count()
    return votes


def ml_krippendorff_ordinal(spark, which):
    """The ordinal alpha readout over the tier votes. BEFORE is the
    current operator run under lazy_plans (which restores the legacy
    un-materialized diamond shape: every cell/kept/marginal reference
    re-expands its subtree — count the InMemoryTableScan leaves).
    AFTER is the shipped eager-diamond shape (flat ExistingRDD reads,
    each diamond computed once)."""
    from blockchain_data_engineering_spark.cache import lazy_plans
    from blockchain_data_engineering_spark.operators.ml_eval import (
        krippendorff_alpha,
    )
    from blockchain_data_engineering_spark.plans.text_queries import (
        _KRIPP_MAX_RATERS,
    )

    votes = _kripp_votes(spark)
    if which == "before":
        with lazy_plans():
            return krippendorff_alpha(
                votes,
                "item",
                "cat",
                keys=["lang"],
                max_raters=_KRIPP_MAX_RATERS,
                metric="ordinal",
            )
    return krippendorff_alpha(
        votes,
        "item",
        "cat",
        keys=["lang"],
        max_raters=_KRIPP_MAX_RATERS,
        metric="ordinal",
    )


# ------------------------------------------------------------------ bloom --


def join_bloom_prefilter(spark, which):
    """BEFORE: the three separate probe-side scans (n_probe, the
    bloom_prefilter count, the semi-join count) cross-joined. AFTER:
    the shipped one-pass flag aggregate (current query code, run under
    lazy_plans so the pre-checkpoint plan is visible)."""
    from blockchain_data_engineering_spark.cache import lazy_plans
    from blockchain_data_engineering_spark.operators.relational import (
        bloom_bits,
        bloom_prefilter,
    )
    from blockchain_data_engineering_spark.plans.analytics_queries import (
        _BLOOM_M,
    )

    if which == "after":
        from blockchain_data_engineering_spark.plans import QUERIES

        with lazy_plans():
            return QUERIES["join_bloom_prefilter"](spark, SF_DIR)

    orders = load_table(spark, SF_DIR, "orders")
    li = spread(load_table(spark, SF_DIR, "lineitem"))
    build = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("key"))
        .distinct()
    )
    bits = bloom_bits(build, "key", m_bits=_BLOOM_M, k_hashes=2).persist()
    probe = li.where(F.col("l_orderkey").isNotNull()).select(
        F.col("l_orderkey").alias("key")
    )
    passed = bloom_prefilter(probe, "key", bits, m_bits=_BLOOM_M, k_hashes=2)
    n_probe = probe.agg(F.count(F.lit(1)).cast("long").alias("n_probe"))
    n_pass = passed.agg(F.count(F.lit(1)).cast("long").alias("n_pass"))
    n_match = probe.join(F.broadcast(build), "key", "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_match")
    )
    return n_probe.crossJoin(n_pass).crossJoin(n_match)


# ---------------------------------------------------------------- lang_id --


def _lang_id_before(text):
    """Pre-r11 lang_id: one size(filter(split(...))) per (lang, word)."""
    from blockchain_data_engineering_spark.operators.text import LANG_MARKERS

    def hits(words):
        toks = F.split(text, " ")
        expr = None
        for w in words:
            c = F.size(F.filter(toks, lambda t: t == F.lit(w)))
            expr = c if expr is None else expr + c
        return expr

    hs = {lang: hits(ws) for lang, ws in sorted(LANG_MARKERS.items())}
    total = None
    for c in hs.values():
        total = c if total is None else total + c
    best = None
    best_lang = None
    for lang, c in hs.items():
        if best is None:
            best, best_lang = c, F.lit(lang)
        else:
            is_better = c > best
            best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
            best = F.when(is_better, c).otherwise(best)
    return F.when(total > 0, best_lang).otherwise(F.lit("und"))


def text_lang_id(spark, which):
    """The language-ID projection every agreement/store gate runs.
    BEFORE: 20 interpreted re-tokenizations per row. AFTER: the
    shipped single split + single aggregate pass."""
    from blockchain_data_engineering_spark.operators import text as TX

    docs = load_table(spark, SF_DIR, "documents")
    expr = (
        _lang_id_before(F.col("text"))
        if which == "before"
        else TX.lang_id(F.col("text"))
    )
    return docs.select("doc_id", expr.alias("lang_pred"))


CAPTURES = {
    "graph_edges": graph_edges,
    "graph_kcore": graph_kcore,
    "er_entity_clusters": er_entity_clusters,
    "text_quality_classifier": text_quality_classifier,
    "pipeline_corpus_dedup": pipeline_corpus_dedup,
    "sim_kmeans_round": sim_kmeans_round,
    "ml_krippendorff_ordinal": ml_krippendorff_ordinal,
    "join_bloom_prefilter": join_bloom_prefilter,
    "text_lang_id": text_lang_id,
}


def main() -> None:
    names = sys.argv[1:] or sorted(CAPTURES)
    spark = get_spark(app_name="bde-capture-plans")
    spark.range(1).count()
    for name in names:
        for which in ("before", "after"):
            df = CAPTURES[name](spark, which)
            with open(os.path.join(HERE, f"{name}_{which}.txt"), "w") as fh:
                fh.write(_explain(df))
            spark.catalog.clearCache()
            print(f"captured {name}_{which}.txt", flush=True)


if __name__ == "__main__":
    main()
