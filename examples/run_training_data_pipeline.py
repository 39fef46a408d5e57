"""End-to-end demo: a training-data curation pipeline over the
``documents`` + ``embeddings`` tables — the LLM-corpus shape this
engine adds beyond the reference's blockchain surface:

  1. quality gate (length / stopword / punctuation scoring)
  2. repetition gate (Gopher A1.1 top/duplicate n-gram filters) +
     perplexity gate (in-corpus bigram-LM surprisal)
  3. exact dedup (normalized-text fingerprint, keep lowest doc_id)
  4. near-dedup (MinHash + LSH banding -> exact Jaccard verify
     -> connected components -> canonical election)
  5. language filter (n-gram heuristic language ID)
  6. embedding near-dup sweep (label-blocked exact cosine) +
     duplicated-span audit (Lee et al. 2022) + DSIR importance
     weights (Xie et al. 2023) for target-aware sampling
  7. deterministic stratified train/val split + length buckets
     for batch packing
  8. featurize + evaluate (hashing-trick features, int8 vectors,
     exact AUC of the quality heuristic)
  9. corpus monitoring (token-length percentiles per split from the
     mergeable quantile sketch)
 10. vocabulary head (top tokens per split from the mergeable
     Misra-Gries heavy-hitter summary, with [lo, hi] count bounds)

Every stage is a lazy DataFrame plan (one driver program, zero
driver-side loops); the same composition runs unchanged on a cluster
against a real lake.

    python examples/run_training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blockchain_data_engineering_spark.catalog import load_table, spread
from blockchain_data_engineering_spark.operators import dedup as D
from blockchain_data_engineering_spark.operators import similarity as SIM
from blockchain_data_engineering_spark.operators import text as TX
from blockchain_data_engineering_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    docs = spread(load_table(spark, sf_dir, "documents"))
    n0 = docs.count()

    # One narrow feature pass over the scan computes EVERY per-doc
    # signal up front (quality score, predicted language, content
    # fingerprint) — the wide-expression columns are evaluated exactly
    # once, on the cheapest possible plan. Evaluating lang_id/quality
    # later, on top of joins and windows, re-inlines those big CASE
    # trees into deep plans (measured 198 s vs <2 s for this shape).
    feats = TX.quality_score(docs).select(
        "doc_id", "text", "lang", "source", "n_tokens", "quality_score",
        TX.lang_id(F.col("text")).alias("lang_pred"),
        TX.fingerprint(F.col("text")).alias("fp"),
    )

    # 2. repetition gate: the full Gopher filter set (top-2/3-gram
    # share + duplicate-5/10-gram share, Rae et al. 2021 A1.1)
    rep = TX.gopher_repetition(docs).select("doc_id", "passes")

    # 2b. perplexity gate: in-corpus bigram-LM score (KenLM-style) —
    # docs whose average bigram surprisal is an outlier don't look
    # like the corpus
    lm = TX.lm_bigram_score(docs).select("doc_id", "avg_neg_log2p")

    # 1+2+5. the filter gates are now trivial column predicates.
    # LEFT joins: a doc with <2 tokens has no n-gram/bigram rows — it
    # trivially passes those gates, it shouldn't vanish in the join.
    kept = (
        feats.join(rep, "doc_id", "left")
        .join(lm, "doc_id", "left")
        .withColumn("passes", F.coalesce(F.col("passes"), F.lit(True)))
        .where(
            (F.col("quality_score") >= 60.0)
            & F.col("passes")
            & (F.coalesce(F.col("avg_neg_log2p"), F.lit(0.0)) <= 14.0)
            & (F.col("lang_pred") == F.col("lang"))
        )
        .drop("passes", "avg_neg_log2p")
    )

    # 3. exact dedup on the normalized-text fingerprint
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("doc_id")
    # persisted: step 4 (shingles) and the final merge both re-read it
    uniq = (
        kept.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "fp", "lang_pred", "quality_score")
        .persist()
    )

    # 4. near-dedup: LSH candidates -> exact Jaccard >= 0.7 -> CC ->
    # keep each cluster's lowest doc_id
    sh = D.shingle_set(uniq, k=5).persist()
    sig = D.minhash_signatures(sh, 9)
    cand = D.lsh_candidate_pairs(D.lsh_bands(sig, 9, 3))
    arr = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shingles"))
    dup_pairs = (
        D.jaccard_verify_arrays(cand, arr)
        .where(F.col("jaccard") >= 0.7)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .persist()
    )
    from blockchain_data_engineering_spark.operators import graph as G

    # near-dup clusters have tiny diameter (they're near-cliques), so
    # plain min-label propagation converges in a few iterations — the
    # pointer-jump variant's extra per-round jobs only pay off on
    # long-chain graphs like wallet clustering
    labels = G.connected_components(dup_pairs, iterations=3).persist()
    canonical = labels.groupBy("label").agg(F.min("node").alias("keep"))
    drop = labels.join(canonical, "label").where(F.col("node") != F.col("keep"))
    # localCheckpoint (eager): the span audit, the DSIR token sweep
    # (which reads it three times: source counts, target counts,
    # scoring join), and the final select all re-read the curated set.
    # A plain persist still carries the full logical plan — Catalyst
    # re-optimizes the whole curation lineage (minhash + the big
    # lang/quality CASE trees) under every downstream explode, and
    # analysis time alone blows past minutes. Checkpointing truncates
    # the plan to the materialized rows. (On a cluster use
    # reliable checkpoint/delta table instead of executor-local.)
    lang_ok = uniq.join(
        drop.select(F.col("node").alias("doc_id")), "doc_id", "left_anti"
    ).localCheckpoint()

    # 6. embedding near-dup sweep (label-blocked exact cosine — the
    # dedup_embedding_cosine query shape)
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    withn = SIM.with_norm(emb)
    ea = withn.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"),
        F.col("norm_q").alias("n_a"), "label",
    )
    eb = withn.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"),
        F.col("norm_q").alias("n_b"), "label",
    )
    n_emb_dups = (
        ea.join(eb, "label")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            SIM.cosine_from_quanta(
                SIM.dot_quanta(F.col("e_a"), F.col("e_b")),
                F.col("n_a"),
                F.col("n_b"),
            ).alias("cosine")
        )
        .where(F.col("cosine") >= 0.995)
        .count()
    )

    # 6b. cross-doc duplicated-span audit (Lee et al. 2022): exact
    # repeated substrings surviving the doc-level dedup — at scale
    # these spans are cut, not the whole doc; here we report the mass
    span_tokens = (
        D.duplicated_spans(lang_ok, n=10)
        .agg(F.coalesce(F.sum("dup_tokens"), F.lit(0)).alias("t"))
        .collect()[0]["t"]
    )

    # 6c. DSIR importance weights (Xie et al. 2023): score every
    # surviving doc by log(p_en/p_corpus) for target-aware sampling
    dsir = TX.dsir_importance_weights(lang_ok, F.col("lang") == "en").select(
        "doc_id", "dsir_logw"
    )

    # 6d. novelty audit vs the already-trained snapshot (the
    # text_novelty_score shape): docs whose winnowing fingerprints are
    # mostly already-seen add little signal — report the kept set's
    # mean novelty against the first four sources as the "previous
    # release" stand-in
    ref_sources = ("src0", "src1", "src2", "src3")
    fps = TX.winnow_fingerprints(lang_ok, keep_cols=("doc_id", "source"))
    ref_fps = (
        fps.where(F.col("source").isin(*ref_sources)).select("fp").distinct()
    )
    incoming = fps.where(~F.col("source").isin(*ref_sources)).select("doc_id", "fp")
    nov = (
        incoming.join(ref_fps.withColumn("__seen", F.lit(1)), "fp", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.count("__seen").alias("s"))
        .agg(
            F.avg(
                (F.col("n") - F.col("s")).cast("double")
                / F.col("n").cast("double")
            ).alias("mean_novelty")
        )
        .collect()[0]["mean_novelty"]
    )

    # 7. split + pack
    h1 = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 1
    )
    final = lang_ok.join(dsir, "doc_id", "left").select(
        "doc_id", "lang", "source", "n_tokens", "dsir_logw",
        F.when(h1.isin("0", "1", "2"), "val").otherwise("train").alias("split"),
        F.least(F.floor(F.col("n_tokens") / 64), F.lit(15)).alias("bucket"),
    ).persist()

    n_final = final.count()
    packing = (
        final.groupBy("split", "bucket")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("tokens"))
        .orderBy("split", "bucket")
    )

    # 7b. split-mix drift check (r10): did the md5 split preserve the
    # SOURCE mix? JS divergence between the train and val source
    # distributions — symmetric, bounded [0, ln 2], no epsilon games
    # when a rare source lands only in one split (the language mix is
    # uniform here by construction: the corpus was filtered to one
    # language in stage 5)
    from blockchain_data_engineering_spark.operators.dq import (
        distribution_js,
        distribution_kl,
    )

    split_js = distribution_js(
        final.where(F.col("split") == "train"),
        final.where(F.col("split") == "val"),
        "source",
    ).first()
    # r11: the DIRECTIONAL companion — treating train as the
    # reference model, how surprised is it by the val mix?
    # (KL(val‖train), the train→serve monitoring direction; JS above
    # says how far apart, KL says in which direction it matters)
    split_kl = distribution_kl(
        final.where(F.col("split") == "train"),
        final.where(F.col("split") == "val"),
        "source",
    ).first()

    # 8. featurize + evaluate (r6 ops): hashing-trick features and
    # TF-IDF keywords for the kept docs, int8-quantized embeddings
    # for the vector store, and an exact-AUC readout of how well the
    # heuristic quality score ranks the English slice (the
    # train-a-filter → EVALUATE-the-filter loop, at corpus scale)
    from blockchain_data_engineering_spark.operators.ml_eval import auc_exact
    from blockchain_data_engineering_spark.operators.similarity import (
        quantize_int8,
    )

    kept_docs = docs.join(final.select("doc_id"), "doc_id", "left_semi")
    n_feat = TX.hashed_features(kept_docs, n_features=256).count()
    q8_rows = quantize_int8(emb).count()
    auc = auc_exact(
        feats.select(
            (F.col("lang") == "en").alias("y"),
            F.col("quality_score").alias("s"),
        ),
        F.col("y"),
        F.col("s"),
    ).first()

    # 9. corpus monitoring (r7): token-length percentiles per split
    # from the mergeable quantile sketch — k longs of state per split,
    # re-queryable without a sort, and the per-day/per-shard states
    # merge exactly (the shape a 100 TB ingest dashboard needs; the
    # exact-sort percentile pass this replaces re-scans per question)
    from blockchain_data_engineering_spark.operators.quantiles import (
        quantile_sketch,
        quantile_sketch_query,
    )

    qstate = quantile_sketch(
        final, "n_tokens", ["doc_id"], k=256, keys=["split"]
    )
    qrows = quantile_sketch_query(
        qstate, [2500, 5000, 9000, 9900], keys=["split"]
    ).collect()

    # 10. vocabulary head (r8): the top tokens per split from the
    # mergeable Misra–Gries summary — the "what ARE the hot keys" scan
    # (BPE seeding, stop-list audits, skew detection) in ≤ k counters
    # of state per split where an exact groupBy(token) would carry the
    # whole vocabulary; per-day states merge with a bounded, tracked
    # error (count_lo ≤ f ≤ count_hi)
    from blockchain_data_engineering_spark.operators.heavy_hitters import (
        heavy_hitters,
    )

    toks = kept_docs.join(final.select("doc_id", "split"), "doc_id").select(
        "split", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    hh = heavy_hitters(toks, "tok", k=64, keys=["split"])
    from pyspark.sql import Window as _W

    hh_top = (
        hh.withColumn(
            "__r",
            F.row_number().over(
                _W.partitionBy("split").orderBy(
                    F.col("count_lo").desc(), "item"
                )
            ),
        )
        .where(F.col("__r") <= 5)
        .collect()
    )

    # 11. filter governance (r9, extended r10): before TRUSTING the
    # gates above — (a) Cohen's kappa between the declared language
    # and the lang-ID heuristic (chance-corrected agreement: the
    # swap-a-labeler gate), (b) expected calibration error of the
    # quality score read as a pass-probability (is 0.8 actually
    # 80%?), (c) log-loss of the same probability (the training
    # objective itself, via the literal log-quanta table), (d) the
    # weighted kappa between the quality tier and a length tier
    # (ordinal agreement — is "quality" just length?), and (e) the
    # lift of the top quality decile (what a 10%-budget pass would
    # capture). All exact-integer aggregates; each is one tiny extra
    # plan over columns already computed.
    from blockchain_data_engineering_spark.operators.ml_eval import (
        cohens_kappa,
        cumulative_gain,
        ece,
        log_loss,
        weighted_kappa,
    )

    kappa = cohens_kappa(
        feats, F.col("lang"), F.col("lang_pred")
    ).first()
    # r11: the information-theoretic companion — how much does the
    # heuristic TELL YOU about the declared label (NMI = 1 iff the
    # labelings are permutations; 0 iff independent), from the same
    # (actual, predicted) cell grain kappa reads
    from blockchain_data_engineering_spark.operators.ml_eval import (
        adjusted_rand_index,
        label_mutual_information,
    )

    lmi = label_mutual_information(
        feats, F.col("lang"), F.col("lang_pred")
    ).first()
    # and the pair-counting lens (exact, no quantization): how many
    # document PAIRS do the two labelings co-group the same way,
    # beyond chance
    lari = adjusted_rand_index(
        feats, F.col("lang"), F.col("lang_pred")
    ).first()
    # r11: the per-class drill-down behind the scalars — WHICH
    # language the heuristic fails on, and whether by precision
    # (over-fires into the class) or recall (the class leaks away)
    from blockchain_data_engineering_spark.operators.ml_eval import (
        multiclass_class_report,
    )

    worst_cls = (
        multiclass_class_report(feats, F.col("lang"), F.col("lang_pred"))
        .orderBy(F.col("f1").asc(), F.col("class"))
        .first()
    )
    # r10: ordinal agreement between the 0-5 quality TIER and a 0-5
    # length tier — quadratic weights score distance² on the scale,
    # where plain kappa would treat 4-vs-5 like 0-vs-5
    wkappa = weighted_kappa(
        feats,
        rater_a=F.least(
            F.floor(F.col("quality_score") / 20).cast("long"), F.lit(5)
        ),
        rater_b=F.least(
            (F.length(F.col("text")) / 100).cast("long"), F.lit(5)
        ),
        weighting="quadratic",
    ).first()
    q_smax = 1_000_000  # score/100 as a probability, parts-per-million
    scored = feats.select(
        (F.col("lang") == "en").alias("y"),
        # quality_score is 0-100 → /100 reads it as P(keep); ·10^4
        # quantizes to ppm. ROUND to the nearest quantum (the
        # parity.quanta recipe) — a bare cast("long") TRUNCATES, so a
        # 0.79999 double would land one quantum below its IEEE value
        F.least(
            F.floor(F.col("quality_score") * 10_000 + F.lit(0.5)).cast(
                "long"
            ),
            F.lit(q_smax),
        ).alias("sq"),
    )
    cal = ece(
        scored, F.col("y"), F.col("sq"), s_max=q_smax, n_bins=10
    ).first()
    # r10: the actual training objective — the logarithmic proper
    # score via the literal log-quanta table (s_max=1000 grid: the
    # table is a plan literal, so the score re-quantizes down)
    ll = log_loss(
        scored,
        F.col("y"),
        # re-quantize ppm → the 1000-grid by ROUNDING (+0.5 before the
        # floor) — a bare floor would re-introduce the half-quantum
        # downward bias the score-quanta contract warns about
        F.floor(F.col("sq") / F.lit(1000) + F.lit(0.5)).cast("long"),
        s_max=1000,
    ).first()
    top_decile = (
        cumulative_gain(
            scored, F.col("y"), F.col("sq"), n_buckets=10
        )
        .where(F.col("bucket") == 1)
        .first()
    )

    print(f"documents in:           {n0}")
    print(f"after curation:         {n_final}  ({n_final / n0:.1%} kept)")
    print(f"embedding near-dup prs: {n_emb_dups}")
    print(f"residual dup-span toks: {span_tokens}")
    print(f"mean novelty vs ref:    {nov:.3f}")
    print(f"hashed feature rows:    {n_feat}")
    print(f"int8 vector cells:      {q8_rows}")
    print(
        f"quality-vs-en AUC:      {auc.auc:.3f} "
        f"({auc.n_pos} pos / {auc.n_neg} neg)"
    )
    print("token-length sketch percentiles (split, q, est_tokens):")
    for r in sorted(qrows, key=lambda r: (r["split"], r["q_bp"])):
        print(
            f"  {r['split']:5s} p{r['q_bp'] / 100:5.2f}  {r['est_v']:6d}"
            f"  (n={r['n_total']}, k={r['k_actual']})"
        )
    print("vocabulary head (split, token, count_lo..count_hi):")
    for r in sorted(hh_top, key=lambda r: (r["split"], -r["count_lo"])):
        print(
            f"  {r['split']:5s} {r['item']:>12s}"
            f"  {r['count_lo']}..{r['count_hi']}"
        )
    # the scalars are NULL (Python None) on degenerate inputs — kappa's
    # denominator 0, an empty score set, zero positives — and None has
    # no :.3f; print 'n/a' instead of crashing the readout
    fmt = lambda v, spec: format(v, spec) if v is not None else "n/a"  # noqa: E731
    print(
        f"lang-ID vs declared κ:  {fmt(kappa.kappa, '.3f')} "
        f"(n={kappa.n}, labels={kappa.n_labels})"
    )
    print(
        f"lang-ID vs declared NMI: {fmt(lmi.nmi, '.3f')} "
        f"(MI {fmt(lmi.mi, '.3f')} nats, H_decl "
        f"{fmt(lmi.h_actual, '.3f')}, H_pred {fmt(lmi.h_predicted, '.3f')})"
    )
    print(
        f"lang-ID vs declared ARI: {fmt(lari.ari, '.3f')} "
        f"(rand index {fmt(lari.rand_index, '.3f')}, exact pair counting)"
    )
    if worst_cls is not None:
        print(
            f"weakest lang-ID class:  {worst_cls['class']} "
            f"(F1 {fmt(worst_cls.f1, '.3f')}, "
            f"P {fmt(worst_cls.precision, '.3f')}, "
            f"R {fmt(worst_cls.recall, '.3f')}, "
            f"support {worst_cls.support})"
        )
    print(
        f"quality-score ECE:      {fmt(cal.ece, '.4f')} "
        f"({cal.n_bins_used} bins over {cal.n} docs)"
    )
    print(
        f"quality-score log-loss: {fmt(ll.log_loss, '.4f')} nats "
        f"({ll.n_clamped} hard predictions eps-clamped)"
    )
    print(
        f"quality-vs-length κ_w:  {fmt(wkappa.kappa, '.3f')} "
        f"(quadratic, {wkappa.n_labels} tiers)"
    )
    if top_decile is not None:
        print(
            f"top-decile lift (en):   {fmt(top_decile.lift, '.2f')}x "
            f"({top_decile.tp_taken}/{top_decile.n_pos} positives in "
            f"{top_decile.n_taken} docs)"
        )
    else:
        print("top-decile lift (en):   n/a (no bucket-1 row)")
    print(
        f"train/val source JS:    {fmt(split_js.js, '.4f')} "
        f"(ln2 bound {math.log(2):.4f}, {split_js.n_categories} sources)"
    )
    print(
        f"train/val source KL:    {fmt(split_kl.kl, '.4f')} "
        f"(val vs train reference, directional)"
    )
    print("packing histogram (split, bucket, n_docs, tokens):")
    for r in packing.collect():
        print(f"  {r['split']:5s} b{int(r['bucket']):2d}  {r['n_docs']:5d}  {int(r['tokens']):8d}")
    print(f"wall: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
