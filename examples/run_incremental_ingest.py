"""End-to-end demo: INCREMENTAL corpus ingestion as a streaming job —
the shape a production crawl intake runs continuously, built from the
same operators the batch pipeline uses:

  per micro-batch (foreachBatch):
    1. quarantine gate  — malformed lines land in a replay table,
                          never kill the job
    2. exact dedup      — batch-vs-INDEX on the normalized-text
                          fingerprint (O(batch), the maintained index
                          is a bucketed parquet table)
    3. novelty scoring  — winnowing fps vs the already-ingested
                          fingerprint index (text_novelty_score shape)
    4. quality gate     — heuristic score >= 60 (classifier drops in)
    5. sinks            — accepted docs, the quarantine, and both
                          indexes all land via the keyed bucketed
                          O(batch) upsert

Replays are idempotent: EVERY sink is keyed (doc fingerprint, raw-line
md5, n-gram fp), so a re-delivered micro-batch upserts the same rows. The same composition
runs unchanged on a cluster with the landing dir on S3 and the indexes
as Delta tables (sources/io.upsert_delta).

    python examples/run_incremental_ingest.py [work_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blockchain_data_engineering_spark.operators import text as TX
from blockchain_data_engineering_spark.session import get_spark
from blockchain_data_engineering_spark.sources import (
    bucketed_table_exists,
    maybe_compact_bucketed,
    upsert_parquet_bucketed,
)


def _write_landing(land: str) -> int:
    """Three micro-batch files: fresh docs, a partial repeat + one
    malformed line, then wholly duplicate content."""
    docs = [
        (1, "the quick brown fox jumps over the lazy dog once more today"),
        (2, "spark shuffles hash partitions across the cluster executors"),
        (3, "parquet column pruning keeps scans narrow and fast always"),
        (4, "watermarks bound the state a streaming aggregation retains"),
        (5, "the quick brown fox jumps over the lazy dog once more today"),
        (6, "broadcast joins ship the small side to every executor core"),
    ]
    batches = [docs[0:2], docs[2:4], docs[4:6]]
    os.makedirs(land, exist_ok=True)
    now = time.time()
    for i, batch in enumerate(batches):
        lines = [json.dumps({"doc_id": d, "text": t}) for d, t in batch]
        if i == 1:  # poison line: must be quarantined, not fatal
            lines.append('{"doc_id": "not json...')
        path = os.path.join(land, f"b{i}.json")
        with open(path, "w") as fh:
            fh.write("\n".join(lines))
        os.utime(path, (now - 30 + 10 * i, now - 30 + 10 * i))
    return sum(len(b) for b in batches)


def main(work: str) -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    land = os.path.join(work, "landing")
    n_in = _write_landing(land)
    accepted = os.path.join(work, "accepted")
    quarantine = os.path.join(work, "quarantine")
    doc_index = os.path.join(work, "doc_fp_index")
    ngram_index = os.path.join(work, "ngram_fp_index")

    def ingest(batch, batch_id):
        s = batch.sparkSession
        parsed = batch.select(
            F.col("value").alias("raw"),
            F.from_json("value", "doc_id LONG, text STRING").alias("j"),
        )
        ok = F.col("j").isNotNull() & F.col("j.doc_id").isNotNull() & F.col(
            "j.text"
        ).isNotNull()
        # keyed quarantine (md5 of the raw line): a replayed batch
        # upserts the same poison rows instead of duplicating them
        upsert_parquet_bucketed(
            parsed.where(~ok).select("raw", F.md5("raw").alias("raw_fp")),
            quarantine,
            ["raw_fp"],
            n_buckets=4,
        )
        good = parsed.where(ok).select("j.doc_id", "j.text")

        # exact dedup vs the maintained index (batch-vs-index only);
        # intra-batch first (keep the lowest doc_id per fingerprint).
        # Index probes go through the Hadoop FS (an os.path probe would
        # misreport an object-store index as missing and re-accept
        # every duplicate).
        from pyspark.sql import Window

        with_fp = good.select(
            "doc_id", "text", TX.fingerprint(F.col("text")).alias("doc_fp")
        )
        w_fp = Window.partitionBy("doc_fp").orderBy("doc_id")
        with_fp = (
            with_fp.withColumn("__rn", F.row_number().over(w_fp))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if bucketed_table_exists(s, doc_index):
            seen = s.read.parquet(doc_index).select("doc_fp")
            fresh = with_fp.join(seen, "doc_fp", "left_anti")
        else:
            fresh = with_fp
        # PIN the pre-upsert state with localCheckpoint, NOT persist:
        # fresh/fps are read again by the index upserts below, and
        # those upserts REWRITE the very path this lineage reads —
        # writing it triggers Spark's recacheByPath, which invalidates
        # dependent cache entries, so a persisted plan would lazily
        # re-run the anti-join against the POST-upsert index and drop
        # the batch's own rows (observed: every batch after the first
        # contributed zero fps). Checkpointing truncates the plan to
        # the materialized rows — no path dependency left to refresh.
        fresh = fresh.localCheckpoint(eager=True)
        fps = TX.winnow_fingerprints(fresh, keep_cols=("doc_id",)).localCheckpoint(
            eager=True
        )

        # novelty vs the n-gram index
        if bucketed_table_exists(s, ngram_index):
            ref = s.read.parquet(ngram_index).select("fp").distinct()
        else:
            ref = s.createDataFrame([], "fp string")
        nov = (
            fps.join(ref.withColumn("__seen", F.lit(1)), "fp", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"), F.count("__seen").alias("ns"))
            .select(
                "doc_id",
                (
                    (F.col("n") - F.col("ns")).cast("double")
                    / F.col("n").cast("double")
                ).alias("novelty"),
            )
        )

        scored = TX.quality_score(fresh).join(nov, "doc_id", "left")
        keep = scored.where(F.col("quality_score") >= 60.0).select(
            "doc_id",
            "text",
            "doc_fp",
            # a doc too short to carry one winnowing window (< k+w-1
            # chars) has no fps → no novelty row; it is trivially novel
            F.coalesce("novelty", F.lit(1.0)).alias("novelty"),
        )
        # keyed accepted sink: replays upsert the same doc_fp rows
        upsert_parquet_bucketed(keep, accepted, ["doc_fp"], n_buckets=8)

        # index maintenance LAST (scoring saw the pre-batch state)
        upsert_parquet_bucketed(
            fresh.select("doc_fp", "doc_id"), doc_index, ["doc_fp"], n_buckets=8
        )
        upsert_parquet_bucketed(
            fps.select("fp").distinct(), ngram_index, ["fp"], n_buckets=8
        )
        # layout maintenance: each upsert adds ~1 file per writing
        # task to every touched bucket, so an unmaintained index
        # accretes files without bound over a long replay. The probe
        # is a pure file listing per batch; compaction triggers only
        # past the threshold. MUST run after every read of the index
        # this batch (rewrite invalidates cached plans reading the
        # path — docs/SCALE.md read-then-rewrite rule).
        for idx_path in (doc_index, ngram_index):
            maybe_compact_bucketed(s, idx_path, max_files_per_bucket=8)

    q = (
        spark.readStream.option("maxFilesPerTrigger", 1)  # source option:
        # one landing file per micro-batch, so the index evolves
        # between batches (mtime order pins which file is "earlier")
        .text(land)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    acc = spark.read.parquet(accepted)
    n_acc = acc.count()
    n_quar = spark.read.parquet(quarantine).count()
    print(f"docs in:        {n_in} (+1 poison line)")
    print(f"quarantined:    {n_quar}")
    print(f"accepted:       {n_acc}")
    for r in acc.orderBy("doc_id").collect():
        print(f"  doc {r['doc_id']}  novelty={r['novelty']:.2f}")
    print(f"wall: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main(sys.argv[1])
    else:
        work = tempfile.mkdtemp(prefix="ingest_demo_")
        try:
            main(work)
        finally:
            shutil.rmtree(work, ignore_errors=True)
