package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge: fold a change feed (inserts / updates /
  * deletes, each stamped with a monotone sequence number) into a base
  * snapshot — the recrawl shape every training-corpus pipeline hits
  * (pages re-fetched, takedowns applied, new URLs discovered) and the
  * lakehouse MERGE INTO primitive, re-expressed as pure relational
  * algebra so the DuckDB oracle can replay it exactly.
  *
  * Two consumption semantics over ONE feed definition:
  *  - [[mergeSnapshot]]: latest-wins overwrite — the next corpus
  *    snapshot (what a training run reads);
  *  - [[historyScd]]: SCD-2-style full version history with an
  *    `is_current` flag — what audit/lineage reads.
  *
  * Scale posture (100 TB base, corpus-proportional recrawl feed):
  * latest-change compaction is ONE map-side-combinable max-struct
  * aggregation keyed by doc_id (never a window over the raw feed —
  * at a 10 % recrawl rate the feed is billions of rows, but per-key
  * state is one struct); the merge is ONE hint-free full-outer
  * sort-merge join on doc_id — deliberately no broadcast (a recrawl
  * feed grows with the corpus, the drop-list rule from
  * [[Dedup.keptCorpus]]), with AQE free to re-plan if a run's feed
  * happens to be tiny. The feed-side exchange from the compaction
  * aggregation is REUSED by the join (same key), so the whole merge
  * costs one pass over base + one over the feed. Sequential merges
  * compose: merge(merge(base, f1), f2) == merge(base, f1 ∪ f2)
  * (seqs disjoint) — pinned by `CdcSpec`, which is what licenses a
  * compactor to batch small feeds before touching the 100 TB base.
  */
object Cdc {

  /** Inserted doc_ids live above this offset — disjoint from every
    * base id at any test SF (base ids are dense from 0).
    */
  val InsertOffset = 10000000L

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Deterministic synthetic change feed derived from the corpus by
    * doc_id arithmetic (the fixture convention of
    * [[TextAnalysis]]'s planted PII): both engines rebuild the exact
    * same feed, so the merge itself is what the hash compare tests.
    *
    *  - seq 1 update of every doc_id % 10 == 3 (recrawled text);
    *  - seq 2 SECOND update of doc_id % 20 == 3 — half the recrawled
    *    docs change twice, so latest-wins ordering is observable;
    *  - seq 1 delete of doc_id % 10 == 7 (takedowns);
    *  - seq 1 insert of a brand-new doc per doc_id % 10 == 9
    *    (discovered URLs), id = progenitor + [[InsertOffset]].
    */
  def changeFeed(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val u1 = d.where(col("doc_id") % 10 === 3)
      .select(col("doc_id"), lit(1L).as("seq"), lit("U").as("op"),
        concat(lit("RECRAWL "), col("text")).as("text"),
        lit(null).cast("string").as("lang"), lit(null).cast("string").as("source"))
    val u2 = d.where(col("doc_id") % 20 === 3)
      .select(col("doc_id"), lit(2L).as("seq"), lit("U").as("op"),
        concat(lit("RECRAWL2 "), col("text")).as("text"),
        lit(null).cast("string").as("lang"), lit(null).cast("string").as("source"))
    val del = d.where(col("doc_id") % 10 === 7)
      .select(col("doc_id"), lit(1L).as("seq"), lit("D").as("op"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"), lit(null).cast("string").as("source"))
    val ins = d.where(col("doc_id") % 10 === 9)
      .select((col("doc_id") + InsertOffset).as("doc_id"), lit(1L).as("seq"),
        lit("I").as("op"), concat(lit("NEW "), col("text")).as("text"),
        col("lang"), col("source"))
    u1.unionAll(u2).unionAll(del).unionAll(ins)
  }

  /** Latest change per key: max over the (seq, op, text, lang,
    * source) struct — seq leads the struct, and seqs are unique per
    * key by feed contract, so this IS "highest seq wins" as one
    * map-side-combinable aggregate (no window over the raw feed).
    */
  private def compact(feed: DataFrame): DataFrame =
    feed.groupBy("doc_id")
      .agg(max(struct(col("seq"), col("op"), col("text"),
        col("lang"), col("source"))).as("c"))

  /** Latest-wins merged snapshot: base rows survive unless deleted,
    * updates replace text in place, inserts append; `origin` records
    * which path produced each row.
    */
  def mergeSnapshot(base: DataFrame, feed: DataFrame): DataFrame = {
    val latest = compact(feed)
    base.withColumn("in_base", lit(true))
      .join(latest, Seq("doc_id"), "full_outer")
      .where(coalesce(col("c.op"), lit("K")) =!= "D")
      .select(col("doc_id"),
        coalesce(col("c.text"), col("text")).as("text"),
        coalesce(col("lang"), col("c.lang")).as("lang"),
        coalesce(col("source"), col("c.source")).as("source"),
        when(col("in_base").isNull, "inserted")
          .when(col("c.op").isNull, "base")
          .otherwise("updated").as("origin"))
  }

  /** The registered snapshot query (stable doc_id order). */
  def mergeSnapshotQuery(spark: SparkSession, dir: String): DataFrame =
    mergeSnapshot(docs(spark, dir), changeFeed(spark, dir)).orderBy("doc_id")

  /** Time-travel read: the merged snapshot AS OF sequence `cut` —
    * the lakehouse `VERSION AS OF` primitive over the same feed.
    * Replaying only changes with `seq <= cut` through the unchanged
    * merge is exactly how log-structured tables serve historical
    * reads: the cut is a FILTER on the feed scan (predicate-pushdown
    * territory on a persisted feed), not a different merge algorithm,
    * so every scale property of [[mergeSnapshot]] (map-side latest
    * compaction, one hint-free full-outer join, exchange reuse)
    * carries over verbatim. With the fixture feed, `cut = 1`
    * excludes the seq-2 second recrawls — doc_id % 20 == 3 docs
    * observably show their seq-1 text instead of the final one,
    * which is what makes the cut visible to the hash compare.
    */
  def asOfSnapshot(base: DataFrame, feed: DataFrame, cut: Long): DataFrame =
    mergeSnapshot(base, feed.where(col("seq") <= cut))

  /** The registered as-of query (default cut between the two
    * update waves).
    */
  def asOfSnapshotQuery(spark: SparkSession, dir: String, cut: Long = 1L): DataFrame =
    asOfSnapshot(docs(spark, dir), changeFeed(spark, dir), cut).orderBy("doc_id")

  /** SCD-2-style version history from the SAME feed: base text is
    * version 0, each U/I change appends a version at its seq, a D
    * tombstone closes the key (emitted so audits see the takedown),
    * and `is_current` marks each key's live version — false for
    * every version of a deleted key. One window over (key, seq) —
    * versions per key are bounded by feed depth, not corpus size.
    */
  def historyScd(base: DataFrame, feed: DataFrame): DataFrame = {
    val v0 = base.select(col("doc_id"), lit(0L).as("seq"),
      lit("B").as("op"), col("text"))
    val versions = v0.unionAll(feed.select(
      col("doc_id"), col("seq"), col("op"), col("text")))
    val w = Window.partitionBy("doc_id").orderBy(col("seq").desc)
    versions
      .withColumn("rn", row_number().over(w))
      .withColumn("is_current", col("rn") === 1 && col("op") =!= "D")
      .drop("rn")
  }

  /** The registered history query. Inserted-then-never-touched keys
    * have exactly one current version; doubly-updated keys show all
    * three versions with only the seq-2 row current.
    */
  def historyScdQuery(spark: SparkSession, dir: String): DataFrame =
    historyScd(docs(spark, dir), changeFeed(spark, dir))
      .orderBy("doc_id", "seq")
}
