package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** CDC merge semantics ([[Cdc]]): latest-wins on crafted frames, the
  * compaction/composition law that licenses batching feeds before
  * touching a 100 TB base, and the merge's physical shape (hint-free
  * full-outer sort-merge join — never a broadcast of a
  * corpus-proportional feed).
  */
class CdcSpec extends SparkTestBase {

  import spark.implicits._

  private def baseDf(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source")

  private def feedDf(rows: (Long, Long, String, String, String, String)*): DataFrame =
    rows.toDF("doc_id", "seq", "op", "text", "lang", "source")

  test("latest change wins; deletes drop; inserts append; origins tagged") {
    val base = baseDf((1L, "a", "en", "web"), (2L, "b", "en", "web"),
      (3L, "c", "de", "web"))
    val feed = feedDf(
      (1L, 1L, "U", "x", null, null),
      (1L, 2L, "U", "y", null, null), // second update supersedes
      (2L, 1L, "D", null, null, null),
      (9L, 1L, "I", "new", "fr", "crawl"))
    val out = Cdc.mergeSnapshot(base, feed)
      .orderBy("doc_id")
      .select("doc_id", "text", "lang", "source", "origin")
      .as[(Long, String, String, String, String)].collect.toSeq
    assert(out === Seq(
      (1L, "y", "en", "web", "updated"),
      (3L, "c", "de", "web", "base"),
      (9L, "new", "fr", "crawl", "inserted")))
  }

  test("merge composes: sequential feeds == one unioned feed") {
    // f1 on the corpus; f2 touches the merged snapshot with disjoint
    // semantics per key class: update previously-updated keys again,
    // delete previously-updated keys, update untouched keys. (The
    // known non-composable case — a partial-payload U re-seeding a
    // key after its D — is excluded by contract: takedowns are final
    // unless a full I re-seeds the key, same as lakehouse partial
    // updates.)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val f1 = Cdc.changeFeed(spark, sf0001)
    val f2raw = docs.where(col("doc_id") % 10 === 1)
      .select(col("doc_id"), lit(11L).as("seq"), lit("U").as("op"),
        concat(lit("AGAIN "), col("text")).as("text"),
        lit(null).cast("string").as("lang"), lit(null).cast("string").as("source"))
    val f2del = docs.where(col("doc_id") % 20 === 3)
      .select(col("doc_id"), lit(12L).as("seq"), lit("D").as("op"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"), lit(null).cast("string").as("source"))
    val f2 = f2raw.unionAll(f2del)

    val step1 = Cdc.mergeSnapshot(docs, f1).drop("origin")
    val sequential = Cdc.mergeSnapshot(step1, f2).drop("origin")
    val unioned = Cdc.mergeSnapshot(docs, f1.unionAll(f2)).drop("origin")
    assert(sequential.exceptAll(unioned).isEmpty &&
      unioned.exceptAll(sequential).isEmpty,
      "sequential merge must equal merging the concatenated feed")
  }

  test("history: doubly-updated key has 3 versions with only seq-2 current; deleted keys have no current version") {
    val hist = Cdc.historyScdQuery(spark, sf0001).cache()
    val doubly = hist.where(col("doc_id") % 20 === 3)
    val perKey = doubly.groupBy("doc_id")
      .agg(count(lit(1)).as("versions"),
        sum(when(col("is_current"), 1L).otherwise(0L)).as("current"),
        max(when(col("is_current"), col("seq"))).as("current_seq"))
      .agg(min("versions"), max("versions"), min("current"),
        max("current"), min("current_seq"), max("current_seq"))
      .head
    assert(perKey.getLong(0) == 3 && perKey.getLong(1) == 3)
    assert(perKey.getLong(2) == 1 && perKey.getLong(3) == 1)
    assert(perKey.getLong(4) == 2 && perKey.getLong(5) == 2)
    val deletedCurrent = hist.where(col("doc_id") % 10 === 7)
      .where(col("is_current")).count
    assert(deletedCurrent == 0, "takedown keys must have no live version")
    hist.unpersist()
  }

  test("merge plan: full-outer sort-merge join, no broadcast, two shuffles") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Cdc.mergeSnapshotQuery(spark, sf0001)
        .queryExecution.executedPlan
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
      assert(smj.exists(_.joinType.toString == "FullOuter"),
        s"expected FullOuter: ${smj.map(_.joinType)}")
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      // base side + feed side (reused by the compaction aggregation),
      // plus the final orderBy's range exchange.
      assert(shuffles.size == 3,
        s"expected 3 exchanges (base, feed/compaction, sort), got ${shuffles.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
