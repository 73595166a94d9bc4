package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (100 TB posture). Spark's AQE
  * already splits skewed SHUFFLE JOIN partitions at runtime, but a
  * skewed AGGREGATION key still lands every row of the hot key in
  * one reducer. Salting is the classic fix: shard each key across
  * `saltBuckets` sub-keys for a partial aggregate, then combine the
  * shards. The result is bit-identical to the direct aggregation —
  * only the shuffle distribution changes — which is what makes it
  * oracle-checkable against the plain GROUP BY.
  *
  * Note Spark's hash aggregation is already two-phase (map-side
  * partial combine), which de-skews pure counts on its own; salting
  * earns its keep when the partial state per group is large (e.g.
  * collect-style or high-cardinality-distinct aggregates) or when a
  * downstream stage inherits the skewed clustering. The operator is
  * the reusable pattern; [[saltedKeyCounts]] applies it to the
  * inverted index's posting counts, whose 'o'/'f' keys carry ~35k
  * postings each at sf0.01 (see `search_orders_dfcap`).
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of the row's full key
    * tuple plus a disambiguator column keeps shards balanced without
    * randomness (reproducible plans, resumable runs).
    */
  private def salt(buckets: Int, cols: Seq[Column]): Column =
    pmod(hash(cols: _*), lit(buckets)).cast("int")

  /** Two-stage salted count: groupBy(key..., salt) partial counts,
    * then groupBy(key...) sum of shard counts.
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String], shardBy: Seq[String],
      saltBuckets: Int = 16, as: String = "n"): DataFrame = {
    val partial = df
      .withColumn("__salt",
        salt(saltBuckets, (keyCols ++ shardBy).map(col)))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").cast("long").as(as))
  }

  /** Per-key posting counts of the inverted index via the salted
    * two-stage aggregation, top `k` hottest keys. The salt shards on
    * (key, table_id, row_id), so a 35k-posting hot key spreads over
    * all buckets in stage one and contributes `saltBuckets` rows to
    * stage two.
    */
  def saltedKeyCounts(index: DataFrame, k: Int = 20,
      saltBuckets: Int = 16): DataFrame =
    saltedCount(index, Seq("key"), Seq("table_id", "row_id"), saltBuckets, "df")
      .orderBy(col("df").desc, col("key").asc)
      .limit(k)
}
