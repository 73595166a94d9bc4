package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.CorpusPrep

/** The recursive two-pass running sum (round-10): equality with the
  * global window on adversarial sizes, bucketing-independence, and
  * the structural claim — no windowed partition ever exceeds the
  * bucket size, at any level.
  */
class ShardPackRecSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic adversarial sizes: zero-token docs, heavy heads,
  // id GAPS (sparse doc ids — buckets of unequal population).
  private def fixture(n: Int): org.apache.spark.sql.DataFrame = {
    var seed = 0x51AB2E6CD1702DL
    var id = 0L
    val rows = (0 until n).map { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      id += math.floorMod(seed >>> 33, 7L) + 1L // strictly increasing
      val v = math.floorMod(seed >>> 13, 97L) match {
        case x if x < 9 => 0L // zero-size docs
        case x if x > 90 => x * 1000L // heavy heads
        case x => x
      }
      (id, v)
    }
    rows.toDF("doc_id", "n_tokens")
  }

  test("recursive prefix == global window == packedOf, across bucket sizes") {
    val f = fixture(700).persist()
    val global = f
      .withColumn("tokens_before",
        coalesce(sum("n_tokens").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "n_tokens", "tokens_before")
      .collect().map(_.toString).sorted.toSeq
    // bucket sizes spanning: recursion depth >= 3 (B=4 on 700 rows),
    // depth 2, and the degenerate one-level (B >= n) case.
    Seq(4L, 8L, 64L, 100000L).foreach { b =>
      val rec = CorpusPrep.packedOfRecursive(f, b)
        .select("doc_id", "n_tokens", "tokens_before")
        .collect().map(_.toString).sorted.toSeq
      assert(rec === global, s"bucketSize=$b diverges from the global window")
    }
    f.unpersist()
  }

  test("no windowed partition exceeds the bucket size at any level") {
    // structural proof by partition accounting: group the fixture by
    // each level's bucket key and check populations — level 0 windows
    // partition by doc_id div B (<= B rows each by id-density), the
    // recursion tops out at a <= B-row global window.
    val f = fixture(700)
    val b = 8L
    // level 0: per-bucket population is bounded by B only for DENSE
    // ids; sparse ids make buckets SMALLER, never bigger.
    val l0max = f.groupBy(expr(s"doc_id div $b")).count()
      .agg(max("count")).head().getLong(0)
    assert(l0max <= b)
    // level 1 ids are dense bucket indexes: populations exactly <= B.
    val l1 = f.groupBy(expr(s"doc_id div $b").as("id")).count()
    val l1max = l1.groupBy(expr(s"id div $b")).count()
      .agg(max("count")).head().getLong(0)
    assert(l1max <= b)
    // and the level count is logarithmic: 700 ids at B=8 needs
    // ceil(log_8) = 4 levels, the last of which fits one window.
    val levels = Iterator.iterate(f.select(expr(s"doc_id div $b").as("id"))
        .distinct.count())(c => (c + b - 1) / b)
      .takeWhile(_ > b).size + 1
    assert(levels <= 4, s"unexpected recursion depth $levels")
  }

  test("the registered recursive packer matches the plain packer row for row") {
    val rec = CorpusPrep.shardPackingRecursive(spark, sf0001)
      .collect().map(_.toString).toSeq
    val plain = CorpusPrep.shardPacking(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(rec === plain && rec.nonEmpty)
  }
}
