package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Randomized adversarial check of the heavy-hitter certificate: for
  * random corpora and DELIBERATELY tiny bucket counts (maximal
  * collision pressure — the regime where the sketch is most likely
  * to hide a true heavy hitter), `certified = 1` must imply exact
  * equality with the full-vocabulary top-k. The certificate may
  * fail (that is its job under collisions) but it must never lie:
  * across every generated case, no certified result may differ from
  * exact. Complements `HeavyHitterSpec`'s fixed fixtures the way
  * `JoinSearchPropertySpec` complements the strategy twins.
  * Fixed seed — failures replay.
  */
class HeavyHitterPropertySpec extends SparkTestBase {

  import spark.implicits._

  test("certified => exact, across random corpora and hostile bucket counts") {
    val rnd = new Random(0x8e5)
    // skewed vocabulary: few hot words, a tail — the shape the sketch
    // is for, small enough that tiny B shares hot buckets with tail
    // mass.
    val hot = Seq("alpha", "beta", "gamma")
    val warm = Seq("delta", "epsilon", "zeta", "eta")
    val tail = (0 until 40).map(i => s"tail$i")
    def word(): String = rnd.nextInt(11) match {
      case n if n < 6 => hot(rnd.nextInt(hot.size))
      case n if n < 9 => warm(rnd.nextInt(warm.size))
      case _          => tail(rnd.nextInt(tail.size))
    }
    var certifiedSeen = 0
    for (trial <- 1 to 12) {
      val buckets = Seq(2, 4, 16, 1024)(rnd.nextInt(4))
      val docsDf = (0 until 30)
        .map(i => (i.toLong, Seq.fill(1 + rnd.nextInt(12))(word()).mkString(" ")))
        .toDF("doc_id", "text")
      val k = 5
      val got = TextAnalysis.heavyHittersFromSketch(
        docsDf, TextAnalysis.bucketTotalsOf(docsDf, buckets), k, buckets)
        .collect().toSeq
        .map(r => (r.getAs[String]("term"), r.getAs[Long]("cnt"),
          r.getAs[Long]("certified")))
      if (got.exists(_._3 == 1L)) {
        certifiedSeen += 1
        val exact = TextAnalysis.tokenStreamOf(docsDf)
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term").asc).limit(k)
          .as[(String, Long)].collect().toSeq
        assert(got.map(t => (t._1, t._2)) === exact,
          s"certified result must equal exact (trial=$trial B=$buckets)")
      }
    }
    // the property must actually exercise the certified branch, or
    // it proves nothing
    assert(certifiedSeen > 0, "no generated case ever certified")
  }
}
