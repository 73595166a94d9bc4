package graft

import graft.operators.CorpusPrep

/** [[CorpusPrep.epochPack]]: each epoch must be a PERMUTATION of the
  * corpus (same docs, same tokens, same sequence count), distinct
  * from other epochs' orders, and internally gapless — consecutive
  * documents in an epoch's order abut exactly (position arithmetic
  * reconstructs the running total with no holes or overlaps).
  */
class EpochPackSpec extends SparkTestBase {
  import spark.implicits._

  private val Budget = 512L

  private lazy val rows =
    CorpusPrep.epochPack(spark, sf0001, epochs = 3, budget = Budget,
        outMod = 1L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.toSeq).toMap

  test("every epoch is a permutation: same docs, tokens, sequences") {
    assert(rows.keySet == Set(0L, 1L, 2L))
    val sets = rows.view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(sets(0L) == sets(1L) && sets(1L) == sets(2L))
    val lastSeq = rows.view.mapValues(_.map(_._4).max).toMap
    assert(lastSeq(0L) == lastSeq(1L) && lastSeq(1L) == lastSeq(2L))
  }

  test("epochs order the corpus differently") {
    def order(e: Long): Seq[Long] =
      rows(e).sortBy(r => (r._4, r._5, r._2)).map(_._2)
    assert(order(0L) != order(1L) && order(1L) != order(2L))
  }

  test("each epoch's packing is gapless: positions abut exactly") {
    rows.foreach { case (e, rs) =>
      val inOrder = rs.map { case (_, id, n, seq, off) =>
        (seq * Budget + off, n, id)
      }.sortBy(_._1)
      inOrder.sliding(2).foreach {
        case Seq((p1, n1, id1), (p2, _, id2)) =>
          assert(p1 + n1 == p2,
            s"epoch $e: doc $id1 ends at ${p1 + n1} but doc $id2 starts at $p2")
        case _ =>
      }
      assert(inOrder.head._1 == 0L, s"epoch $e must start at position 0")
    }
  }

  test("epochs <= 0 is rejected, not phantom-epoch'd") {
    // sequence(0, -1) would silently DESCEND ([0, -1]) and emit two
    // packings; the guard turns that into a loud error.
    intercept[IllegalArgumentException] {
      graft.operators.CorpusPrep.epochPack(spark, sf0001, epochs = 0)
    }
  }
}
