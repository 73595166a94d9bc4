package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.LongType

/** The as-of join as a first-class Catalyst operator — the brief's
  * preference-ladder path (c): a custom `LogicalPlan` node, a planner
  * `Strategy` registered through `SparkSessionExtensions`, and a
  * custom `SparkPlan` that declares its distribution/ordering
  * requirements and merges per partition.
  *
  * The engine already expresses as-of composition-first
  * ([[graft.operators.Events.asofLatestOrder]], preference (a) — one
  * union + running `last()`); this operator is the (c) form of the
  * SAME semantics, kept because it shows what the ladder's bottom
  * rung looks like done properly: no shuffle beyond the key
  * clustering Spark itself inserts (`EnsureRequirements` reads the
  * declared `ClusteredDistribution` + `SortOrder` and plans the
  * exchanges/sorts), and a streaming two-pointer merge per partition
  * with O(1) state — the classic merge-join shape, specialized to
  * "latest right at-or-before left".
  *
  * Measured (sf0.1, local[32], steady state): composition ~0.6s vs
  * this exec ~1.1s — the union-window form stays the default on
  * merit, not just ladder preference: it sorts the union ONCE inside
  * whole-stage codegen, while this exec sorts both children and runs
  * an interpreted merge. The gap is the cost of leaving codegen; the
  * operator remains the template for semantics Spark genuinely
  * cannot compose.
  *
  * Scope: single bigint key and bigint event-time per side (what the
  * engine's corpus needs); generalizing to arbitrary key tuples swaps
  * the two long comparisons for an interpreted row ordering. A LEFT
  * row with a NULL key or time emits with the null right side — true
  * left-outer, matching both the composition form and the ASOF LEFT
  * JOIN oracle on null-keyed corpora (round-5 ADVICE; dropping them
  * silently made the two "same semantics" forms diverge). RIGHT rows
  * with a NULL key or time are skipped — nothing can be at-or-before
  * an unknown time. Right rows should be unique per (key, time) —
  * callers dedup, as the composition form documents — otherwise the
  * sort-last row wins nondeterministically.
  */
object AsOfJoin {

  /** Logical node: output = left columns ++ right columns (right side
    * nullable — left-outer as-of semantics).
    */
  final case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, leftTime: Attribute,
      rightKey: Attribute, rightTime: Attribute) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy — inject via
    * `SparkSessionExtensions.injectPlannerStrategy(_ => AsOfJoin.AsOfStrategy)`.
    */
  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
      case _ => Nil
    }
  }

  /** Physical as-of merge join. Declares `ClusteredDistribution` on
    * the key and `(key, time)` ascending ordering for BOTH children —
    * Spark's `EnsureRequirements` inserts the minimal exchanges and
    * sorts — then zips co-partitioned sorted iterators with a
    * two-pointer merge: advance the right side while its (key, time)
    * is at-or-before the current left row, remembering only the last
    * same-key right row. O(1) memory per partition, one pass.
    */
  final case class AsOfJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Attribute, leftTime: Attribute,
      rightKey: Attribute, rightTime: Attribute) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val outAttrs = output
      val lk = leftKey; val lt = leftTime; val rk = rightKey; val rt = rightTime
      left.execute().zipPartitions(right.execute()) { (lIt, rIt0) =>
        val lProj = UnsafeProjection.create(Seq(lk, lt), lOut)
        val rProj = UnsafeProjection.create(Seq(rk, rt), rOut)
        // bind against the NULLABLE output schema: binding to the raw
        // right attributes (non-nullable) would codegen field reads
        // without null checks and turn the no-match null row into 0s.
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rOut.size)
        val rIt = rIt0.buffered
        var cur: InternalRow = null
        var curKey = 0L
        lIt.flatMap { l =>
          val lkt = lProj(l)
          if (lkt.isNullAt(0) || lkt.isNullAt(1))
            Iterator.single(outProj(joined(l, nullRight)))
          else {
            val lKey = lkt.getLong(0); val lTime = lkt.getLong(1)
            if (cur != null && curKey != lKey) cur = null
            var advancing = true
            while (advancing && rIt.hasNext) {
              val hkt = rProj(rIt.head)
              if (hkt.isNullAt(0) || hkt.isNullAt(1)) { rIt.next(); () }
              else {
                val hKey = hkt.getLong(0); val hTime = hkt.getLong(1)
                if (hKey < lKey) { rIt.next(); () }
                else if (hKey == lKey && hTime <= lTime) {
                  cur = rIt.next().copy(); curKey = hKey
                } else advancing = false
              }
            }
            val r = if (cur != null && curKey == lKey) cur else nullRight
            Iterator.single(outProj(joined(l, r)))
          }
        }
      }
    }
  }

  /** User-facing API: latest `right` row per key at-or-before each
    * `left` row's time, left-outer. Key/time columns must be bigint.
    */
  def joinLatest(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String): DataFrame = {
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name' in ${plan.output.map(_.name)}"))
    val la = left.queryExecution.analyzed
    val ra = right.queryExecution.analyzed
    val node = AsOfJoinNode(la, ra,
      attr(la, leftKey), attr(la, leftTime), attr(ra, rightKey), attr(ra, rightTime))
    Seq(node.leftKey, node.leftTime, node.rightKey, node.rightTime).foreach { a =>
      require(a.dataType == LongType, s"as-of key/time must be bigint: ${a.name} is ${a.dataType}")
    }
    Bridge.ofRows(left.sparkSession, node)
  }
}
