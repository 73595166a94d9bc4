package graft.streaming

/** Ops/diagnostic probe for the delta-dir maintenance lease: attempt
  * to acquire (and immediately release) the lease on `args(0)`.
  * Exit 0 = acquired (no other maintainer), exit 2 = refused (a
  * maintainer holds it — live OR stale; the message carries holder
  * and age). Needs no Spark session — the lease protocol is pure
  * Hadoop-FS — so a cron health check or a second-JVM spec
  * (`LeaseSpec`) can run it in milliseconds.
  *
  * The probe NEVER takes over: it acquires with an infinite
  * staleness bound, because a health check that deletes a live (or
  * even stale) maintainer's lease is a read that destroys the lock
  * it observes (round-13 review — the first cut took a TTL
  * argument, so `LeaseProbe dir 1000` against a 2-second-old healthy
  * fold would have stolen it). Stale-lease REMOVAL is a maintenance
  * decision: the next real maintainer's TTL takeover, or a human at
  * the reported path.
  */
object LeaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val conf = new org.apache.hadoop.conf.Configuration()
    try {
      DeltaLog.acquireLease(conf, dir, ttlMs = Long.MaxValue)
      DeltaLog.releaseLease(conf, dir)
      println("acquired")
      sys.exit(0)
    } catch {
      case e: ConcurrentMaintenanceException =>
        println(s"refused: ${e.getMessage}")
        sys.exit(2)
    }
  }
}
