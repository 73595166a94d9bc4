package graft.streaming

/** Ops/diagnostic probe for the delta-dir maintenance lease: attempt
  * to acquire (and immediately release) the lease on `args(0)`.
  * Exit 0 = acquired (no other maintainer), exit 2 = refused (a live
  * maintainer holds it). Needs no Spark session — the lease protocol
  * is pure Hadoop-FS — so a cron health check or a second-JVM spec
  * (`LeaseSpec`) can run it in milliseconds. An optional `args(1)`
  * overrides the stale-takeover TTL in ms (diagnostics only).
  */
object LeaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ttl = if (args.length > 1) args(1).toLong else DeltaLog.LeaseTtlMs
    val conf = new org.apache.hadoop.conf.Configuration()
    try {
      DeltaLog.acquireLease(conf, dir, ttl)
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
