package graft.streaming

import org.apache.hadoop.fs.Path

/** Ops/diagnostic probe for the delta-dir maintenance lease on
  * `args(0)`: PURELY OBSERVATIONAL — stat + read the lease file and
  * report holder and age without ever creating, refreshing, or
  * removing it. Exit 0 = free (no lease file), exit 2 = held (stdout
  * carries holder id and age in ms). Needs no Spark session — the
  * lease protocol is pure Hadoop-FS — so a cron health check or a
  * second-JVM spec (`LeaseSpec`) runs it in milliseconds.
  *
  * Why observational (round-13 ADVICE, superseding the round-13
  * review's acquire-with-infinite-TTL cut): a probe that ACQUIRES the
  * real lease is itself a mutation — a probe killed between acquire
  * and release leaves an orphan lease owned by a dead process that
  * blocks all maintenance for the full TTL, and a cron probe racing a
  * real maintainer's acquire spuriously refuses one of them. A health
  * check must not be able to change the health it reports. Stale
  * lease REMOVAL stays a maintenance decision: the next real
  * maintainer's TTL takeover, or a human at the reported path.
  */
object LeaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val conf = new org.apache.hadoop.conf.Configuration()
    val lease = new Path(DeltaLog.leasePath(dir))
    val fs = lease.getFileSystem(conf)
    try {
      val st = fs.getFileStatus(lease)
      val in = fs.open(lease)
      val who = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val mtimeAge = System.currentTimeMillis() - st.getModificationTime
      // maintainer-domain age (payload/beat stamp) when present —
      // what the takeover branch actually judges; mtime reported too
      // for legacy leases and skew diagnosis.
      val stampAge = DeltaLog.leaseTs(who)
        .map(t => s"${System.currentTimeMillis() - t}ms")
        .getOrElse("n/a (legacy lease, mtime governs)")
      println(s"held: ${DeltaLog.leaseOwner(who)} age $stampAge " +
        s"(mtime age ${mtimeAge}ms) at ${lease.toUri.getPath}")
      sys.exit(2)
    } catch {
      case _: java.io.FileNotFoundException =>
        println("free")
        sys.exit(0)
    }
  }
}
