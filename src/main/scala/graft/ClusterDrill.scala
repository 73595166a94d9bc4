package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._
import scala.jdk.OptionConverters._

import org.apache.spark.sql.SparkSession

/** REAL multi-process Spark cluster drill (round-14 verdict #1: the
  * engine had never executed outside one JVM — every gate, bench and
  * drill ran `local[*]`, so closure serialization, netty
  * shuffle/broadcast transport and executor-side class loading were
  * structurally untested; the round-6 `readUrl` bug — a driver-local
  * path embedded in a scan — is exactly the class of latent failure
  * only executor processes expose).
  *
  * The drill stands up a LOCAL STANDALONE cluster — one master + two
  * worker JVMs (`org.apache.spark.deploy.{master.Master,
  * worker.Worker}`, the same daemons `sbin/start-all.sh` runs) — then
  * connects a `spark://` driver session ([[GraftSession.standalone]]:
  * code ships via `spark.jars` AND executor extraClassPath) and runs
  * four exit-code-gated cases:
  *
  *  1. PARITY — a battery of registered queries spanning every module
  *     family (flagship anchored search, partition-pruned + batch
  *     search, the SQL surface, the hint-free shuffled strategy,
  *     minhash-LSH + star-contraction dedup, indexed BM25, heavy
  *     hitters, IVF probe, shard packing, the custom Catalyst as-of
  *     SparkPlan, CSV ingress, BPE encode) runs on the cluster; a
  *     sibling LOCAL JVM (`hasher` mode) runs the identical battery
  *     and both report order-independent multiset states
  *     ([[ServeDrill.state]]) — every query must match exactly.
  *  2. ARTIFACT — a positional index + doc-length durable artifact is
  *     BUILT BY EXECUTOR PROCESSES on a scratch corpus (write tasks
  *     run executor-side; the driver commits the atomic
  *     no-overwrite rename), then served back through the indexed
  *     BM25 path; the local hasher re-serves the SAME artifact files
  *     and must agree — cross-process build/serve compatibility.
  *  3. MAINTAIN — delta batches land and fold (`DeltaLog.compactLive`
  *     under the maintenance lease) with executor processes doing the
  *     reads/writes; the folded state must equal the prefix oracle
  *     and the lease must be released.
  *  4. EXECUTOR-LOSS — one executor JVM is SIGKILLed while the
  *     flagship search runs in a loop; Spark's stage retry must
  *     complete every iteration with the baseline hash, and a
  *     subsequent land+fold must converge (the executor-grade sibling
  *     of round-14's driver-grade crash drills).
  *
  * Modes: no args = the full drill (exit 0 iff every case ok);
  * `hasher <outFile> <sfDir> <corpus|-> <name...>` = the local parity
  * child; `up [baseDir]` = stand the cluster up and park until
  * `<baseDir>/stop` appears (lets `SPARK_GRAFT_MASTER=<url>`
  * Verify/Bench runs target it — the full-registry compare.py gate
  * under `spark://` is run that way, logged in SCALE.md).
  *
  * What a same-box cluster CANNOT exhibit (documented, not claimed):
  * cross-host file visibility (every path is on one FS) and real
  * network cost (loopback) — see VERDICT r14 "missing" #5.
  */
object ClusterDrill {

  /** Battery for the parity case — chosen to cross every module and
    * physical shape, not for coverage count (the FULL registry runs
    * against the cluster via `SPARK_GRAFT_MASTER` + Verify +
    * compare.py; this battery is the self-contained repeatable gate).
    */
  val FullBattery: Seq[String] = Seq(
    "search_customer_tables", "search_pruned_tables",
    "search_batch_queries", "sql_api_search", "strategy_shuffled",
    "dedup_minhash_lsh", "dedup_clusters", "text_bm25_topk_indexed",
    "text_heavy_hitters", "sim_ivf_probe", "prep_shard_packing",
    "events_asof_catalyst", "csv_source_search", "text_bpe_ids",
    "u1_union_per_column")

  final case class CaseReport(name: String, ok: Boolean, detail: String) {
    def json: String =
      s"""{"case":"$name","ok":$ok,"detail":"${detail.replace("\"", "'")}"}"""
  }

  private def battery: Seq[String] =
    sys.env.get("GRAFT_CLUSTER_BATTERY")
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(FullBattery)

  private def sfDir: String =
    sys.env.getOrElse("GRAFT_CLUSTER_SF", "/root/testdata/sf0.01")

  // ---------------------------------------------------------------
  // cluster lifecycle
  // ---------------------------------------------------------------

  /** Env the daemon JVMs need: the Worker builds each executor's
    * command via the launcher library, which resolves jars from
    * `SPARK_HOME` and the Scala suffix from `SPARK_SCALA_VERSION`
    * (normally exported by `load-spark-env.sh`, which a raw `java`
    * launch skips).
    */
  private def daemonEnv: Map[String, String] = {
    val jarDir = JvmSpawn.sparkJarDir.getOrElse(
      sys.error("cannot locate the Spark jar directory for SPARK_HOME"))
    Map(
      "SPARK_HOME" -> new java.io.File(jarDir).getParent,
      "SPARK_SCALA_VERSION" ->
        scala.util.Properties.versionNumberString.split('.').take(2).mkString("."))
  }

  final case class Cluster(master: Process, workers: Seq[Process],
      url: String, scratch: String) {

    /** Executor JVMs currently alive under the workers. */
    def executorHandles: Seq[ProcessHandle] =
      workers.flatMap(_.toHandle.descendants().iterator().asScala)
        .filter(_.info().commandLine().toScala
          .exists(_.contains("CoarseGrainedExecutorBackend")))

    /** Kill everything, children first (a SIGKILLed worker cannot run
      * its shutdown hook, so its executors would outlive it).
      */
    def tearDown(): Unit = {
      val kids = (workers :+ master).flatMap(
        _.toHandle.descendants().iterator().asScala)
      kids.foreach(_.destroyForcibly())
      (workers :+ master).foreach(_.destroyForcibly())
      (workers :+ master).foreach(
        _.waitFor(20, java.util.concurrent.TimeUnit.SECONDS))
    }
  }

  /** Spawn master + `nWorkers` workers and wait until every worker
    * has registered. Daemon logs land under `scratch`.
    */
  def standUp(scratch: String, nWorkers: Int = 2, coresPerWorker: Int = 8,
      workerMem: String = "6g"): Cluster = {
    Files.createDirectories(Paths.get(scratch))
    val port = sys.env.getOrElse("GRAFT_MASTER_PORT", "7201").toInt
    val url = s"spark://127.0.0.1:$port"
    val env = daemonEnv
    val master = JvmSpawn.spawn("org.apache.spark.deploy.master.Master",
      Seq("--host", "127.0.0.1", "--port", port.toString, "--webui-port", "0"),
      new java.io.File(s"$scratch/master.log"), xmx = "1g", env = env)
    awaitLog(s"$scratch/master.log", "Successfully started service 'sparkMaster'",
      master, "master never bound its RPC port")
    val workers = (1 to nWorkers).map { i =>
      JvmSpawn.spawn("org.apache.spark.deploy.worker.Worker",
        Seq("--host", "127.0.0.1", "--webui-port", "0",
          "--cores", coresPerWorker.toString, "--memory", workerMem,
          "--work-dir", s"$scratch/work$i", url),
        new java.io.File(s"$scratch/worker$i.log"), xmx = "1g", env = env)
    }
    (1 to nWorkers).foreach { i =>
      awaitLog(s"$scratch/worker$i.log", "Successfully registered with master",
        workers(i - 1), s"worker $i never registered")
    }
    Cluster(master, workers.toSeq, url, scratch)
  }

  private def awaitLog(log: String, needle: String, p: Process,
      msg: String, timeoutMs: Long = 60000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while ({
      val found = Files.exists(Paths.get(log)) &&
        Files.readString(Paths.get(log)).contains(needle)
      if (!found) {
        require(p.isAlive, s"$msg (process exited; see $log)")
        require(System.currentTimeMillis() < deadline, s"$msg (see $log)")
        Thread.sleep(100)
      }
      !found
    }) ()
  }

  /** Driver session against the drill cluster: 2 executors x 8 cores
    * (one per worker), modest heaps — the geometry is the point, not
    * the size.
    */
  private def session(url: String, scratch: String): SparkSession = {
    val s = GraftSession.standalone(url, shufflePartitions = 32, Map(
      "spark.executor.memory" -> sys.env.getOrElse("GRAFT_EXECUTOR_MEM", "3g"),
      "spark.executor.cores" -> "8",
      "spark.cores.max" -> "16",
      "spark.sql.warehouse.dir" -> s"$scratch/warehouse"))
    s.sparkContext.setLogLevel("WARN")
    val deadline = System.currentTimeMillis() + 90000
    // statusTracker counts the driver too: wait for both executors.
    while (s.sparkContext.statusTracker.getExecutorInfos.length < 3) {
      require(System.currentTimeMillis() < deadline,
        "executors never came up (see worker logs)")
      Thread.sleep(200)
    }
    s
  }

  // ---------------------------------------------------------------
  // drill cases
  // ---------------------------------------------------------------

  private def stateOf(spark: SparkSession, name: String,
      dir: String): (Long, Long) =
    ServeDrill.state(SparkEntry.queries(name)(spark, dir))

  /** hasher child: identical battery on a LOCAL session → one
    * `name,count,hash` line per query (plus the scratch-corpus BM25
    * serve when a corpus is given).
    */
  private def hasherMain(outFile: String, dir: String, corpus: String,
      names: Seq[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val lines = names.map { n =>
      val (c, h) = stateOf(spark, n, dir)
      s"$n,$c,$h"
    } ++ (if (corpus == "-") Seq.empty else {
      val (c, h) = ServeDrill.state(scratchBm25(spark, corpus))
      Seq(s"__scratch_bm25__,$c,$h")
    })
    Files.writeString(Paths.get(outFile), lines.mkString("\n") + "\n")
    spark.stop()
    sys.exit(0)
  }

  /** The artifact-case serving read: indexed BM25 over the scratch
    * corpus for two terms that exist in every documents table.
    */
  private def scratchBm25(spark: SparkSession,
      corpus: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.operators.TextAnalysis.bm25ScoresForTermsIndexed(spark, corpus,
      Seq((0L, "the"), (1L, "data")).toDF("probe_id", "term"))
  }

  def run(spark: SparkSession, cluster: Cluster): Seq[CaseReport] = {
    val dir = sfDir
    val reports = scala.collection.mutable.ArrayBuffer.empty[CaseReport]
    val corpus = s"${cluster.scratch}/clusterdrill-corpus"

    // -- case 2 setup first: scratch corpus + artifact BUILT BY THE
    // CLUSTER (executor tasks write the parquet; driver commits).
    spark.read.parquet(s"$dir/documents.parquet")
      .write.parquet(s"$corpus/documents.parquet")
    graft.operators.TextAnalysis.loadOrBuildPositionalIndex(spark, corpus).count()
    graft.operators.TextAnalysis.loadOrBuildDocLengths(spark, corpus).count()
    val clusterBm25 = ServeDrill.state(scratchBm25(spark, corpus))

    // -- case 1: cluster battery states, then the local hasher.
    val clusterStates = battery.map(n => n -> stateOf(spark, n, dir))
    val hashOut = s"${cluster.scratch}/hasher.out"
    val hasher = JvmSpawn.spawn("graft.ClusterDrill",
      Seq("hasher", hashOut, dir, corpus) ++ battery,
      new java.io.File(s"${cluster.scratch}/hasher.log"), xmx = "6g")
    require(hasher.waitFor(900, java.util.concurrent.TimeUnit.SECONDS) &&
      hasher.exitValue() == 0,
      s"local hasher failed (see ${cluster.scratch}/hasher.log)")
    val local = Files.readAllLines(Paths.get(hashOut)).asScala
      .filter(_.nonEmpty)
      .map { l => val f = l.split(','); f(0) -> ((f(1).toLong, f(2).toLong)) }
      .toMap
    val mismatches = clusterStates.collect {
      case (n, st) if local.get(n).forall(_ != st) =>
        s"$n cluster=$st local=${local.get(n)}"
    }
    reports += CaseReport("parity",
      mismatches.isEmpty && clusterStates.size == battery.size,
      if (mismatches.isEmpty) s"${battery.size} queries hash-equal across " +
        "cluster and local JVMs"
      else mismatches.mkString("; "))

    // -- case 2 verdict: the hasher re-served the cluster-built
    // artifact from a separate local JVM.
    reports += CaseReport("artifact",
      local.get("__scratch_bm25__").contains(clusterBm25) && clusterBm25._1 > 0,
      s"cluster-built positional index: bm25 state=$clusterBm25, " +
        s"local re-serve=${local.get("__scratch_bm25__")}")

    // -- case 3: delta land + lease-held fold with executor processes.
    val dd = s"${cluster.scratch}/delta"
    val n = 6
    val expected = ServeDrill.prefixStates(spark, n, ServeDrill.batchA(spark, _))(n)
    (0 until n).foreach { i =>
      ServeDrill.batchA(spark, i).write.parquet(s"$dd/batch=$i")
      graft.streaming.DeltaLog.commit(spark, dd, s"batch=$i")
      if (i == 2) graft.streaming.DeltaLog.compactLive(spark, dd)(_.distinct())
    }
    graft.streaming.DeltaLog.compactLive(spark, dd)(_.distinct())
    val folded = ServeDrill.state(spark.read.parquet(
      graft.streaming.DeltaLog.liveParts(spark, dd, prefix = ""): _*))
    val leaseGone = !Files.exists(
      Paths.get(graft.streaming.DeltaLog.leasePath(dd)))
    reports += CaseReport("maintain", folded == expected && leaseGone,
      s"folded=$folded expected=$expected leaseReleased=$leaseGone")

    // -- case 4: SIGKILL one executor mid-flight; stage retry must
    // finish every iteration on the baseline hash, then a land+fold
    // must still converge.
    val flagship = battery.headOption.getOrElse("search_customer_tables")
    val baseline = clusterStates.toMap.getOrElse(flagship,
      stateOf(spark, flagship, dir))
    val iters = 4
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val states = new java.util.concurrent.atomic.AtomicReferenceArray[(Long, Long)](iters)
    val runner = new Thread(() => {
      (0 until iters).foreach { i =>
        states.set(i, stateOf(spark, flagship, dir))
        done.incrementAndGet()
      }
    }, "graft-clusterdrill-runner")
    runner.setDaemon(true)
    runner.start()
    // wait for the first iteration to finish (executors warm), then
    // kill one executor while the loop is mid-flight.
    val deadline = System.currentTimeMillis() + 300000
    while (done.get() < 1 && runner.isAlive &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    val victims = cluster.executorHandles
    val killed = victims.headOption.map { h => h.destroyForcibly(); h.pid }
    runner.join(300000)
    val allDone = done.get() == iters
    val allEqual = allDone &&
      (0 until iters).forall(i => states.get(i) == baseline)
    val victimDead = victims.headOption.exists { h =>
      val d = System.currentTimeMillis() + 10000
      while (h.isAlive && System.currentTimeMillis() < d) Thread.sleep(50)
      !h.isAlive
    }
    ServeDrill.batchA(spark, n).write.parquet(s"$dd/batch=$n")
    graft.streaming.DeltaLog.commit(spark, dd, s"batch=$n")
    graft.streaming.DeltaLog.compactLive(spark, dd)(_.distinct())
    val expected2 =
      ServeDrill.prefixStates(spark, n + 1, ServeDrill.batchA(spark, _))(n + 1)
    val folded2 = ServeDrill.state(spark.read.parquet(
      graft.streaming.DeltaLog.liveParts(spark, dd, prefix = ""): _*))
    reports += CaseReport("executor_loss",
      killed.isDefined && victimDead && allEqual && folded2 == expected2,
      s"killedPid=$killed victimDead=$victimDead iters=${done.get()}/$iters " +
        s"allEqualBaseline=$allEqual postKillFold=${folded2 == expected2}")
    reports.toSeq
  }

  // ---------------------------------------------------------------
  // soak mode (round-15 verdict #6): sustained interleaved
  // ingest/fold/serve under the standalone cluster
  // ---------------------------------------------------------------

  /** One JSON-line soak report; ok gates the exit code. */
  final case class SoakReport(iterations: Int, folds: Int, rowsLanded: Long,
      maxLiveParts: Int, maxManifestVersions: Int,
      serveP50Ms: Long, serveP95Ms: Long, firstThirdP50Ms: Long,
      lastThirdP50Ms: Long, leaseViolations: Int, strays: Int,
      valueMismatches: Int, wallSec: Long, strategy: String = "rename") {
    def latencyStable: Boolean =
      firstThirdP50Ms <= 0 || lastThirdP50Ms <= 3 * firstThirdP50Ms
    def ok: Boolean = iterations > 0 && folds > 0 && leaseViolations == 0 &&
      strays == 0 && valueMismatches == 0 && latencyStable &&
      maxManifestVersions <= 17 // Keep(16) + the in-flight newest
    // whitelist the one string field: strategy values are validated
    // upstream (strategyFor), but the report must stay well-formed
    // JSON even if the value set ever widens to something quotable.
    private def strategyJson: String = strategy.filter(c =>
      c.isLetterOrDigit || c == '_' || c == '-')
    def json: String =
      s"""{"case":"soak","ok":$ok,"strategy":"$strategyJson",""" +
        s""""iterations":$iterations,"folds":$folds,""" +
        s""""rows_landed":$rowsLanded,"max_live_parts":$maxLiveParts,""" +
        s""""max_manifest_versions":$maxManifestVersions,""" +
        s""""serve_p50_ms":$serveP50Ms,"serve_p95_ms":$serveP95Ms,""" +
        s""""first_third_p50_ms":$firstThirdP50Ms,""" +
        s""""last_third_p50_ms":$lastThirdP50Ms,""" +
        s""""lease_violations":$leaseViolations,"strays":$strays,""" +
        s""""value_mismatches":$valueMismatches,"wall_sec":$wallSec}"""
  }

  /** Sustained land/fold/serve loop against a REAL cluster session:
    * every iteration lands+commits one delta batch and serves the
    * merged state (value-checked against the prefix oracle); every
    * `foldEvery` iterations the maintenance fold runs under the lease
    * (compaction cadence). Invariants gated at the end: live part
    * count bounded by the cadence, manifest retention bounded, zero
    * lease violations, zero stray accumulation, serve latency stable
    * (last-third p50 within 3x of first-third — warm-up excluded by
    * comparing thirds, not absolute bounds), and every served state
    * equal to its oracle.
    */
  def soak(spark: SparkSession, scratch: String, minutes: Double,
      foldEvery: Int = 5, minIters: Int = 1): SoakReport = {
    val dd = s"$scratch/soak-delta"
    val deadline = System.currentTimeMillis() +
      (minutes * 60000).toLong
    val t0 = System.currentTimeMillis()
    val lat = scala.collection.mutable.ArrayBuffer.empty[Long]
    var iter = 0; var folds = 0; var leaseViolations = 0
    var maxParts = 0; var maxVersions = 0; var mismatches = 0
    var rows = 0L
    // prefix oracle: expected multiset state maintained incrementally
    // from the SAME batch generator the lands use.
    var expected: (Long, Long) = (0L, 0L)
    while (System.currentTimeMillis() < deadline || iter < minIters) {
      val b = ServeDrill.batchA(spark, iter)
      b.write.mode("overwrite").parquet(s"$dd/batch=$iter")
      graft.streaming.DeltaLog.commit(spark, dd, s"batch=$iter")
      // prefix oracle maintained incrementally (the state is additive
      // over batches — O(1) per iteration, not O(n) re-derivation)
      val bState = ServeDrill.state(ServeDrill.batchA(spark, iter))
      rows += bState._1
      expected = ServeDrill.addState(expected, bState)
      if ((iter + 1) % foldEvery == 0) {
        try {
          graft.streaming.DeltaLog.compactLive(spark, dd)(_.distinct())
          folds += 1
        } catch {
          case _: graft.streaming.ConcurrentMaintenanceException =>
            leaseViolations += 1
        }
      }
      val s0 = System.nanoTime()
      val got = ServeDrill.state(spark.read.parquet(
        graft.streaming.DeltaLog.liveParts(spark, dd, prefix = ""): _*))
      lat += (System.nanoTime() - s0) / 1000000L
      if (got != expected) mismatches += 1
      val live = graft.streaming.DeltaLog.liveParts(spark, dd, prefix = "")
      maxParts = math.max(maxParts, live.size)
      val mdir = new java.io.File(
        graft.streaming.DeltaLog.manifestDir(s"$scratch/soak-delta"))
      maxVersions = math.max(maxVersions, Option(mdir.list()).toSeq.flatten
        .count(_.startsWith("v=")))
      iter += 1
    }
    // stray audit: no lease/tomb/tmp residue once the loop is done
    val mdir = new java.io.File(graft.streaming.DeltaLog.manifestDir(dd))
    val strays = Option(mdir.list()).toSeq.flatten.count(n =>
      n.startsWith(".lease-tmp-") || n.startsWith(".beat-tmp-") ||
        n.startsWith(".tmp-") || n == "_lease")
    def pct(xs: Seq[Long], p: Double): Long =
      if (xs.isEmpty) 0L
      else xs.sorted.apply(math.min(xs.size - 1, (xs.size * p).toInt))
    val third = math.max(1, lat.size / 3)
    SoakReport(iter, folds, rows, maxParts, maxVersions,
      pct(lat.toSeq, 0.5), pct(lat.toSeq, 0.95),
      pct(lat.take(third).toSeq, 0.5), pct(lat.takeRight(third).toSeq, 0.5),
      leaseViolations, strays, mismatches,
      (System.currentTimeMillis() - t0) / 1000,
      strategy = spark.sparkContext.hadoopConfiguration
        .get("graft.commit.strategy.file", "rename"))
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("hasher")) {
      hasherMain(args(1), args(2), args(3), args.drop(4).toSeq)
      return
    }
    if (args.headOption.contains("soak")) {
      // sustained-soak mode: `soak [minutes] [foldEvery] [minIters]`
      // (default 30 min, fold every 5 lands) on a real standalone
      // cluster; exit 0 iff every soak invariant held.
      val minutes = args.lift(1).map(_.toDouble).getOrElse(30.0)
      val foldEvery = args.lift(2).map(_.toInt).getOrElse(5)
      val minIters = args.lift(3).map(_.toInt).getOrElse(1)
      val base = sys.env.get("GRAFT_CLUSTERDRILL_BASE")
        .getOrElse(Files.createTempDirectory("graft-clusterdrill").toString)
      val cluster = standUp(base)
      var ok = false
      try {
        val spark = session(cluster.url, base)
        // GRAFT_SOAK_COMMIT=cas runs the SAME sustained loop on the
        // object-store commit path: manifest versions via conditional
        // create + #committed trailer, fold dirs via claim+stamp-last,
        // lease release via incarnation tombstones, heartbeat as an
        // overwrite PUT. Every publish point in the loop is
        // driver-side, so the driver's hadoopConfiguration governs.
        sys.env.get("GRAFT_SOAK_COMMIT").foreach { s =>
          spark.sparkContext.hadoopConfiguration
            .set("graft.commit.strategy.file", s)
        }
        val report = soak(spark, base, minutes, foldEvery, minIters)
        println(report.json)
        ok = report.ok
        spark.stop()
      } finally cluster.tearDown()
      if (!ok) sys.exit(1)
      return
    }
    val base = sys.env.get("GRAFT_CLUSTERDRILL_BASE")
      .getOrElse(Files.createTempDirectory("graft-clusterdrill").toString)
    val keep = sys.env.contains("GRAFT_CLUSTERDRILL_BASE")
    if (args.headOption.contains("up")) {
      // dev mode: park the cluster for external SPARK_GRAFT_MASTER runs.
      val c = standUp(base)
      println(s"""{"master":"${c.url}","scratch":"$base"}""")
      Files.writeString(Paths.get(s"$base/master.url"), c.url)
      try while (!Files.exists(Paths.get(s"$base/stop"))) Thread.sleep(500)
      finally c.tearDown()
      return
    }
    var failed = false
    val cluster = standUp(base)
    var spark: SparkSession = null
    try {
      spark = session(cluster.url, base)
      val reports = run(spark, cluster)
      reports.foreach(r => println(r.json))
      failed = !reports.forall(_.ok)
    } catch {
      case e: Throwable =>
        println(s"""{"case":"drill","ok":false,"detail":"${
          String.valueOf(e.getMessage).take(300).replace("\"", "'")}"}""")
        failed = true
    } finally {
      try if (spark != null) spark.stop()
      catch { case scala.util.control.NonFatal(_) => () }
      cluster.tearDown()
      // scratch-corpus artifacts key on the corpus path but live under
      // the INDEX root (ServeDrill's contract) — sweep both trees.
      val idxRoot = new java.io.File(sys.env.getOrElse("GRAFT_INDEX_DIR",
        s"${sys.props("user.dir")}/target/graft-index"))
      val sweeps = Option(idxRoot.listFiles()).toSeq.flatten
        .filter(_.getName.startsWith("clusterdrill-corpus")).map(_.toPath) ++
        (if (keep) Seq.empty else Seq(Paths.get(base)))
      sweeps.foreach { p =>
        try {
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(x => Files.deleteIfExists(x))
          finally walk.close()
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    if (failed) sys.exit(1)
  }
}
