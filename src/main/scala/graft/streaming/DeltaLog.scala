package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** A second maintainer is running against the same delta dir — the
  * one-compactor-per-dir contract would be violated, so the late
  * arrival REFUSES loudly instead of interleaving fold decisions
  * with the holder's deferred deletes (round-12 verdict #3: the
  * no-overwrite manifest rename is collision DETECTION, not mutual
  * exclusion).
  */
final class ConcurrentMaintenanceException(msg: String)
  extends RuntimeException(msg)

/** ONE transaction-log-style manifest convention for every delta
  * family (index postings, positional index, source histograms, term
  * sketch, vector deltas — five writers, two compactors, round-10
  * verdict #4). Before this, each family hand-rolled directory
  * listing + `_SUCCESS` probing + replay rules, and the round-9
  * review fixed two listing races case-by-case (one shared listing
  * for the live IVF frames; deferred fold deletes); the manifest
  * removes the race CLASS: readers resolve ONE file to a consistent
  * part set, so a racing write or fold can never half-appear.
  *
  * Layout: `<deltaDir>/_manifest/v=<version>` — newline-separated
  * part NAMES (`batch=<id>`, `compacted=<id>`) plus a `#committed`
  * completeness trailer, highest trailered version wins, published
  * through the [[graft.sources.Commit]] strategy seam (round-15
  * verdict #1): temp-file + atomic no-overwrite rename on POSIX/HDFS;
  * conditional create + read-back verify on object stores, where
  * rename is a non-atomic overwriting copy+delete and could never
  * arbitrate concurrent publishers.
  *
  * Protocol (single maintenance writer + at most one compactor per
  * delta dir — the streaming checkpoint already enforces the former;
  * concurrent READERS are unrestricted):
  *  - writers land the part (idempotent batch-keyed overwrite, as
  *    before), THEN [[commit]] it: new version = current set ∪ the
  *    part. A crash between the two leaves an unreferenced dir the
  *    checkpoint replays in full — readers never saw it.
  *  - readers call [[liveParts]]: the latest manifest's names, one
  *    file read, no per-part `_SUCCESS` stat. A dir with no manifest
  *    yet (legacy layout, hand-landed fixtures) falls back to the
  *    listing — `_SUCCESS`-gated (an uncommitted partial is invisible
  *    on this path too, round-10 verdict #3) and id-parse-tolerant (a
  *    stray `batch=tmp` is skipped, not a NumberFormatException —
  *    round-10 ADVICE).
  *  - compactors [[replace]] the folded parts with their
  *    consolidation in one published version (re-resolving the
  *    current set first, so batches landed during the fold survive),
  *    and physically delete superseded dirs only on a LATER
  *    invocation ([[unreferencedParts]]) — readers that resolved the
  *    previous version keep their files for a full compaction
  *    interval.
  *
  * Old manifest versions are retained (bounded: [[Keep]] newest) so
  * a reader mid-resolve never loses the file under it.
  */
object DeltaLog {

  /** Manifest versions retained beyond the newest. */
  private val Keep = 16

  def manifestDir(deltaDir: String): String = s"$deltaDir/_manifest"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `<prefix>=<long>` part-name id, None for strays (`batch=tmp`,
    * editor droppings) — strays are skipped everywhere, never thrown
    * on (round-10 ADVICE).
    */
  private[graft] def idOf(name: String): Option[Long] = {
    val i = name.indexOf('=')
    if (i < 0) None
    else scala.util.Try(name.substring(i + 1).toLong).toOption
  }

  /** Versions = LIST for the floor, then PROBE FORWARD by key
    * (round-17, the visibility-lag finding): an eventually-consistent
    * store may serve a stale LIST that hides the newest
    * conditionally-created manifest — a reader trusting the listing
    * would serve stale state, and (worse) a committer would UNION
    * AGAINST A STALE PART SET and silently drop a just-committed
    * part. Point reads of known keys are the strong primitive, and
    * version names are dense (`v=0..max`, conditional create assigns
    * max+1, retention prunes only the oldest), so probing `v=max+1,
    * max+2, …` until the first miss recovers everything a lagged
    * LIST hides — at ONE extra point read per resolution in the
    * steady state. (A 404-caching store can still hide a probed
    * version for its cache window — bounded staleness for readers;
    * WRITERS stay correct because [[publish]] advances past create
    * conflicts without re-probing.)
    */
  private def versions(fs: FileSystem, mdir: Path): Seq[(Long, Path)] = {
    val listed =
      if (!fs.exists(mdir)) Seq.empty[(Long, Path)]
      else fs.listStatus(mdir).toIndexedSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("v=")) idOf(n).map(_ -> s.getPath) else None
      }.sortBy(_._1)
    var v = listed.lastOption.map(_._1 + 1).getOrElse(0L)
    val probed = Seq.newBuilder[(Long, Path)]
    var p = new Path(mdir, s"v=$v")
    while (fs.exists(p)) {
      probed += (v -> p)
      v += 1
      p = new Path(mdir, s"v=$v")
    }
    listed ++ probed.result()
  }

  /** Completeness trailer (round-16, the [[graft.sources.Commit]]
    * seam): manifests are committed as single objects under the cas
    * strategy, where — unlike the rename commit — a non-object-store
    * deployment could expose a file mid-create. The trailer makes
    * completeness CHECKABLE: a reader that catches an in-flight
    * manifest falls back to the newest trailered version instead of
    * serving a torn part list. (Real object stores PUT atomically, so
    * the trailer never actually gates there; it is belt-and-suspenders
    * for cas-on-POSIX test rigs and misconfigured deployments.)
    */
  private val CommittedTrailer = "#committed"

  private def readManifestRaw(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Part names of a raw manifest read (comment/trailer lines out). */
  private def partsOf(lines: Seq[String]): Seq[String] =
    lines.filterNot(_.startsWith("#"))

  /** The current committed part names, or None when the dir carries
    * no manifest (legacy / fixture layout — callers fall back to the
    * gated listing). Prefers the newest version carrying the
    * completeness trailer; a dir whose versions ALL lack it was
    * written entirely by pre-trailer code (rename-committed, complete
    * by construction) and its newest version is served as-is.
    */
  def currentParts(spark: SparkSession, deltaDir: String): Option[Seq[String]] = {
    val mdir = new Path(manifestDir(deltaDir))
    val fs = fsOf(spark, mdir)
    // newest-first walk, skipping versions pruned (or still in
    // flight) between the listing and the read; stops at the first
    // trailered manifest — one read in the steady state.
    val reads = versions(fs, mdir).reverse.iterator.flatMap { case (_, p) =>
      try Some(readManifestRaw(fs, p))
      catch { case _: java.io.IOException => None }
    }
    var first: Option[Seq[String]] = None
    var committed: Option[Seq[String]] = None
    while (reads.hasNext && committed.isEmpty) {
      val lines = reads.next()
      if (first.isEmpty) first = Some(lines)
      if (lines.lastOption.contains(CommittedTrailer)) committed = Some(lines)
    }
    committed.orElse(first).map(partsOf)
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The `_SUCCESS`-gated, stray-tolerant directory listing — the
    * pre-manifest convention, kept as the no-manifest fallback and as
    * the seed a first [[commit]]/[[seedIfAbsent]] starts from (parts
    * landed before the manifest existed must not be orphaned).
    *
    * `_SUCCESS` dependency (round-11 ADVICE): this fallback requires
    * the committer's marker, where the pre-round-10 family defaults
    * did not all — a deployment writing legacy parts with
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` would
    * silently serve none of them. Such dirs (parquet present, no
    * marker) are WARN-logged here rather than silently skipped; the
    * fix is one [[commit]]/[[seedIfAbsent]] per part, after which the
    * manifest is authoritative and the marker is never consulted.
    */
  private def gatedListing(spark: SparkSession, deltaDir: String): Seq[String] = {
    val p = new Path(deltaDir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else {
      val (gated, skipped) = fs.listStatus(p).toIndexedSeq.filter { s =>
        s.isDirectory && idOf(s.getPath.getName).isDefined &&
          !s.getPath.getName.startsWith("_")
      }.partition(s => fs.isFile(new Path(s.getPath, "_SUCCESS")))
      skipped.filter(s => fs.listStatus(s.getPath)
          .exists(_.getPath.getName.endsWith(".parquet")))
        .foreach(s => log.warn(
          s"delta part ${s.getPath} holds parquet files but no _SUCCESS marker " +
            "— invisible to the legacy fallback listing; commit it to the " +
            "manifest (DeltaLog.commit) or re-land it with the marker"))
      gated.map(_.getPath.getName)
    }
  }

  /** Serializes every read-modify-write below within this JVM, PER
    * DELTA DIR (round-11 ADVICE: a JVM-global mutex made manifest
    * publishes of unrelated families serialize against each other).
    * The protocol assumes ONE maintenance driver per delta dir (the
    * streaming checkpoint already implies it for writers), but
    * within that driver a live stream's [[commit]] CAN race the
    * compactor's [[replace]] — and two publishes computing the same
    * next version would have the later rename overwrite the earlier
    * one on a POSIX rename, silently un-committing a landed batch
    * (round-10 self-review; the loss the listing convention could
    * not have). Cross-JVM concurrent maintenance of one delta dir is
    * now ENFORCED, not just documented: [[compactLive]] holds the
    * dir-level [[leasePath]] lease (round-13), and [[publish]]'s
    * no-overwrite rename remains the last-line collision detector
    * beneath it.
    */
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  private def lockFor(deltaDir: String): Object =
    publishLocks.computeIfAbsent(
      new Path(deltaDir).toUri.normalize.toString, _ => new Object)

  /** Atomically publish `parts` as the next manifest version; prunes
    * versions beyond the retention window. Call under
    * [[lockFor]] when the parts derive from a read of the
    * current manifest.
    */
  private def publish(spark: SparkSession, deltaDir: String,
      parts: Seq[String]): Unit = {
    val mdir = new Path(manifestDir(deltaDir))
    val fs = fsOf(spark, mdir)
    fs.mkdirs(mdir)
    val sorted = parts.distinct.sortBy(n => (idOf(n).getOrElse(Long.MaxValue), n))
    // single-winner commit through the strategy seam (round-15 verdict
    // #1, [[graft.sources.Commit]]): temp + no-overwrite rename on
    // POSIX/HDFS (the pre-round-16 protocol, where a cross-JVM
    // concurrent publisher surfaces as a lost rename — round-11
    // ADVICE); conditional create + read-back verify on object stores,
    // where rename is a non-atomic overwriting copy+delete and could
    // never arbitrate. The content ends with the completeness trailer
    // so a reader catching a non-atomically-created file falls back a
    // version instead of serving a torn part list.
    val content = (sorted.mkString("\n") + "\n" + CommittedTrailer + "\n")
      .getBytes("UTF-8")
    val conf = spark.sparkContext.hadoopConfiguration
    var attempt = 0
    var done = false
    // On conflict, ADVANCE monotonically instead of re-resolving: the
    // failed conditional create PROVES v=next exists, which a stale
    // LIST (or a 404-caching probe) might keep denying — re-deriving
    // `next` from such a view spins on the same number until the
    // attempt bound trips (round-17 visibility-lag finding). Every
    // retry now makes global progress, so the bound only trips under
    // true sustained contention.
    var next = versions(fs, mdir).lastOption.map(_._1 + 1).getOrElse(0L)
    while (!done) {
      done = graft.sources.Commit.createExclusive(
        conf, new Path(mdir, s"v=$next"), content)
      if (!done) {
        next += 1
        attempt += 1
        require(attempt < 8, s"manifest publish contended 8x at $deltaDir")
      }
    }
    val vs = versions(fs, mdir)
    vs.dropRight(Keep).foreach { case (_, p) => fs.delete(p, true) }
  }

  /** Writer-side commit: make `partName` visible. Set-union with the
    * current set (seeded from the gated listing on first commit), so
    * replay re-commits are idempotent.
    */
  def commit(spark: SparkSession, deltaDir: String, partName: String): Unit =
    lockFor(deltaDir).synchronized {
      val manifest = currentParts(spark, deltaDir)
      val cur = manifest.getOrElse(gatedListing(spark, deltaDir))
      if (!cur.contains(partName)) publish(spark, deltaDir, cur :+ partName)
      else if (manifest.isEmpty)
        publish(spark, deltaDir, cur) // first commit over a legacy dir
    }

  /** Ensure a manifest exists, seeding it from the gated listing —
    * the migration step a compactor runs before folding a legacy dir.
    */
  def seedIfAbsent(spark: SparkSession, deltaDir: String): Seq[String] =
    lockFor(deltaDir).synchronized {
      currentParts(spark, deltaDir).getOrElse {
        val seed = gatedListing(spark, deltaDir)
        publish(spark, deltaDir, seed)
        seed
      }
    }

  /** Compactor-side swap: one published version drops `removed` and
    * adds `added`. The current set is RE-resolved here (not passed
    * in) so parts committed while the fold ran survive the swap.
    */
  def replace(spark: SparkSession, deltaDir: String,
      removed: Set[String], added: Seq[String]): Unit =
    lockFor(deltaDir).synchronized {
      val cur = currentParts(spark, deltaDir)
        .getOrElse(gatedListing(spark, deltaDir))
      publish(spark, deltaDir, cur.filterNot(removed) ++ added)
    }

  /** READER resolution: full paths of the committed parts whose name
    * starts with `prefix` — the latest manifest when one exists, else
    * the gated listing.
    */
  def liveParts(spark: SparkSession, deltaDir: String,
      prefix: String = "batch="): Seq[String] =
    currentParts(spark, deltaDir)
      .getOrElse(gatedListing(spark, deltaDir))
      .filter(_.startsWith(prefix))
      .map(n => s"$deltaDir/$n")

  // ---------------------------------------------------------------
  // dir-level maintenance lease (round-12 verdict #3): the JVM-wide
  // publish mutex protects one process; two JVMs compacting the same
  // dir relied on the no-overwrite rename to fail loudly — which is
  // collision detection at the PUBLISH, not mutual exclusion over
  // the whole fold: a second maintainer could interleave its fold
  // decisions with the first's deferred deletes. The lease makes the
  // contract enforced: [[compactLive]] acquires before reading the
  // manifest and releases after the swap; a concurrent holder means
  // a loud [[ConcurrentMaintenanceException]], never interleaving.
  // ---------------------------------------------------------------

  /** This process's lease identity. */
  private val OwnerId =
    s"${java.lang.ProcessHandle.current.pid}@${java.util.UUID.randomUUID}"

  /** Stale-lease takeover bound: a holder that has not re-acquired
    * within the TTL is presumed crashed (a fold is seconds; 15 min is
    * orders of magnitude past any healthy hold). Env-overridable for
    * unusual deployments.
    *
    * CLOCK DOMAINS (round-14 verdict #7, closing the round-13
    * caveat): staleness is judged in the MAINTAINER clock domain —
    * the holder writes its own `System.currentTimeMillis` into the
    * lease payload at acquire (`ts=` line) and into the `_lease.beat`
    * sidecar on every heartbeat, and a waiter compares those stamps
    * against ITS clock: maintainer processes are NTP-synced to each
    * other even when the FS serving the delta dir (NFS, an object
    * store) stamps mtimes from a skewed server clock. The FS mtime
    * remains the FALLBACK for legacy leases without a payload stamp.
    * Remaining assumption: maintainers share an NTP domain — the
    * 15-minute default dwarfs realistic drift, and a takeover of a
    * still-healthy holder is additionally caught by the manifest's
    * no-overwrite rename, the last-line collision detector beneath
    * the lease.
    */
  private[graft] val LeaseTtlMs: Long =
    sys.env.get("GRAFT_MAINT_LEASE_TTL_MS").map(_.toLong).getOrElse(900000L)

  def leasePath(deltaDir: String): String = s"${manifestDir(deltaDir)}/_lease"

  /** Heartbeat sidecar: `owner\nts=<holder clock millis>`, rewritten
    * atomically each beat. Kept separate from the lease file so
    * refreshing freshness never rewrites (and can never clobber) the
    * mutual-exclusion token itself.
    */
  def leaseBeatPath(deltaDir: String): String =
    s"${manifestDir(deltaDir)}/_lease.beat"

  /** First line of a lease/beat payload: the owner id. */
  private[graft] def leaseOwner(content: String): String =
    content.linesIterator.nextOption().getOrElse("")

  /** The holder-clock stamp (`ts=` line), absent on legacy leases. */
  private[graft] def leaseTs(content: String): Option[Long] =
    content.linesIterator.drop(1).find(_.startsWith("ts="))
      .flatMap(l => scala.util.Try(l.stripPrefix("ts=").trim.toLong).toOption)

  private def leasePayload(owner: String): String =
    s"$owner\nts=${System.currentTimeMillis()}"

  /** Identity of ONE lease incarnation — content hash + file mtime.
    * Both the stale-takeover branch and the cas release path claim the
    * right to remove an incarnation through a no-overwrite create of
    * `.lease-tomb-<ident>`: SHARING the ident is what serializes a
    * release against a concurrent TTL takeover of the same lease
    * (exactly one of them wins the tombstone and deletes).
    */
  private[graft] def incarnationIdent(content: String, mtime: Long): String =
    java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(content)) + "-" + mtime

  /** Age of the lease incarnation `(content, mtime)` in the waiter's
    * clock, preferring maintainer-domain signals: the FRESHEST of the
    * payload stamp and a beat-sidecar stamp whose owner matches (a
    * stale beat from a previous hold can only be OLDER than the
    * current payload and so never wins); the FS mtime only when no
    * stamp parses (legacy lease). Future-dated stamps clamp to age 0
    * — never stale.
    */
  private def leaseAge(fs: FileSystem, mdir: Path, content: String,
      mtime: Long): Long = {
    val now = System.currentTimeMillis()
    val beatTs =
      try {
        val bp = new Path(mdir, "_lease.beat")
        val in = fs.open(bp)
        val b = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        if (leaseOwner(b) == leaseOwner(content)) leaseTs(b) else None
      } catch { case _: java.io.IOException => None }
    val stamps = Seq(leaseTs(content), beatTs).flatten
    if (stamps.isEmpty) now - mtime
    else math.max(0L, now - stamps.max)
  }

  /** Test/ops helper: move EVERY staleness signal of the current
    * lease (payload stamp, beat stamp, file mtime) back by `byMs`,
    * simulating a holder that crashed that long ago.
    */
  private[graft] def ageLease(conf: org.apache.hadoop.conf.Configuration,
      deltaDir: String, byMs: Long): Unit = {
    val then_ = System.currentTimeMillis() - byMs
    def rewind(p: Path): Unit = {
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) {
        val in = fs.open(p)
        val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val aged =
          if (leaseTs(content).isDefined) s"${leaseOwner(content)}\nts=$then_"
          else content
        val out = fs.create(p, true)
        try out.write(aged.getBytes("UTF-8")) finally out.close()
        fs.setTimes(p, then_, -1)
      }
    }
    rewind(new Path(leasePath(deltaDir)))
    rewind(new Path(leaseBeatPath(deltaDir)))
  }

  /** Acquire the dir-level maintenance lease via no-overwrite rename
    * (the manifest-publish primitive — atomic create on local FS and
    * HDFS). Held lease: [[ConcurrentMaintenanceException]]. A lease
    * older than `ttlMs` (by FS modification time) is taken over —
    * crashed maintainers must not freeze a family forever. Takes a
    * bare Hadoop Configuration so a probe process needs no Spark.
    */
  private[graft] def acquireLease(conf: org.apache.hadoop.conf.Configuration,
      deltaDir: String, ttlMs: Long = LeaseTtlMs,
      owner: String = OwnerId): Unit = {
    val lease = new Path(leasePath(deltaDir))
    val mdir = lease.getParent
    val fs = mdir.getFileSystem(conf)
    fs.mkdirs(mdir)
    // single-winner create through the strategy seam (round-15 verdict
    // #1): temp + Rename.NONE on POSIX/HDFS; conditional create +
    // read-back verify on object stores. Lease/tombstone payloads are
    // caller-unique (owner id + holder-clock stamp), which is what the
    // cas read-back discriminates on.
    def atomicCreate(target: Path, content: String): Boolean =
      graft.sources.Commit.createExclusive(conf, target,
        content.getBytes("UTF-8"), tmpPrefix = ".lease-tmp-")
    // GC tombstones older than the TTL: a takeover winner that crashed
    // between claiming its tombstone and deleting the stale lease must
    // not freeze the dir forever — once the tombstone itself is stale,
    // the next waiter may re-claim the same identity and finish the
    // recovery. (Completed takeovers leave their tombstone in place ON
    // PURPOSE: it is the single-winner token for that lease
    // incarnation; deleting it early would let the identity be claimed
    // twice. Manifest resolution only matches `v=` names, so
    // tombstones are invisible to readers.) `.beat-tmp-*` strays ride
    // along: a holder that crashes between creating a beat temp and
    // renaming it onto the sidecar leaves one behind per crash —
    // harmless to correctness (unique names, never read) but
    // unbounded over enough crashes without this sweep.
    def gcTombstones(): Unit =
      try fs.listStatus(mdir).toIndexedSeq
        .filter { s =>
          val n = s.getPath.getName
          (n.startsWith(".lease-tomb-") || n.startsWith(".beat-tmp-")) &&
            System.currentTimeMillis() - s.getModificationTime > ttlMs
        }
        .foreach(s => try fs.delete(s.getPath, false)
          catch { case _: java.io.IOException => () })
      catch { case _: java.io.FileNotFoundException => () }
    var takeovers = 0
    var spins = 0
    gcTombstones() // bound accumulation: one tombstone per takeover
    while (true) {
      if (atomicCreate(lease, leasePayload(owner))) return
      val holder =
        try {
          // (owner, mtime) must describe ONE lease incarnation: stat,
          // read, then re-stat and discard unless the mtime held — a
          // stat from incarnation X paired with an owner read from a
          // successor Y would forge a never-claimed tombstone ident
          // whose atomicCreate trivially wins, and the follow-up
          // delete would kill Y's LIVE lease (round-14 review #1: the
          // deschedule-between-two-FS-calls race during a waiter
          // stampede). A heartbeat touch between the stats also
          // retries — one wasted loop, never a wrong identity.
          val st = fs.getFileStatus(lease)
          val in = fs.open(lease)
          val who = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
          val st2 = fs.getFileStatus(lease)
          if (st2.getModificationTime != st.getModificationTime) None
          else Some((who, leaseAge(fs, mdir, who, st.getModificationTime),
            st.getModificationTime))
        } catch { // released between rename and stat: retry the create
          case _: java.io.FileNotFoundException => None
        }
      holder match {
        case None => ()
        case Some((who, age, mtime)) if age > ttlMs =>
          // Stale: presumed crashed. SINGLE-WINNER takeover (round-13
          // ADVICE, medium): with unconditional delete, two waiters
          // that both observed the expired lease each remove it — the
          // slower waiter deletes the faster waiter's freshly-CREATED
          // lease and both then hold the dir. Worse, ANY act-on-path
          // step (delete or rename alike) can hit a lease that changed
          // since it was judged stale. So the right to delete a given
          // lease INCARNATION — identified by (holder id, mtime) — is
          // claimed through a no-overwrite create of a tombstone NAMED
          // by that identity: exactly one waiter per incarnation wins
          // the tombstone, and only the winner deletes. A loser knows
          // the incarnation is being handled and re-reads; if it then
          // sees the winner's fresh lease it gets the normal refusal.
          // Residual (documented frozen-JVM caveat): a holder judged
          // stale that is actually alive-and-frozen can release and a
          // fresh lease appear between the winner's claim and delete;
          // the manifest's no-overwrite rename stays the last-line
          // collision detector.
          val tomb = new Path(mdir, s".lease-tomb-${incarnationIdent(who, mtime)}")
          if (atomicCreate(tomb, s"takeover of ${leaseOwner(who)} by $owner")) {
            takeovers += 1
            require(takeovers <= 3,
              s"lease takeover livelock at $deltaDir (holder ${leaseOwner(who)})")
            try fs.delete(lease, false)
            catch { case _: java.io.FileNotFoundException => () }
          } else { // this incarnation's takeover belongs to another
            // waiter (or to a crashed one — GC below unfreezes that):
            // brief backoff, then re-read the state.
            spins += 1
            if (spins > 100) {
              // the frozen-by-crashed-takeover state, made actionable
              // (round-14 ADVICE): a winner that died between claiming
              // its tombstone and deleting the stale lease leaves every
              // waiter spinning here until the TOMBSTONE ages past the
              // TTL — name the tombstone and its age so an operator can
              // tell this from a live-holder refusal.
              val tombAge =
                try System.currentTimeMillis() -
                  fs.getFileStatus(tomb).getModificationTime
                catch { case _: java.io.IOException => -1L }
              throw new ConcurrentMaintenanceException(
                s"lease takeover spin bound exceeded at $deltaDir (stale " +
                  s"holder ${leaseOwner(who)}): takeover tombstone $tomb " +
                  s"(age ${tombAge}ms) is claimed but the stale lease was " +
                  "never removed — its claimant likely crashed mid-takeover; " +
                  s"the tombstone expires ${ttlMs}ms after creation " +
                  "(waiters then re-claim), or remove it manually")
            }
            gcTombstones()
            Thread.sleep(20)
          }
        case Some((who, age, _)) =>
          throw new ConcurrentMaintenanceException(
            s"delta dir $deltaDir is being maintained by ${leaseOwner(who)} " +
              s"(lease age ${age}ms < ttl ${ttlMs}ms) — one maintainer " +
              "per delta dir; if the holder crashed, the lease expires " +
              s"after the TTL or can be removed at ${leasePath(deltaDir)}")
      }
    }
  }

  /** Release the lease if THIS owner still holds it (a takeover may
    * have transferred it — never delete another maintainer's lease).
    *
    * Removal is rename-to-tombstone-then-verify, not read-then-delete
    * (round-13 ADVICE): with read-then-delete, a TTL takeover landing
    * BETWEEN the read (sees my owner id) and the delete — only
    * possible if this JVM froze past the TTL right there — deletes
    * the successor's lease. The rename is atomic, so what lands in
    * the tombstone is inspected AFTER it is exclusively ours: if it
    * is ours, delete it (released); if a successor's, rename it back.
    * Residual window: between stealing the successor's lease and
    * restoring it, a third maintainer can acquire — the same
    * frozen-then-resumed-holder caveat as the heartbeat, and the
    * manifest's no-overwrite rename remains the last-line detector.
    */
  private[graft] def releaseLease(conf: org.apache.hadoop.conf.Configuration,
      deltaDir: String, owner: String = OwnerId,
      precheck: Boolean = true): Unit = {
    val lease = new Path(leasePath(deltaDir))
    val fs = lease.getFileSystem(conf)
    // cas strategy (object stores, [[graft.sources.Commit]]): there is
    // no atomic claim-by-move, so the release claims the right to
    // remove THIS incarnation the same way the TTL-takeover branch
    // does — a conditional create of `.lease-tomb-<incarnationIdent>`.
    // Sharing the ident serializes release against a concurrent
    // takeover: exactly one wins the tombstone; the loser stands down
    // (the winner removes the lease either way). The rename path's
    // TOCTOU (`precheck` knob) does not exist here — the ownership
    // read is load-bearing and the ident claim closes the gap behind
    // it. Residual: the mtime read and the claim are two steps; a
    // beat bumping the mtime between them would split idents — but a
    // beating holder is by definition not stale, so no takeover
    // contends then (the frozen-JVM caveat, unchanged).
    if (graft.sources.Commit.strategyFor(conf, lease.toUri) ==
        graft.sources.Commit.Cas) {
      try {
        val st = fs.getFileStatus(lease)
        val in = fs.open(lease)
        val who = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        if (leaseOwner(who) == owner) {
          val tomb = new Path(lease.getParent,
            s".lease-tomb-${incarnationIdent(who, st.getModificationTime)}")
          if (graft.sources.Commit.createExclusive(conf, tomb,
              s"release of $owner".getBytes("UTF-8"),
              tmpPrefix = ".lease-tmp-")) {
            try fs.delete(lease, false)
            catch { case _: java.io.FileNotFoundException => () }
            try fs.delete(new Path(leaseBeatPath(deltaDir)), false)
            catch { case _: java.io.IOException => () }
          }
        }
      } catch { case _: java.io.FileNotFoundException => () }
      return
    }
    val fctx = org.apache.hadoop.fs.FileContext.getFileContext(
      lease.getParent.toUri, conf)
    try {
      // cheap pre-check: after a takeover the common case is "not
      // mine anymore" — return without touching the successor's file.
      // `precheck = false` (spec-only) jumps straight to the rename,
      // simulating a takeover landing INSIDE the read/rename gap so
      // the restore branch below is exercised.
      if (precheck) {
        val in = fs.open(lease)
        val who = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        if (leaseOwner(who) != owner) return
      }
      val tomb = new Path(lease.getParent,
        s".lease-tomb-${java.util.UUID.randomUUID}")
      fctx.rename(lease, tomb, org.apache.hadoop.fs.Options.Rename.NONE)
      val in2 = fs.open(tomb)
      val got = try scala.io.Source.fromInputStream(in2, "UTF-8").mkString
      finally in2.close()
      if (leaseOwner(got) == owner) {
        fs.delete(tomb, false)
        // the beat sidecar is freshness metadata for THIS hold; a
        // stale one is harmless (older than any future payload) but
        // tidy it while we are the verified owner.
        try fs.delete(new Path(leaseBeatPath(deltaDir)), false)
        catch { case _: java.io.IOException => () }
      } else { // we renamed a successor's lease (takeover raced the
        // pre-check): give it back. A collision here means a third
        // party acquired in the gap — drop the tombstone; the
        // displaced successor's heartbeat observes the foreign owner
        // and stands down — but put the event ON RECORD (round-14
        // ADVICE: a later torn-maintenance investigation needs the
        // moment the lease was dropped, not just the eventual
        // stand-down).
        try fctx.rename(tomb, lease, org.apache.hadoop.fs.Options.Rename.NONE)
        catch {
          case _: java.io.IOException =>
            val third =
              try {
                val in3 = fs.open(lease)
                try leaseOwner(
                  scala.io.Source.fromInputStream(in3, "UTF-8").mkString)
                finally in3.close()
              } catch { case _: java.io.IOException => "<unreadable>" }
            System.err.println(
              s"[graft] WARNING: lease restore collision at $deltaDir — " +
                s"displaced successor '${leaseOwner(got)}' lost its lease " +
                s"while '$third' acquired; the successor's next heartbeat " +
                "stands down")
            fs.delete(tomb, false)
        }
      }
    } catch { case _: java.io.FileNotFoundException => () }
  }

  /** Run `body` under the dir's maintenance lease, with a HEARTBEAT:
    * a daemon thread refreshes freshness every TTL/3 while held —
    * an atomic rewrite of the `_lease.beat` sidecar with the holder's
    * clock (the maintainer-domain signal [[leaseAge]] prefers) plus
    * the legacy mtime touch — so a fold that legitimately runs longer
    * than the TTL (the "a fold is seconds" rationale does not hold at
    * 10^12-doc delta dirs) is not silently stolen by the
    * stale-takeover branch (round-13 review). The beat verifies
    * ownership before each touch — after a takeover (only possible if
    * this JVM was frozen past the TTL) it must not refresh the
    * successor's lease; a frozen-then-resumed holder's in-flight
    * publish is still caught by the manifest's no-overwrite rename,
    * the last-line collision detector beneath the lease. The sidecar
    * being separate means a mis-timed beat can only ever defer a
    * takeover by one beat (the round-13 setTimes caveat, unchanged) —
    * it can never replace the lease token itself.
    *
    * The beat's check-then-setTimes has a read/act gap (round-13
    * ADVICE): a takeover landing between them gets its lease mtime
    * refreshed by the displaced holder — once, since the NEXT beat
    * reads the foreign owner and stands down. The effect is strictly
    * conservative: a fresher mtime only defers a future staleness
    * takeover of the live successor by at most one beat; it can never
    * revive this holder or delete anything. Accepted and documented
    * rather than locked, matching the frozen-JVM caveat above.
    */
  def withMaintenanceLease[T](spark: SparkSession, deltaDir: String,
      ttlMs: Long = LeaseTtlMs)(
      body: => T): T = {
    val conf = spark.sparkContext.hadoopConfiguration
    acquireLease(conf, deltaDir, ttlMs)
    val lease = new Path(leasePath(deltaDir))
    val fs = lease.getFileSystem(conf)
    val beatPath = new Path(leaseBeatPath(deltaDir))
    val beat = new Thread(() => {
      try {
        var mine = true
        while (mine && !Thread.interrupted()) {
          Thread.sleep(math.max(ttlMs / 3, 1000L))
          try {
            val in = fs.open(lease)
            val who = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
            if (leaseOwner(who) == OwnerId) {
              // maintainer-domain freshness: atomic overwrite of the
              // sidecar (never the lease file itself) — temp + rename
              // on POSIX/HDFS, a plain overwrite PUT on object stores
              // ([[graft.sources.Commit.overwriteSmall]]; a torn
              // sidecar read merely defers to the lease payload stamp).
              graft.sources.Commit.overwriteSmall(conf, beatPath,
                leasePayload(OwnerId).getBytes("UTF-8"),
                tmpPrefix = ".beat-tmp-")
              // legacy-fallback freshness for mtime-only observers;
              // stores without setTimes (object stores) just skip it —
              // the beat sidecar is the signal there.
              try fs.setTimes(lease, System.currentTimeMillis(), -1)
              catch { case _: UnsupportedOperationException => () }
            } else mine = false
          } catch { case _: java.io.IOException => () } // transient; retry
          // next beat. One EXPECTED cause (round-15 ADVICE): a holder
          // frozen longer than the lease TTL between creating
          // .beat-tmp-* and renaming it has its temp swept by a
          // waiter's gcTombstones — the rename then IOExceptions here
          // and the next beat recreates the temp. Benign: that freeze
          // already made the lease itself stealable, and the takeover
          // path (not the beat) arbitrates ownership.
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lease-heartbeat-$deltaDir")
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      beat.interrupt()
      releaseLease(conf, deltaDir)
    }
  }

  /** ONE in-dir compactor for every delta family (round-10): fold
    * the current manifest's live parts into a single
    * `compacted=<max live batch id>` consolidation, swap it in with
    * [[replace]] (atomic — late-landing batches survive), and defer
    * physical deletion of superseded dirs to the NEXT invocation
    * (readers that resolved the previous version keep their files
    * for a full compaction interval). `transform` shapes the folded
    * frame (the vector family dedups by vec_id and projects its
    * serving columns; postings families re-cluster on their key).
    * Crash points all converge on re-run: a fold written but not
    * swapped is an unreferenced orphan no reader ever saw — cleaned
    * and rewritten next time. Returns the number of parts folded
    * (0 = nothing to fold; cleanup may still run). Seeds a manifest
    * on first touch of a legacy dir.
    *
    * INVARIANT — a delta dir is bound to ONE checkpoint for its
    * lifetime (round-11 ADVICE): the deferred-deletion rule treats
    * on-disk parts with id <= the manifest's max id that are absent
    * from the manifest as superseded residue, which is only safe
    * while batch ids grow monotonically. Re-pointing a FRESH
    * checkpoint (batch ids restart at 0) at a used delta dir would
    * let cleanup delete an in-flight low-id batch before its commit
    * lands — wipe the dir (or pick a new one) together with the
    * checkpoint, exactly as the streaming sinks' recovery contract
    * already requires.
    *
    * `foldBelow` (round-11, for the histogram/sketch family): fold
    * ONLY parts with id strictly below the bound. A family whose
    * reader filters by per-batch id for replay determinism (a
    * restarted batch i must see exactly deltas 0..i-1) can still
    * compact, because a consolidation's id is the max folded batch
    * id: "parts with id < beforeBatch" answers EXACTLY over
    * {compacted=c} ∪ {batch=i} when c < beforeBatch for every
    * beforeBatch the stream can still replay — which the caller
    * guarantees by passing its checkpoint's committed watermark
    * (committed batches never re-execute, so every future
    * beforeBatch is >= the watermark > every folded id). Default
    * `Long.MaxValue` = fold everything, the round-10 behavior.
    */
  def compactLive(spark: SparkSession, deltaDir: String,
      foldBelow: Long = Long.MaxValue)(
      transform: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Int =
    withMaintenanceLease(spark, deltaDir) {
      compactLiveHeld(spark, deltaDir, foldBelow)(transform)
    }

  private def compactLiveHeld(spark: SparkSession, deltaDir: String,
      foldBelow: Long)(
      transform: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Int = {
    val ddPath = new Path(deltaDir)
    val fs = fsOf(spark, ddPath)
    val live = seedIfAbsent(spark, deltaDir)
    val maxRef = live.flatMap(idOf).maxOption.getOrElse(-1L)
    unreferencedParts(spark, deltaDir, maxRef)
      .foreach(p => fs.delete(new Path(p), true))
    val inBound = live.filter(n => idOf(n).exists(_ < foldBelow))
    val batches = inBound.filter(_.startsWith("batch="))
    val comps = inBound.filter(_.startsWith("compacted="))
    val sources = comps ++ batches
    val batchMax = batches.flatMap(idOf).maxOption.getOrElse(-1L)
    // target id must EXCEED every referenced consolidation id — ALL
    // of them, in or out of bound — or the fold would overwrite a
    // part it is reading or that still serves (possible only in a
    // legacy-seeded state where a consolidation outranks every live
    // batch — wait for new arrivals instead).
    val compMax = live.filter(_.startsWith("compacted="))
      .flatMap(idOf).maxOption.getOrElse(-1L)
    if (batches.isEmpty || sources.size < 2 || batchMax <= compMax) 0
    else {
      val target = s"compacted=$batchMax"
      transform(spark.read.parquet(sources.map(n => s"$deltaDir/$n"): _*))
        .write.mode("overwrite").parquet(s"$deltaDir/$target")
      replace(spark, deltaDir, sources.toSet, Seq(target))
      sources.size
    }
  }

  /** On-disk part dirs NOT referenced by the current manifest — the
    * deferred-deletion candidates a compactor's NEXT invocation
    * removes. `maxId` bounds what may be touched (an in-flight
    * writer's un-committed part always carries the highest id, and
    * ids above the newest consolidation are never residue).
    */
  def unreferencedParts(spark: SparkSession, deltaDir: String,
      maxId: Long): Seq[String] =
    currentParts(spark, deltaDir) match {
      // no manifest — nothing is PROVABLY superseded; deleting on a
      // mere listing could destroy live legacy parts.
      case None => Seq.empty
      case Some(liveSeq) =>
        val live = liveSeq.toSet
        val p = new Path(deltaDir)
        val fs = fsOf(spark, p)
        if (!fs.exists(p)) Seq.empty
        else fs.listStatus(p).toIndexedSeq.filter { s =>
          val n = s.getPath.getName
          s.isDirectory && !n.startsWith("_") &&
            idOf(n).exists(_ <= maxId) && !live.contains(n)
        }.map(_.getPath.toString)
    }
}
