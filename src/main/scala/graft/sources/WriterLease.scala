package graft.sources

// All filesystem access rides the [[StoreFs]] seam (exclusive create,
// atomic tombstone moves, mtime heartbeats — the semantics each op
// needs are documented on the trait).

/**
 * Fail-loud single-writer enforcement for the on-disk stores.
 *
 * Every mutating store in this engine ([[TableSink]] CoW tables, the
 * [[DeltaParts]]/[[AdditiveLedger]] additive stores, and the composite
 * pipelines built on them) is single-writer BY CONTRACT: mutations are
 * issued by one scheduled ingest/maintenance job, and the crash-safety
 * reasoning (atomic manifest flips, replay-idempotent named parts)
 * assumes commits never interleave. A violated contract — two
 * schedulers misconfigured onto one store dir, an operator re-running a
 * backfill next to live ingest — would corrupt SILENTLY: both writers
 * read the same manifest/ledger, both publish seq+1, last flip wins and
 * the other writer's rows vanish with rc=0.
 *
 * This lease turns that silent lost-update into a loud, diagnosable
 * error at the second writer:
 *
 *  - Acquisition is an atomic `CREATE_NEW` of `dir/_LEASE` carrying the
 *    holder's pid@host, thread, label, and a random token — the
 *    filesystem primitive every store here already trusts for its
 *    atomic publishes.
 *  - A live lease makes the second writer FAIL IMMEDIATELY (a
 *    [[WriterLease.ConcurrentWriterException]] naming the holder), not
 *    block: concurrent mutation of one store dir is a deployment bug to
 *    surface, not contention to wait out.
 *  - A lease older than `graft.lease.staleMs` (default 30 min) is a
 *    crashed writer's leftover; it is broken and acquisition retried,
 *    so an unclean death never wedges the store. The break is an
 *    ATOMIC_MOVE of the stale file to a unique tombstone — exactly one
 *    of two concurrent healers wins the move (the loser's move throws
 *    and it retries into the winner's fresh lease, failing loud) —
 *    deleting in place would let healer B delete healer A's FRESH
 *    lease and run concurrently.
 *  - A held lease HEARTBEATS: a daemon timer re-touches the file's
 *    mtime every staleMs/4, so a legitimately long mutation (an
 *    O(corpus) init or rebuild at scale) never ages into "stale" under
 *    a live writer — staleness means a writer that stopped beating.
 *  - Re-entrant per thread and per dir, so composite mutations
 *    (a ledger dance inside [[AdditiveLedger.mutateNamed]], a store
 *    mutation inside a pipeline-root lease) take the lease once at the
 *    outermost scope. Distinct dirs nest freely; composite callers
 *    acquire parent-root before child-store dirs, so lock order is
 *    consistent by construction.
 *  - Release deletes `_LEASE` only while it still holds OUR token, so a
 *    long-stalled writer that was (correctly) broken as stale cannot,
 *    on resume, delete the lease the NEXT writer now holds. Its own
 *    publish may still land — staleness-breaking trades that residual
 *    window for never-wedging; the default makes it unreachable for
 *    healthy commits.
 *
 * On a real cluster deployment the same role is played by the catalog's
 * commit protocol (Delta/Iceberg optimistic concurrency); this is the
 * shared-filesystem form of that contract, sized for the single-driver
 * deployments the stores target.
 */
object WriterLease {

  val LeaseFile = "_LEASE"

  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  private def staleMs: Long =
    sys.props.get("graft.lease.staleMs").map(_.toLong).getOrElse(30L * 60 * 1000)

  // dir → token we hold there, for this thread. Presence = reentrant scope.
  private val held = new ThreadLocal[Map[String, String]] {
    override def initialValue(): Map[String, String] = Map.empty
  }

  private def owner: String =
    s"${ProcessHandle.current().pid()}@${java.net.InetAddress.getLocalHost.getHostName}/" +
      Thread.currentThread().getName

  // One daemon timer thread for every heartbeat in the JVM — beats are
  // sub-ms mtime touches, never contended work.
  private lazy val beats =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-lease-heartbeat"); t.setDaemon(true); t
    })

  /** Run `body` holding the exclusive writer lease on `dir`. `label`
    * names the operation in the lease file and in the error the losing
    * writer sees. Reentrant: a scope already holding `dir` on this
    * thread runs `body` directly. The held lease heartbeats (mtime
    * touch every staleMs/4), so only a writer that STOPPED — crash,
    * kill, JVM death — ever ages into the stale break. */
  def withLease[A](dir: String, label: String)(body: => A): A = {
    val fs = StoreFs.get
    val key = fs.canonical(dir)
    if (held.get().contains(key)) return body
    val p = s"$key/$LeaseFile"
    val token = acquire(fs, p, label)
    held.set(held.get() + (key -> token))
    val period = math.max(1L, staleMs / 4)
    val beat = beats.scheduleAtFixedRate(
      // Touch ONLY while the file still carries OUR token: a writer that
      // was (correctly) broken as stale and resumed must not keep the
      // NEXT holder's lease forever-fresh — that lease must age normally
      // if its own holder crashes.
      () => try {
        if (new String(fs.readBytes(p), "UTF-8")
            .linesIterator.contains(s"token=$token"))
          fs.touch(p)
      } catch { case _: java.io.IOException => () }, // broken/freed: stop mattering
      period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    try body
    finally {
      beat.cancel(false)
      held.set(held.get() - key)
      release(fs, p, token)
    }
  }

  /** Acquire or fail loud; breaks a stale lease (crashed holder). */
  private def acquire(fs: StoreFs, p: String, label: String): String = {
    val token = java.util.UUID.randomUUID().toString
    val content = s"token=$token\nowner=$owner\nlabel=$label\n"
    val parent = p.stripSuffix("/" + LeaseFile)
    var brokeStale = false
    while (true) {
      if (fs.createNew(p, content)) return token
      // the slot is occupied: live holder, stale holder, or freed race
      val age = fs.lastModifiedMillis(p)
        .map(System.currentTimeMillis() - _) // None = freed meanwhile: retry
      if (age.isEmpty) {
        // fall through to the retry loop
      } else if (age.get > staleMs) {
        // One break attempt: if the slot refills we either lost the
        // exclusive-create race to a FRESH writer (fail below) or
        // something is rewriting stale leases — fail rather than loop.
        if (brokeStale) throw new ConcurrentWriterException(
          s"lease at '$p' is stale but reappeared after a break — " +
            s"refusing '$label' rather than fight over the slot")
        brokeStale = true
        // Atomic no-replace move to a unique tombstone: of two
        // concurrent healers exactly one wins the move (the loser's
        // move throws on the vanished source and retries into the
        // winner's fresh lease). A plain delete here would let the
        // slower healer delete the faster one's FRESH lease — two live
        // writers. The move alone is not enough either: a delayed
        // healer can move a lease that was broken-and-re-acquired
        // between its staleness read and its move — so VERIFY the
        // tombstone still carries the bytes judged stale, and restore
        // + refuse on mismatch.
        val stale =
          try Some(fs.readBytes(p))
          catch { case _: java.io.IOException => None } // vanished: retry
        if (stale.isDefined) {
          val tomb = s"$parent/$LeaseFile.broken.${java.util.UUID.randomUUID()}"
          try {
            fs.moveAtomic(p, tomb)
            if (java.util.Arrays.equals(fs.readBytes(tomb), stale.get))
              fs.deleteIfExists(tomb)
            else {
              // we displaced a rival's FRESH lease — put it back
              try fs.moveAtomic(tomb, p)
              catch { case _: java.io.IOException => () } // p refilled
              throw new ConcurrentWriterException(
                s"lease at '$p' was broken and re-acquired by another " +
                  s"writer while '$label' was breaking it — refusing")
            }
          } catch { case _: java.io.IOException => () } // lost the break race
        }
      } else {
        val holder =
          try new String(fs.readBytes(p), "UTF-8").trim.replace('\n', ' ')
          catch { case _: java.io.IOException => "<unreadable>" }
        throw new ConcurrentWriterException(
          s"store at '$parent' has a live writer lease ($holder, " +
            s"age ${age.get / 1000}s) — refusing concurrent '$label'. These " +
            "stores are single-writer; serialize the jobs, or if the " +
            "holder crashed wait out graft.lease.staleMs " +
            s"(${staleMs / 1000}s) for the stale break.")
      }
      // stale and already broken once, or vanished: loop to exclusive create
    }
    throw new IllegalStateException("unreachable")
  }

  /** Delete the lease only if it is still ours (token check). */
  private def release(fs: StoreFs, p: String, token: String): Unit = {
    try {
      val mine = new String(fs.readBytes(p), "UTF-8")
        .linesIterator.contains(s"token=$token")
      if (mine) fs.deleteIfExists(p)
    } catch { case _: java.io.IOException => () } // already broken/freed
    ()
  }
}
