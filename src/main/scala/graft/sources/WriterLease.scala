package graft.sources

import java.nio.file.{Files, Path, Paths, FileAlreadyExistsException, NoSuchFileException, StandardOpenOption}

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
 *  - A lease older than `graft.lease.staleMs` (default 30 min — beyond
 *    any sane commit, and past the [[TableSink]] GC grace) is a crashed
 *    writer's leftover; it is broken and acquisition retried, so an
 *    unclean death never wedges the store. The break-then-create race
 *    between two healers is settled by `CREATE_NEW` itself.
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

  /** Run `body` holding the exclusive writer lease on `dir`. `label`
    * names the operation in the lease file and in the error the losing
    * writer sees. Reentrant: a scope already holding `dir` on this
    * thread runs `body` directly. */
  def withLease[A](dir: String, label: String)(body: => A): A = {
    val key = Paths.get(dir).toAbsolutePath.normalize.toString
    if (held.get().contains(key)) return body
    val token = acquire(Paths.get(key, LeaseFile), label)
    held.set(held.get() + (key -> token))
    try body
    finally {
      held.set(held.get() - key)
      release(Paths.get(key, LeaseFile), token)
    }
  }

  /** Acquire or fail loud; breaks a stale lease (crashed holder). */
  private def acquire(p: Path, label: String): String = {
    val token = java.util.UUID.randomUUID().toString
    val content = s"token=$token\nowner=$owner\nlabel=$label\n"
    var brokeStale = false
    while (true) {
      Files.createDirectories(p.getParent)
      try {
        Files.write(p, content.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        return token
      } catch {
        case _: FileAlreadyExistsException =>
          val age =
            try Some(System.currentTimeMillis() - Files.getLastModifiedTime(p).toMillis)
            catch { case _: NoSuchFileException => None } // freed meanwhile: retry
          if (age.isEmpty) {
            // fall through to the retry loop
          } else if (age.get > staleMs) {
            // One break attempt: if the slot refills we either lost the
            // CREATE_NEW race to a FRESH writer (fail below) or something
            // is rewriting stale leases — fail rather than loop.
            if (brokeStale) throw new ConcurrentWriterException(
              s"lease at '$p' is stale but reappeared after a break — " +
                s"refusing '$label' rather than fight over the slot")
            brokeStale = true
            try Files.deleteIfExists(p)
            catch { case _: java.io.IOException => () }
          } else {
            val holder =
              try new String(Files.readAllBytes(p), "UTF-8").trim.replace('\n', ' ')
              catch { case _: java.io.IOException => "<unreadable>" }
            throw new ConcurrentWriterException(
              s"store at '${p.getParent}' has a live writer lease ($holder, " +
                s"age ${age.get / 1000}s) — refusing concurrent '$label'. These " +
                "stores are single-writer; serialize the jobs, or if the " +
                "holder crashed wait out graft.lease.staleMs " +
                s"(${staleMs / 1000}s) for the stale break.")
          }
          // stale and already broken once, or vanished: loop to CREATE_NEW
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Delete the lease only if it is still ours (token check). */
  private def release(p: Path, token: String): Unit = {
    try {
      val mine = new String(Files.readAllBytes(p), "UTF-8")
        .linesIterator.contains(s"token=$token")
      if (mine) Files.deleteIfExists(p)
    } catch { case _: java.io.IOException => () } // already broken/freed
    ()
  }
}
