package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * A tiny additive-parts ledger: a directory of immutable parquet part
 * dirs plus one `_PARTS` file naming the live ones, published
 * atomically (temp + move — the [[TableSink]] `_CURRENT` idiom). The
 * storage primitive behind every "standing state that refreshes by
 * additive delta + scheduled compaction" store (span-digest inventory,
 * BM25 postings/df/stats): per-batch writes stay O(batch) — a new part
 * dir and a one-line ledger update — where a row-keyed upsert of
 * uniformly-distributed keys would dirty every bucket of a CoW table.
 *
 * Single-writer by contract (scheduled ingest/maintenance jobs, not a
 * concurrent endpoint); readers resolve either the old or the new
 * ledger, never a torn one. Replay-safe: parts are named by their
 * batch/epoch, rewriting a part is an idempotent overwrite, and
 * [[add]] is add-if-absent.
 */
object DeltaParts {

  private def partsFile(dir: String) = Paths.get(dir, "_PARTS")

  /** Live part names, oldest first; empty when the store is absent. */
  def list(dir: String): Seq[String] = {
    val p = partsFile(dir)
    if (Files.exists(p))
      new String(Files.readAllBytes(p), "UTF-8")
        .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    else Seq.empty
  }

  /** Atomically publish `parts` as the live set. */
  def publish(dir: String, parts: Seq[String]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val tmp = d.resolve(s"_PARTS.tmp.${java.util.UUID.randomUUID()}")
    Files.write(tmp, (parts.mkString("\n") + "\n").getBytes("UTF-8"))
    Files.move(tmp, partsFile(dir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append `name` to the live set if absent (replay-idempotent). */
  def add(dir: String, name: String): Unit = {
    val cur = list(dir)
    if (!cur.contains(name)) publish(dir, cur :+ name)
  }

  /** Replace all live parts with `keep`, best-effort deleting the
    * now-unreferenced dirs AFTER the atomic publish (compaction). */
  def replaceAll(dir: String, keep: String): Unit = {
    val old = list(dir)
    publish(dir, Seq(keep))
    old.filterNot(_ == keep).foreach(p => rmDir(s"$dir/$p"))
  }

  /** Best-effort recursive delete of an unreferenced part dir — for
    * stores whose ONE ledger governs part dirs under several relation
    * roots (publish first, then clean each root). */
  def rmDir(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
  }
}
