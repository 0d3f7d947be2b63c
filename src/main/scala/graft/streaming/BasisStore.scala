package graft.streaming

// Filesystem access rides the [[graft.sources.StoreFs]] seam (atomic
// publish + lenient read).

/**
 * Tiny driver-side store for the pruned-ST4 projection basis: one text
 * file, one line per direction (comma-joined doubles), published with
 * temp-write + ATOMIC_MOVE — readers see the old basis or the new one,
 * never a torn file (the same publish discipline as TableSink's
 * manifests). The basis is k × d doubles (KBs), pure driver metadata:
 * no Spark job reads or writes it, so persistence costs nothing on the
 * cluster. A missing file is a cold start → empty basis → callers run
 * the raw-coordinate grid (exact recall either way; a stale or absent
 * basis only costs pruning power, never correctness — which is why a
 * crash between the stories MERGE and a basis refresh needs no
 * recovery handling).
 */
object BasisStore {

  /** Single-line wire form (directions joined by ';', coords by ',') —
    * fits a [[graft.sources.TableSink]] manifest `meta` line, which is
    * how a cell-addressed layout publishes the basis its cells were
    * computed under ATOMICALLY with the data (see
    * [[StreamingJob]]: a sibling file could desync on a crash between
    * two publishes; the manifest cannot). */
  def encode(basis: Seq[Array[Double]]): String =
    basis.map(_.mkString(",")).mkString(";")

  /** Strict inverse of [[encode]]: throws NumberFormatException on
    * malformed input. The layout-meta path needs this form — there the
    * basis defines bucket addressing and corruption must fail loudly. */
  def decodeStrict(s: String): Seq[Array[Double]] =
    s.split(';').toSeq.filter(_.nonEmpty)
      .map(_.split(',').map(_.toDouble).toArray)

  /** Lenient inverse of [[encode]]; malformed input degrades to Nil (raw
    * grid) exactly like [[load]] — for callers where the basis is a
    * pruning aid, never a correctness dependency. */
  def decode(s: String): Seq[Array[Double]] =
    try decodeStrict(s)
    catch {
      case e: NumberFormatException =>
        System.err.println(s"[graft] ignoring unreadable basis meta: $e")
        Nil
    }

  def save(path: String, basis: Seq[Array[Double]]): Unit =
    graft.sources.StoreFs.get.writeAtomic(path,
      basis.map(_.mkString(",")).mkString("\n"))

  /** Load the basis, or Nil when no basis has been published yet — or
    * when the file is unreadable/damaged (impossible via [[save]]'s
    * atomic publish, but a stray edit must degrade the job to the raw
    * grid, not kill the stream: a missing basis costs pruning power
    * only). */
  def load(path: String): Seq[Array[Double]] = {
    val fs = graft.sources.StoreFs.get
    if (!fs.exists(path)) Nil
    else try
      fs.readLines(path).filter(_.nonEmpty)
        .map(_.split(',').map(_.toDouble).toArray)
    catch {
      case e @ (_: NumberFormatException | _: java.io.IOException) =>
        System.err.println(s"[graft] ignoring unreadable basis at $path: $e")
        Nil
    }
  }
}
