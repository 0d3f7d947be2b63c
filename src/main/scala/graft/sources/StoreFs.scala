package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, NoSuchFileException,
  Path, Paths, StandardCopyOption, StandardOpenOption}

/**
 * THE filesystem seam under every standing-store ledger/meta operation
 * ([[TableSink]] manifests and `_CURRENT` flips, [[DeltaParts]] part
 * ledgers and snapshot tags, [[WriterLease]] acquisition,
 * [[StoreCheck]]'s referential audits, [[IndexMeta]]'s versioned fit
 * dirs). The stores' crash-safety reasoning depends on a small set of
 * filesystem guarantees; this trait names each one PER OPERATION so an
 * implementation over a different storage system (HDFS via Hadoop
 * `FileContext`, a POSIX NFS mount) can be checked guarantee-by-
 * guarantee and dropped in via [[StoreFs.set]] — instead of auditing
 * every `java.nio` call site in every store.
 *
 * Paths are plain strings, joined with '/' by the callers; an
 * implementation interprets them in its own namespace (the local impl:
 * `java.nio` paths; a Hadoop impl: paths under its `FileSystem`). The
 * stores never embed a URI scheme — [[requireCompatible]] is the
 * per-implementation refusal that keeps Spark's view of a store path
 * and the seam's view pointing at the SAME location (the r18
 * BucketedParts lesson: a path the ledger layer and Spark resolve
 * differently tears the store silently).
 *
 * Error contract: operations throw `java.io.IOException` (or a
 * subclass) when the filesystem race they can lose happens mid-call —
 * a concurrently deleted lease, a vanished move source. Callers that
 * tolerate a race catch IOException; everything else propagates.
 */
trait StoreFs {

  /** Canonical absolute form of `path` — the REENTRANCY KEY for
    * [[WriterLease]] (two spellings of one dir must canonicalize
    * equal, or a composite mutation would deadlock-or-double-acquire
    * against itself). Must not require the path to exist. */
  def canonical(path: String): String

  def exists(path: String): Boolean

  def isDirectory(path: String): Boolean

  /** Create `path` and any missing ancestors; idempotent. */
  def mkdirs(path: String): Unit

  /** Full contents. Throws IOException if absent (callers that probe
    * racy files catch it). */
  def readBytes(path: String): Array[Byte]

  def readString(path: String): String = new String(readBytes(path), "UTF-8")

  def readLines(path: String): Seq[String] =
    readString(path).split("\n", -1).toSeq

  /**
   * Publish `content` at `path` ATOMICALLY: a concurrent reader of
   * `path` sees the old bytes or the new bytes, never a prefix — the
   * primitive every manifest/pointer/ledger flip in the store family
   * rides. REQUIRED SEMANTICS: write to an invisible sibling, then an
   * atomic rename that replaces any existing file. Any temp artifact a
   * crash strands must be DOT-PREFIXED and contain `.tmp` in its name:
   * snapshot/tag listings skip dot-leading names and
   * [[StoreCheck]]'s debris advisory counts `.tmp` — an impl whose
   * debris violates either convention corrupts tag listings or hides
   * from fsck. (HDFS: rename is atomic; S3A: rename is COPY+DELETE,
   * NOT atomic — an S3 impl must route this through something that is,
   * e.g. a conditional PUT, or refuse.)
   */
  def writeAtomic(path: String, content: String): Unit

  /**
   * Atomic create-if-absent carrying `content` — the [[WriterLease]]
   * acquisition primitive. Returns true iff THIS call created the
   * file; false iff it already existed. REQUIRED: exactly one of N
   * concurrent callers may see true (HDFS: `CreateFlag.CREATE` without
   * OVERWRITE; POSIX: O_EXCL). An impl that cannot provide exclusive
   * create cannot host the lease and must refuse at [[requireCompatible]].
   */
  def createNew(path: String, content: String): Boolean

  /**
   * Atomic rename. With `replaceExisting` = false the move FAILS
   * (IOException) when `dst` exists — the lease tombstone dance needs
   * exactly-one-winner moves; with true it atomically replaces.
   * Throws IOException when `src` vanished (the lost-race signal
   * [[WriterLease]]'s healer relies on).
   */
  def moveAtomic(src: String, dst: String, replaceExisting: Boolean = false): Unit

  /** Delete a file if present; true iff this call deleted it. */
  def deleteIfExists(path: String): Boolean

  /** Recursive best-effort delete of a dir tree (orphan-part GC). */
  def deleteRecursively(path: String): Unit

  /**
   * Immediate children of a directory; empty when absent or not a
   * directory. REQUIRED CONSISTENCY: a child whose publishing rename
   * completed before the list call MUST appear (list-after-rename
   * consistency — true on HDFS and POSIX; eventually-consistent
   * stores must not host the ledger). `lastModifiedMillis` feeds the
   * GC grace window, so it must be a real wall-clock publish time.
   */
  def list(path: String): Seq[StoreFs.Entry]

  /** Modification time, None when absent (the lease staleness read —
    * absent means "freed meanwhile", a distinct branch from 0L). */
  def lastModifiedMillis(path: String): Option[Long]

  /** Bump `path`'s mtime to now — the lease heartbeat. Throws
    * IOException when the file vanished (heartbeat stops mattering). */
  def touch(path: String): Unit

  /**
   * The store-path compatibility refusal — ONE place (r18 verdict
   * task 4). A store path must mean the same location to (a) this
   * seam's metadata operations and (b) Spark jobs reading/writing
   * parquet at the same string; a path that tears between the two
   * would let a Spark write land where the layout probe reads "empty"
   * and the reconcile overwrite data. Implementations refuse any path
   * they cannot guarantee that for. Called by every store entry point
   * that hands the path to BOTH worlds (BucketedParts, TableSink).
   */
  def requireCompatible(path: String, spark: org.apache.spark.sql.SparkSession): Unit
}

object StoreFs {

  /** One directory child: name, kind, publish time. */
  final case class Entry(name: String, isDirectory: Boolean,
                         lastModifiedMillis: Long) {
    def isFile: Boolean = !isDirectory
  }

  @volatile private var impl: StoreFs = LocalStoreFs

  /** The active seam implementation (volatile read — hot paths may
    * call per operation). */
  def get: StoreFs = impl

  /** Swap the seam implementation (deployment wiring / tests). The
    * stores are single-writer per dir by contract; swapping while a
    * mutation is in flight is the caller's misdeployment. */
  def set(fs: StoreFs): Unit = { impl = fs }

  /** Restore the default local implementation. */
  def resetLocal(): Unit = { impl = LocalStoreFs }
}

/**
 * The `java.nio` implementation — the in-process, local-filesystem
 * form every test and single-driver deployment runs on. Guarantee
 * mapping: atomic publish = `ATOMIC_MOVE` (+`REPLACE_EXISTING`),
 * exclusive create = `CREATE_NEW`, listing is POSIX-consistent,
 * mtimes are wall-clock.
 */
object LocalStoreFs extends StoreFs {

  private def p(path: String): Path = Paths.get(path)

  override def canonical(path: String): String =
    p(path).toAbsolutePath.normalize.toString

  override def exists(path: String): Boolean = Files.exists(p(path))

  override def isDirectory(path: String): Boolean = Files.isDirectory(p(path))

  override def mkdirs(path: String): Unit = { Files.createDirectories(p(path)); () }

  override def readBytes(path: String): Array[Byte] = Files.readAllBytes(p(path))

  override def readLines(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(p(path)).asScala.toSeq
  }

  override def writeAtomic(path: String, content: String): Unit = {
    val target = p(path).toAbsolutePath
    Files.createDirectories(target.getParent)
    // Dot-prefixed `.name.<uuid>.tmp` sibling (the trait's debris
    // convention), same directory so the move stays one-filesystem.
    val tmp = target.resolveSibling(
      s".${target.getFileName}.${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  override def createNew(path: String, content: String): Boolean = {
    val target = p(path).toAbsolutePath
    Files.createDirectories(target.getParent)
    try {
      Files.write(target, content.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: FileAlreadyExistsException => false }
  }

  override def moveAtomic(src: String, dst: String,
                          replaceExisting: Boolean): Unit = {
    if (replaceExisting) {
      Files.move(p(src), p(dst), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } else {
      // POSIX rename(2) silently REPLACES an existing destination, so
      // `ATOMIC_MOVE` alone cannot refuse one — check first (matching
      // Hadoop FileContext's Rename.NONE, which stats dst before the
      // rename). The check-then-rename window is the same one the
      // Hadoop local impl has; the one caller that needs exactly-one-
      // winner moves (the lease tombstone dance) already holds the
      // exclusive-create lease file, so no two no-replace movers race
      // the same dst in practice.
      if (Files.exists(p(dst)))
        throw new FileAlreadyExistsException(dst)
      Files.move(p(src), p(dst), StandardCopyOption.ATOMIC_MOVE)
    }
    ()
  }

  override def deleteIfExists(path: String): Boolean =
    Files.deleteIfExists(p(path))

  override def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
  }

  override def list(path: String): Seq[StoreFs.Entry] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .map(f => StoreFs.Entry(f.getName, f.isDirectory, f.lastModified()))
      .toSeq

  override def lastModifiedMillis(path: String): Option[Long] =
    try Some(Files.getLastModifiedTime(p(path)).toMillis)
    catch { case _: NoSuchFileException => None }

  override def touch(path: String): Unit = {
    Files.setLastModifiedTime(p(path),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    ()
  }

  /** The local seam accepts only paths that BOTH `java.nio` and Spark
    * resolve to the same local location (the r18 BucketedParts guard,
    * now living here): an EXPLICIT scheme (even `file://`) is refused
    * first — Spark would resolve it while `java.nio` treats `file:/x`
    * as a literal relative dir — and a scheme-less path is refused
    * when the deployment's DEFAULT filesystem is remote (Spark would
    * write remotely, the local layout probe reads "empty", and an
    * empty-layout reconcile would overwrite the data just written). */
  override def requireCompatible(path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    // Explicit-scheme refusal BEFORE resolving the FileSystem: an
    // s3://-style path without its connector jar would otherwise die
    // with an opaque 'No FileSystem for scheme', and with the jar we
    // would build a remote client just to refuse.
    val explicit = Option(hPath.toUri.getScheme)
    require(explicit.isEmpty,
      s"standing-store paths are local-filesystem PLAIN paths under the " +
        s"local StoreFs (the ledger/meta layer is java.nio over the same " +
        s"string): '$path' carries explicit scheme '${explicit.get}'")
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val resolved = Option(fs.getUri.getScheme).getOrElse("file")
    require(resolved == "file",
      s"standing-store paths are local-filesystem PLAIN paths under the " +
        s"local StoreFs (the ledger/meta layer is java.nio over the same " +
        s"string): '$path' resolves to default-filesystem scheme '$resolved'")
  }
}
