package graft.sources

import java.util.EnumSet
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileAlreadyExistsException, FileContext, Options, Path}

/**
 * [[StoreFs]] over a Hadoop `FileContext` — the distributed-filesystem
 * drop-in the seam exists for. `FileContext` (not the older
 * `FileSystem`) because the store family's crash reasoning needs its
 * two primitives with DEFINED semantics:
 *
 *  - `rename(src, dst, Options.Rename.*)`: atomic on HDFS; `NONE`
 *    fails when `dst` exists (the lease tombstone's exactly-one-winner
 *    move), `OVERWRITE` replaces atomically (the manifest flip).
 *  - `create(..., CreateFlag.CREATE)` without OVERWRITE: exclusive
 *    create — exactly one of N concurrent callers wins (the lease
 *    acquisition; HDFS enforces this at the NameNode).
 *
 * Guarantee check per the trait's contract: HDFS rename is atomic and
 * its directory listings are strongly consistent (NameNode-served), so
 * [[writeAtomic]] and [[list]] meet their requirements. Object stores
 * whose "rename" is COPY+DELETE (S3 without a consistency layer) do
 * NOT — point this class at them and the publish primitive silently
 * stops being atomic; use a manifest-commit service there instead.
 *
 * Paths stay plain strings (scheme-less), resolved against THIS
 * context's default filesystem — [[requireCompatible]] refuses any
 * path carrying an explicit scheme and any Spark session whose default
 * filesystem differs from this context's, so Spark jobs and seam
 * metadata always resolve a store path to the same location.
 *
 * Local-mode note: constructed over `file:///` this is a second,
 * independently-tested implementation of the same contract on the
 * local disk — which is how the test suite proves the stores run
 * unchanged over a swapped seam without needing an HDFS cluster.
 */
final class HadoopStoreFs(conf: Configuration,
                          fsUri: java.net.URI) extends StoreFs {

  private val fc: FileContext = FileContext.getFileContext(fsUri, conf)

  private def hp(path: String): Path = new Path(path)

  override def canonical(path: String): String = {
    // Qualified-then-stripped: one absolute, normalized, scheme-less
    // string per location, reusable as a path by every other op (the
    // callers join children onto it with '/').
    val q = fc.makeQualified(hp(path))
    Option(q.toUri.getPath).filter(_.nonEmpty).getOrElse(q.toString)
  }

  override def exists(path: String): Boolean = fc.util.exists(hp(path))

  override def isDirectory(path: String): Boolean =
    try fc.getFileStatus(hp(path)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  override def mkdirs(path: String): Unit = {
    fc.mkdir(hp(path),
      org.apache.hadoop.fs.permission.FsPermission.getDirDefault,
      true /* createParent */)
    ()
  }

  override def readBytes(path: String): Array[Byte] = {
    val in = fc.open(hp(path))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private def writeFile(p: Path, content: String,
                        flags: EnumSet[CreateFlag]): Unit = {
    val out = fc.create(p, flags,
      Options.CreateOpts.createParent())
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
  }

  override def writeAtomic(path: String, content: String): Unit = {
    val target = hp(path)
    val parent = Option(target.getParent).getOrElse(
      throw new IllegalArgumentException(s"no parent for '$path'"))
    if (!fc.util.exists(parent)) mkdirs(parent.toString)
    // Dot-prefixed `.name.<uuid>.tmp` sibling (the trait's debris
    // convention), same directory so the rename is one-filesystem.
    val tmp = new Path(parent,
      s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
    writeFile(tmp, content, EnumSet.of(CreateFlag.CREATE))
    fc.rename(tmp, target, Options.Rename.OVERWRITE)
  }

  override def createNew(path: String, content: String): Boolean =
    try {
      writeFile(hp(path), content, EnumSet.of(CreateFlag.CREATE))
      true
    } catch {
      case _: FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
    }

  override def moveAtomic(src: String, dst: String,
                          replaceExisting: Boolean): Unit =
    fc.rename(hp(src), hp(dst),
      if (replaceExisting) Options.Rename.OVERWRITE else Options.Rename.NONE)

  override def deleteIfExists(path: String): Boolean =
    try fc.delete(hp(path), false)
    catch { case _: java.io.FileNotFoundException => false }

  override def deleteRecursively(path: String): Unit = {
    try { fc.delete(hp(path), true); () }
    catch { case _: java.io.FileNotFoundException => () }
  }

  override def list(path: String): Seq[StoreFs.Entry] =
    try {
      val it = fc.listStatus(hp(path))
      val b = Seq.newBuilder[StoreFs.Entry]
      while (it.hasNext) {
        val st = it.next()
        b += StoreFs.Entry(st.getPath.getName, st.isDirectory,
          st.getModificationTime)
      }
      b.result()
    } catch {
      case _: java.io.FileNotFoundException => Seq.empty
    }

  override def lastModifiedMillis(path: String): Option[Long] =
    try Some(fc.getFileStatus(hp(path)).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  override def touch(path: String): Unit =
    fc.setTimes(hp(path), System.currentTimeMillis(), -1)

  /** A store path must resolve to THIS context's filesystem for both
    * worlds: explicit schemes are refused (stores join plain strings),
    * and the Spark session's DEFAULT filesystem must match this
    * context's — otherwise Spark's parquet writes and the seam's
    * manifest flips land on different systems and the store tears. */
  override def requireCompatible(path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    val explicit = Option(new Path(path).toUri.getScheme)
    require(explicit.isEmpty,
      s"standing-store paths are PLAIN scheme-less paths: '$path' " +
        s"carries explicit scheme '${explicit.get}'")
    val sparkFs = org.apache.hadoop.fs.FileSystem
      .getDefaultUri(spark.sessionState.newHadoopConf())
    val mine = fc.getDefaultFileSystem.getUri
    require(Option(sparkFs.getScheme).getOrElse("file") ==
        Option(mine.getScheme).getOrElse("file") &&
        Option(sparkFs.getAuthority).getOrElse("") ==
          Option(mine.getAuthority).getOrElse(""),
      s"Spark's default filesystem '$sparkFs' differs from the store " +
        s"seam's '$mine' — a store path would mean two different " +
        "locations; align spark.hadoop.fs.defaultFS with the seam")
  }
}

object HadoopStoreFs {
  /** The seam over a cluster's default filesystem (HDFS deployment
    * wiring): `StoreFs.set(HadoopStoreFs.default(hadoopConf))`. */
  def default(conf: Configuration): HadoopStoreFs =
    new HadoopStoreFs(conf, org.apache.hadoop.fs.FileSystem.getDefaultUri(conf))

  /** The seam over the LOCAL filesystem through the Hadoop API — the
    * in-sandbox way to prove the store family runs unchanged over a
    * swapped implementation. */
  def local(): HadoopStoreFs = {
    val conf = new Configuration()
    conf.set("fs.defaultFS", "file:///")
    new HadoopStoreFs(conf, java.net.URI.create("file:///"))
  }
}
