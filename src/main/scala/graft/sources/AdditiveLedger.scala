package graft.sources

/**
 * Shared scaffolding for the single-concern additive-count stores
 * ([[graft.operators.LmStore]], [[graft.operators.LineStore]]): the
 * init-refusal, the named-mutation replay dance, and the
 * compact-sweep-publish cycle are store-agnostic — only the relation
 * contents differ — so the crash-window reasoning lives ONCE here.
 *
 * (The older multi-relation stores — Bm25Store, StatsStore, the
 * Admission ledger — carry the same idiom inline with extra
 * per-relation semantics; migrating them onto this helper is a
 * mechanical follow-up, deliberately not done in the same change that
 * introduced it.)
 */
object AdditiveLedger {

  def absorbedDir(dir: String): String = s"$dir/_absorbed"

  /** Refuse a previously-used store dir: re-initializing in place would
    * reset the parts while `_absorbed` survives, silently no-opping a
    * later replayed append. */
  def requireFresh(dir: String, what: String): Unit = {
    val priorLife = Seq(
      java.nio.file.Paths.get(dir, "_PARTS"),
      java.nio.file.Paths.get(absorbedDir(dir), "_PARTS")
    ).filter(java.nio.file.Files.exists(_))
    if (priorLife.nonEmpty)
      throw new IllegalStateException(
        s"$what at '$dir' was already initialized " +
          s"(found: ${priorLife.mkString(", ")}) — init is run-once; " +
          "delete the store dir (or point at a fresh one) to rebuild.")
  }

  /** Record the init part in both ledgers (call after the part files
    * are on disk — [[DeltaParts.add]] is the atomic publish). */
  def recordInit(dir: String, name: String): Unit = {
    DeltaParts.add(dir, name)
    DeltaParts.add(absorbedDir(dir), name)
  }

  /**
   * The named-mutation replay dance, idempotent at every crash point
   * INCLUDING a replay after compaction folded the named part:
   *  - an absorbed name is a completed mutation → no-op;
   *  - a ledgered-but-unabsorbed name crashed between the part write
   *    and the absorbed add — the files are complete (the ledger add is
   *    the write's last step), so only the record finishes;
   *  - otherwise `write(name)` must put the part files on disk AND
   *    ledger them (its last step), then the absorbed record lands.
   */
  def mutateNamed(dir: String, roots: Seq[String], name: Option[String])
                 (write: String => Unit): Unit = {
    val absorbed = DeltaParts.list(absorbedDir(dir))
    val n = name.getOrElse(DeltaParts.nextIndexedName(dir, roots,
      extraNames = absorbed))
    if (absorbed.contains(n)) return
    if (!DeltaParts.list(dir).contains(n)) write(n)
    DeltaParts.add(absorbedDir(dir), n)
  }

  /** The compact cycle: write the merged generation un-ledgered, sweep
    * orphans (protecting the superseded parts one cycle for in-flight
    * readers, the new gen, and every snapshot pin), publish atomically.
    * `writeGen` must put the generation's files on disk, NOT ledger
    * them (publish-by-replace is the atomic step — an add would
    * transiently double-count). */
  def compactWith(dir: String, roots: Seq[String])
                 (writeGen: String => Unit): Unit = {
    val old = DeltaParts.list(dir)
    if (old.size <= 1) return
    val gen = s"part_c${System.nanoTime()}"
    writeGen(gen)
    val protect = old.toSet + gen ++ DeltaParts.pinned(dir)
    roots.foreach(r => DeltaParts.sweepOrphans(r, protect))
    DeltaParts.publish(dir, Seq(gen))
  }
}
