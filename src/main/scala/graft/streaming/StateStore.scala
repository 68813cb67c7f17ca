package graft.streaming

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

/** Crash-safe commits for parquet-backed sink state.
  *
  * Every state rewrite lands in a FRESH version directory (`v-<name>-<id>`)
  * beside the live one; the swap is a single `MANIFEST` pointer file
  * replaced via atomic rename. A crash at any point leaves either the old
  * manifest (old state fully intact, new dirs are invisible orphans) or the
  * new manifest (whose dirs were fully written before the flip) — never a
  * state directory that is half old, half new, which the previous
  * overwrite-in-place swap could produce. Orphans are swept on the next
  * successful commit.
  *
  * The manifest also carries scalar entries (the incremental aggregate's
  * high-water mark), so "new data + new watermark" is ONE atomic flip — a
  * crash can no longer publish merged data with a stale watermark, which
  * under replay would double-apply a batch.
  *
  * Scale note: this is the same commit shape as a transactional table
  * format's metadata pointer (snapshot files + one atomic pointer swap);
  * on a production object store the rename becomes the store's
  * put-if-absent/pointer CAS while every caller here stays unchanged.
  */
object StateStore {

  private val ManifestName = "MANIFEST"
  private val VersionPrefix = "v-"
  private val SnapPrefix = "snap-"

  /** Thrown by [[commitIf]] when the manifest moved after the caller's
    * load — the caller's rewrite was computed from a stale state and must
    * not be published. Carries both manifests so the operator can see WHAT
    * landed in the window (e.g. a backfill merge racing a retirement). */
  final class ConcurrentCommitException(root: String,
      val expected: Map[String, String], val found: Map[String, String])
    extends IllegalStateException(
      s"state under $root changed since it was read (expected " +
        s"${expected.toSeq.sorted.mkString(",")}; found " +
        s"${found.toSeq.sorted.mkString(",")}) — a concurrent commit " +
        "landed; rerun against the current state")

  /** One lock per state root (canonical path): every commit to a root is
    * serialized through it, which is what makes [[commitIf]]'s
    * load-compare-flip a real CAS rather than a narrower race. All
    * committers to a root share the driver JVM (sink foreachBatch bodies
    * and recovery verbs both run driver-side), so a JVM lock is the
    * correct scope here; on a production object store the same role is
    * played by the store's pointer CAS / put-if-absent (see the scale note
    * above), with every caller unchanged. */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // Deterministic, non-throwing normalization (absolute + ../. collapsed):
  // getCanonicalPath can throw on I/O, and a fallback-to-raw-string key
  // would hand two committers to the same root DIFFERENT lock objects on
  // an intermittent failure — silently voiding the CAS. normalize() is
  // pure path arithmetic; symlinked aliases of one root are out of scope
  // (no caller constructs them — state roots are literal dirs the sinks
  // themselves create). THE one root-canonicalization policy: commit
  // locks here and every driver-local registry keyed by root (backfill
  // progress, watermark bumps) share it, so they can never disagree on
  // which root a path names.
  private[streaming] def normalizeRoot(root: String): String =
    new File(root).toPath.toAbsolutePath.normalize.toString
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(normalizeRoot(root), _ => new Object)

  /** Test hook: simulate a crash after state files are written but before
    * the manifest flip (the window the protocol must make safe). */
  @volatile private[streaming] var failBeforeCommit: Boolean = false

  /** Current manifest entries; empty map if no state was ever committed. */
  def load(root: String): Map[String, String] = {
    val f = new File(root, ManifestName)
    if (!f.exists()) Map.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().filter(_.contains('=')).map { l =>
        val i = l.indexOf('=')
        l.substring(0, i) -> l.substring(i + 1)
      }.toMap
      finally src.close()
    }
  }

  /** Atomically publish `entries` as the new manifest, then sweep every
    * version directory no retained snapshot references (previous versions
    * and crash orphans).
    *
    * `retain` > 1 keeps the newest `retain` committed manifests as
    * immutable `snap-<seq>` files (written AFTER the flip — the manifest
    * rename is always the one real commit, snapshots are its history), and
    * the sweep spares every directory any retained snapshot still points
    * at: [[loadSnapshot]] then reads a prior state version directly — the
    * table-format time-travel/snapshot-isolation shape, with retention as
    * the GC horizon. `retain = 1` (default) keeps history = current and
    * sweeps exactly as before. */
  def commit(root: String, entries: Map[String, String], retain: Int = 1): Unit =
    lockFor(root).synchronized { doCommit(root, entries, retain) }

  /** Compare-and-swap commit: publishes `entries` ONLY if the current
    * manifest still equals `expected` (what the caller loaded before
    * computing its rewrite), else throws [[ConcurrentCommitException]].
    * The compare and the flip happen under the root's commit lock, so a
    * concurrent commit cannot land between them — the recheck-to-commit
    * window an optimistic pre-commit re-load leaves open is closed.
    * Callers whose rewrite derives from a loaded manifest (retirement,
    * backfill merges racing a retirement) use this; append-only or
    * single-writer callers keep plain [[commit]]. */
  def commitIf(root: String, entries: Map[String, String],
      expected: Map[String, String], retain: Int = 1): Unit =
    lockFor(root).synchronized {
      val found = load(root)
      if (found != expected)
        throw new ConcurrentCommitException(root, expected, found)
      doCommit(root, entries, retain)
    }

  private def doCommit(root: String, entries: Map[String, String], retain: Int): Unit = {
    val rootF = new File(root)
    rootF.mkdirs()
    if (failBeforeCommit)
      throw new IllegalStateException("injected crash before manifest commit")
    val body = entries.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(rootF.toPath, ".manifest", ".tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, rootF.toPath.resolve(ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // snapshot AFTER the commit point: a crash here costs history, never
    // the committed state (and never exposes an uncommitted one)
    val seq = snapshots(root).lastOption.getOrElse(0L) + 1
    val stmp = Files.createTempFile(rootF.toPath, ".snap", ".tmp")
    Files.writeString(stmp, body)
    Files.move(stmp, rootF.toPath.resolve(s"$SnapPrefix$seq"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val keep = snapshots(root).takeRight(math.max(1, retain))
    snapshots(root).filterNot(keep.contains)
      .foreach(s => new File(rootF, s"$SnapPrefix$s").delete())
    val live = entries.values.toSet ++
      keep.flatMap(s => loadSnapshot(root, s).values)
    Option(rootF.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(VersionPrefix))
      .filterNot(d => live.contains(d.getName))
      .foreach(deleteRecursively)
  }

  /** Committed snapshot sequence numbers still retained, oldest first. */
  def snapshots(root: String): Seq[Long] =
    Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith(SnapPrefix))
      .map(_.getName.stripPrefix(SnapPrefix).toLong).sorted.toSeq

  /** Manifest entries of retained snapshot `seq` (time-travel read). */
  def loadSnapshot(root: String, seq: Long): Map[String, String] = {
    val f = new File(root, s"$SnapPrefix$seq")
    require(f.exists(), s"snapshot $seq not retained under $root")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().filter(_.contains('=')).map { l =>
      val i = l.indexOf('=')
      l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    finally src.close()
  }

  /** Fresh (never-reused) version directory name for a logical state name. */
  def newVersion(name: String): String =
    s"$VersionPrefix$name-${java.util.UUID.randomUUID().toString.take(12)}"

  private[streaming] def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
