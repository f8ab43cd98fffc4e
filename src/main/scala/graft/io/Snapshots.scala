package graft.io

import java.io.File
import java.nio.file.Files

/** STORE SNAPSHOT / ROLLBACK — poor-man's time travel for the swap-
  * committed store: every writer in this engine lands data as NEW
  * files and commits by directory rename (never an in-place byte
  * edit), so a HARDLINK copy of the store's files is a consistent,
  * immutable point-in-time snapshot at near-zero cost — later
  * compactions and removals unlink the old inodes from the live tree,
  * but the snapshot's links keep them alive. This is the single-
  * filesystem analogue of a table-format snapshot (Iceberg/Delta keep
  * a manifest of immutable files; we keep the links themselves), and
  * the ops answer to "an ingest went wrong, put the store back".
  *
  * Scope and caveats (documented, not hidden): snapshots live under
  * `store/.snapshots/<name>` on the SAME filesystem (hardlink
  * requirement); transient `.lock` / `.tmp` / `.trash` entries are not
  * part of a snapshot. Exclusion is two-level and REAL, not advisory:
  * the `.store` lease serializes snapshot ops against the multi-table
  * transactions that honor it (the ingest commit and fsck --repair
  * hold it end to end), and each entry's own table lease — held across
  * the whole walk — excludes the single-table maintenance swaps
  * (compact, postings/vector index maintenance), so no entry is ever
  * captured or parked mid-aside-rename. Sidecar writers must REPLACE,
  * never truncate (VectorIndex.writeMeta's tmp+atomic-move) — an
  * in-place write to a hardlinked inode would rewrite history.
  */
object Snapshots {

  private def isTransient(name: String): Boolean =
    name == ".snapshots" || name == ".rollback_trash" ||
      name.endsWith(".lock") || name.endsWith(".lock.guard") ||
      name.endsWith(".tmp") || name.endsWith(".trash")

  /** Every entry point validates the name — a relative-path name like
    * ".." would otherwise resolve `.snapshots/<name>` to the store
    * root itself, turning `dropsnapshot` into "delete the store".
    */
  private def checkName(name: String): Unit =
    require(name.nonEmpty && !name.contains("/") && !name.startsWith("."),
      s"snapshot name must be a plain identifier: $name")

  /** Hold every lease in `paths` (sorted — one global order, so two
    * multi-lock holders cannot deadlock) around `body`.
    */
  private def withAllLocks[A](paths: Seq[String])(body: => A): A =
    paths.sorted.distinct
      .foldRight(() => body)((p, acc) => () => Tables.withTableLock(p)(acc()))
      .apply()

  private def walk(f: File): Seq[File] =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    else Seq(f)

  /** Hardlink-copy `src`'s tree under `dst` (dirs recreated, files
    * linked — never copied).
    */
  private def linkTree(src: File, dst: File): (Long, Long) = {
    var n = 0L; var bytes = 0L
    walk(src).foreach { f =>
      val rel = src.toPath.relativize(f.toPath)
      val target = dst.toPath.resolve(rel)
      Files.createDirectories(target.getParent)
      Files.createLink(target, f.toPath)
      n += 1L; bytes += f.length()
    }
    (n, bytes)
  }

  /** Create snapshot `name`: one hardlink per data file, a manifest
    * beside them. Returns (n_files, n_bytes). Refuses to overwrite an
    * existing snapshot (a snapshot is immutable history).
    */
  def create(storeDir: String, name: String): (Long, Long) =
    Tables.withTableLock(s"$storeDir/.store") {
      checkName(name)
      val root = new File(storeDir)
      require(root.isDirectory, s"no store at $storeDir")
      val snap = new File(root, s".snapshots/$name")
      require(!snap.exists(), s"snapshot $name already exists — immutable")
      Files.createDirectories(snap.toPath)
      // exclusion is two-level: the `.store` lease serializes against
      // the MULTI-table writers that honor it (the ingest transaction,
      // fsck --repair, other snapshot ops), and each entry's own table
      // lease — held across the WHOLE walk — excludes the single-table
      // maintenance swaps (compact, postings/vector maintenance), so
      // no entry is captured mid-aside-rename
      val entries = Option(root.listFiles()).getOrElse(Array.empty)
        .filterNot(e => isTransient(e.getName)).toSeq
      withAllLocks(entries.map(_.getPath)) {
        var n = 0L; var bytes = 0L
        entries.foreach { e =>
          val (dn, db) =
            if (e.isDirectory) linkTree(e, new File(snap, e.getName))
            else {
              Files.createLink(new File(snap, e.getName).toPath, e.toPath)
              (1L, e.length())
            }
          n += dn; bytes += db
        }
        Files.write(new File(snap, "_graft_snapshot.json").toPath,
          s"""{"name": "$name", "n_files": $n, "n_bytes": $bytes}"""
            .getBytes("UTF-8"))
        (n, bytes)
      }
    }

  /** Restore the store to snapshot `name`: the CURRENT entries park in
    * `.rollback_trash` first (crash between park and restore leaves
    * both the parked state and the intact snapshot — nothing is ever
    * the only copy), then the snapshot hardlinks back into place, then
    * the parked state drops. Snapshots taken AFTER `name` survive a
    * rollback (history is not rewritten, only the live tree).
    */
  def restore(storeDir: String, name: String): (Long, Long) =
    Tables.withTableLock(s"$storeDir/.store") {
      checkName(name)
      val root = new File(storeDir)
      val snap = new File(root, s".snapshots/$name")
      require(snap.isDirectory, s"no snapshot $name under $storeDir")
      val trash = new File(root, ".rollback_trash")
      val current = Option(root.listFiles()).getOrElse(Array.empty)
        .filterNot(e => isTransient(e.getName)).toSeq
      val restored = Option(snap.listFiles()).getOrElse(Array.empty)
        .filterNot(_.getName == "_graft_snapshot.json").toSeq
      // hold every affected entry's lease (current AND restored names)
      // for the whole park-and-relink — a single-table maintenance op
      // must never find its directory parked out from under its lease
      val leases = (current.map(_.getPath) ++
        restored.map(e => new File(root, e.getName).getPath)).distinct
      withAllLocks(leases) {
        Tables.rmTree(trash)
        Files.createDirectories(trash.toPath)
        current.foreach { e =>
          require(e.renameTo(new File(trash, e.getName)),
            s"parking $e for rollback failed")
        }
        var n = 0L; var bytes = 0L
        restored.foreach { e =>
          val (dn, db) =
            if (e.isDirectory) linkTree(e, new File(root, e.getName))
            else {
              Files.createLink(new File(root, e.getName).toPath, e.toPath)
              (1L, e.length())
            }
          n += dn; bytes += db
        }
        Tables.rmTree(trash)
        (n, bytes)
      }
    }

  /** Names of existing snapshots, sorted. */
  def list(storeDir: String): Seq[String] =
    Option(new File(storeDir, ".snapshots").listFiles())
      .getOrElse(Array.empty).toSeq.filter(_.isDirectory).map(_.getName).sorted

  /** Drop snapshot `name` — unlinks its hardlinks, so inodes shared
    * with the live tree (or other snapshots) survive and only
    * snapshot-exclusive bytes are reclaimed. Under the same writer
    * lease as create/restore.
    */
  def drop(storeDir: String, name: String): Unit =
    Tables.withTableLock(s"$storeDir/.store") {
      checkName(name)
      val snap = new File(storeDir, s".snapshots/$name")
      require(snap.isDirectory, s"no snapshot $name under $storeDir")
      Tables.rmTree(snap)
    }
}
