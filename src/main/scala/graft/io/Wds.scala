package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WEBDATASET-STYLE TAR SHARDS — the multimodal training-export
  * convention (Aizman et al., "High Performance I/O For Large Scale
  * Deep Learning"; the public webdataset format): samples are grouped
  * into POSIX tar files, one sample = consecutive entries sharing a
  * basename key with per-modality extensions
  * (`<key>.png` + `<key>.txt` + `<key>.json`), so a trainer streams
  * whole shards sequentially — the I/O pattern object stores and
  * disks like — and never pays a per-sample open.
  *
  * The tar writer is self-contained (POSIX ustar headers, checksum,
  * 512-byte padding, two-zero-block trailer, mtime pinned to 0 so a
  * re-export is BYTE-IDENTICAL) — no external archive library.
  *
  * Scale shape: rows carry a `shard` column (the engine's md5 bucket
  * convention — deterministic, engine-independent); `repartition(n,
  * shard)` co-locates each shard in one task and
  * `sortWithinPartitions(shard, key)` lets the writer STREAM entries
  * in key order, opening one file per shard as the iterator crosses a
  * shard boundary — constant memory per task, no driver data, no
  * collect.
  */
object Wds {

  private val NUL = 0.toChar.toString

  /** One POSIX ustar header block. Deterministic: mode 0644, uid/gid
    * 0, mtime 0 — two exports of the same rows are byte-identical.
    */
  private[graft] def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100,
      s"tar entry name exceeds the ustar 100-byte field: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644" + NUL)          // mode
    put(108, "0000000" + NUL)          // uid
    put(116, "0000000" + NUL)          // gid
    put(124, f"$size%011o" + " ")      // size, octal
    put(136, "00000000000 ")           // mtime 0
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces while summing
    h(156) = '0'                       // regular file
    put(257, "ustar" + NUL)            // POSIX magic
    put(263, "00")                     // version
    val sum = h.map(_ & 0xff).sum
    put(148, f"$sum%06o" + NUL + " ")
    h
  }

  private def writeEntry(out: java.io.OutputStream,
                         name: String, bytes: Array[Byte]): Unit = {
    out.write(header(name, bytes.length.toLong))
    out.write(bytes)
    val pad = (512 - (bytes.length % 512)) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Parse a tar produced by this writer (or any ustar tar of regular
    * files) back to (name, bytes) — the verification side for specs
    * and audits.
    */
  def readTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    // Long offsets throughout: an Int accumulator wraps past 2 GiB of
    // cumulative shard bytes and would silently truncate the member
    // list; a single member larger than the in-memory array this
    // reader takes fails loudly instead of mis-slicing.
    var off = 0L
    while (off + 512 <= bytes.length && bytes(off.toInt) != 0) {
      val name = new String(bytes, off.toInt, 100, "UTF-8")
        .takeWhile(_ != 0.toChar)
      val size = java.lang.Long.parseLong(
        new String(bytes, off.toInt + 124, 12, "UTF-8")
          .takeWhile(c => c >= '0' && c <= '7'), 8)
      require(off + 512 + size <= bytes.length,
        s"tar member $name claims $size bytes past the archive end")
      val data = java.util.Arrays.copyOfRange(
        bytes, off.toInt + 512, (off + 512 + size).toInt)
      out += ((name, data))
      off += 512 + ((size + 511) / 512) * 512
    }
    out.toSeq
  }

  /** Write `rows` as tar shards under `outDir`, one
    * `shard-NNNNN.tar` per distinct value of `shardCol`. Each row
    * contributes its entries consecutively, rows ordered by
    * (`shardCol`, `keyCol`) inside the shard. Returns
    * (shard, n_samples, n_bytes) per shard, collected — shard-count
    * sized, never row-sized.
    *
    * `entryCols` maps column names to entry-name suffixes; a NULL
    * column value skips that entry for the row (a text-less image
    * sample simply has no .txt member). Binary columns are written
    * raw; string columns as UTF-8.
    *
    * Commit protocol (task-retry/speculation-safe): each attempt
    * streams into `shard-NNNNN.tar.tmp-<taskAttemptId>` and commits by
    * atomic rename onto the final name only after the trailer is
    * written. A final-named shard is therefore always complete; a
    * failed attempt deletes its tmp and leaves nothing final-named; a
    * speculative duplicate attempt writes its OWN tmp and its rename
    * replaces the twin's byte-identical bytes (the writer is
    * deterministic: mtime 0, fixed order). The export job you run with
    * speculation on at 100 TB must never corrupt a shard a reader
    * would trust.
    */
  def writeShards(spark: SparkSession, rows: DataFrame, shardCol: String,
                  keyCol: String, entryCols: Seq[(String, String)],
                  outDir: String, nShards: Int): Seq[(Long, Long, Long)] =
    // the whole export holds the outDir lease: the stale-tmp sweep
    // below deletes in-flight tmp files indiscriminately, so two
    // concurrent exports sharing an outDir would sweep each other and
    // fail at commit rename — the lease makes "no concurrent export
    // shares an outDir mid-job" an enforced invariant, not an
    // assumption. HEARTBEAT-kept: a 100 TB export legitimately runs
    // past the 30-min staleness window, and without the beat a second
    // export would judge the live lease crashed, take it over, and
    // sweep the first's in-flight tmp files; a truly crashed export
    // still goes stale within staleMs of its last beat.
    Tables.withTableLock(outDir, heartbeatMs = 60 * 1000L) {
      writeShardsLocked(spark, rows, shardCol, keyCol, entryCols, outDir,
                        nShards)
    }

  private def writeShardsLocked(spark: SparkSession, rows: DataFrame,
                                shardCol: String, keyCol: String,
                                entryCols: Seq[(String, String)],
                                outDir: String, nShards: Int)
      : Seq[(Long, Long, Long)] = {
    import spark.implicits._
    new java.io.File(outDir).mkdirs()
    // Stale-tmp sweep: a task's finally removes its own tmp on
    // IN-PROCESS failure, but a hard-killed JVM leaves
    // shard-N.tar.tmp-<attemptId> residue, and re-exports commit under
    // NEW attempt ids — without this sweep the dir accumulates dead
    // tmp files forever. Safe at job start: the outDir lease above
    // guarantees no concurrent export shares this dir mid-job
    // (final-named shards are never touched).
    Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("shard-") &&
                   f.getName.contains(".tar.tmp-"))
      .foreach(_.delete())
    val cols = col(shardCol).cast("long") +:
      (keyCol +: entryCols.map(_._1)).map(col)
    val suffixes = entryCols.map(_._2)
    val dir = outDir
    val shards = rows.select(cols: _*)
      .repartition(nShards, col(shardCol))
      .sortWithinPartitions(col(shardCol), col(keyCol))
      .mapPartitions { it =>
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val stats = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var cur: Long = -1L
        var out: java.io.FileOutputStream = null
        var tmp: java.io.File = null
        var n = 0L; var b = 0L
        // Finish the current shard: trailer, close, THEN the atomic
        // rename that makes it visible under its final name.
        def commit(): Unit = if (out != null) {
          out.write(new Array[Byte](1024)) // tar trailer
          out.close()
          out = null
          java.nio.file.Files.move(
            tmp.toPath,
            new java.io.File(dir, f"shard-$cur%05d.tar").toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          tmp = null
          stats += ((cur, n, b + 1024L))
        }
        try {
          it.foreach { row =>
            val shard = row.getLong(0)
            if (shard != cur) {
              commit()
              cur = shard; n = 0L; b = 0L
              tmp = new java.io.File(dir, f"shard-$shard%05d.tar.tmp-$attempt")
              out = new java.io.FileOutputStream(tmp)
            }
            val key = row.get(1).toString
            suffixes.zipWithIndex.foreach { case (suffix, i) =>
              if (!row.isNullAt(2 + i)) {
                val bytes = row.get(2 + i) match {
                  case a: Array[Byte] => a
                  case s: String => s.getBytes("UTF-8")
                  case other => other.toString.getBytes("UTF-8")
                }
                writeEntry(out, s"$key.$suffix", bytes)
                b += 512L + ((bytes.length + 511L) / 512L) * 512L
              }
            }
            n += 1L
          }
          commit()
        } finally {
          // Failure path only (success leaves out/tmp null): close the
          // stream and remove the partial tmp so nothing with this
          // attempt's name survives to be mistaken for a shard.
          if (out != null) {
            try out.close() catch { case _: java.io.IOException => () }
            out = null
          }
          if (tmp != null) { tmp.delete(); tmp = null }
        }
        stats.iterator
      }.collect().toSeq.sortBy(_._1)
    shards
  }
}
