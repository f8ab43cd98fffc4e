package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.io.Tables

/** The store-swap concurrency guard (SURVEY §7.4.3): without a lease,
  * two writers that both read the live snapshot, merge their own rows,
  * and swap lose the first writer's rows at the second writer's
  * commit. `Tables.withTableLock` serializes the whole read-merge-swap;
  * these cases pin (1) no lost updates under real interleaved writers
  * through the REAL `Main.writeTable` path, (2) mutual exclusion and
  * release of the lease primitive itself, and (3) stale-lease takeover.
  */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("two interleaved writers through Main.writeTable: no lost update") {
    val store = Files.createTempDirectory("graft_lock_store").toString
    // seed the table so both writers take the read-merge path
    Main.writeTable(spark, Seq(("seed", 0L)).toDF("k", "v"), store, "t",
                    keys = Seq("k"), version = Seq(lit(1)))
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to 2).foreach { i =>
      pool.execute { () =>
        try {
          start.await()
          // each writer upserts a DISJOINT key; unguarded, the loser's
          // row vanishes when the winner swaps its own merged snapshot
          Main.writeTable(spark, Seq((s"w$i", i.toLong)).toDF("k", "v"),
                          store, "t", keys = Seq("k"), version = Seq(lit(1)))
        } catch { case t: Throwable => failures.add(t) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "writers hung")
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")
    val got = spark.read.parquet(s"$store/t.parquet")
      .select($"k").as[String].collect().toSet
    assert(got == Set("seed", "w1", "w2"), s"lost update: $got")
    // the lease is released after the last commit
    assert(!new java.io.File(s"$store/t.parquet.lock").exists())
  }

  test("two full concurrent ingests against one store: commits serialize on the store lease, both batches land, fsck clean") {
    // the .store lease's real job — the case the single-table writer
    // test above cannot cover: two whole multi-table ingest
    // transactions racing. The lease primitive is a marker file plus a
    // kernel-held micro-guard, so two threads exercise exactly the
    // path two PROCESSES take (in-JVM overlap surfaces as the same
    // busy-retry, Tables.underLockGuard doc).
    val now1 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    val now2 = java.sql.Timestamp.valueOf("2025-06-02 12:00:00")
    def mkIn(docs: (String, String)*): String = {
      val in = Files.createTempDirectory("graft_race_in").toFile
      docs.foreach { case (n, t) =>
        Files.write(new java.io.File(in, n).toPath, t.getBytes("UTF-8"))
      }
      in.toString
    }
    // clearly-distinct docs: the end state is order-independent, so
    // either serialization order must equal the sequential control
    val in1 = mkIn("a.txt" -> "spark query engine performance tuning guide",
                   "b.txt" -> "watermark lateness checkpoint recovery streaming")
    val in2 = mkIn("c.txt" -> "distributed shuffle partitioning strategies at scale",
                   "d.txt" -> "vector cell balancing and probe budgeting notes")
    def state(store: String): (Seq[(String, String)], Long, Long) = (
      spark.read.parquet(s"$store/documents.parquet")
        .select("doc_id", "status").as[(String, String)].collect().toSeq.sorted,
      spark.read.parquet(s"$store/chunks.parquet").count(),
      spark.read.parquet(s"$store/embeddings.parquet").count())
    val control = Files.createTempDirectory("graft_race_ctl").toString
    Main.runIngest(spark, in1, control, "nomic", now1)
    Main.runIngest(spark, in2, control, "nomic", now2)
    val want = state(control)

    val store = Files.createTempDirectory("graft_race_store").toString
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    Seq((in1, now1), (in2, now2)).foreach { case (in, ts) =>
      pool.execute { () =>
        try { start.await(); Main.runIngest(spark, in, store, "nomic", ts) }
        catch { case t: Throwable => failures.add(t) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "ingests hung")
    assert(failures.isEmpty, s"concurrent ingest failed: ${failures.peek()}")
    assert(state(store) == want,
      "both racing batches must land exactly as the sequential control")
    val (lines, nViol) = Main.runFsck(spark, store)
    assert(nViol == 0L, lines.mkString("\n"))
    // every lease released
    val locks = new java.io.File(store).list().filter(_.endsWith(".lock"))
    assert(locks.isEmpty, s"leaked leases: ${locks.mkString(",")}")
  }

  test("a delete racing a re-ingest of the SAME doc id: exactly the serial outcomes — ingested-then-deleted, or deleted-then-blocked by the tombstone gate — fsck clean either way") {
    // both commands serialize on the .store lease (Main.scala ingest +
    // runDelete); this pins that the race has NO third outcome: no
    // half-deleted doc, no resurrected content, no wedged lease
    val now1 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    val now2 = java.sql.Timestamp.valueOf("2025-06-02 12:00:00")
    val delAt = java.sql.Timestamp.valueOf("2025-06-03 12:00:00")
    val in = Files.createTempDirectory("graft_dirace_in").toFile
    Seq("a.txt" -> "spark query engine performance tuning guide",
        "b.txt" -> "watermark lateness checkpoint recovery streaming")
      .foreach { case (n, t) =>
        Files.write(new java.io.File(in, n).toPath, t.getBytes("UTF-8")) }
    val store = Files.createTempDirectory("graft_dirace_store").toString
    Main.runIngest(spark, in.toString, store, "nomic", now1)
    val byName = spark.read.parquet(s"$store/documents.parquet")
      .select($"filename", $"doc_id").as[(String, String)].collect().toMap
    val (aId, bId) = (byName("a.md"), byName("b.md"))

    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    pool.execute { () =>
      try { start.await(); Main.runIngest(spark, in.toString, store, "nomic", now2) }
      catch { case t: Throwable => failures.add(t) }
    }
    pool.execute { () =>
      try { start.await(); Main.runDelete(spark, store, aId, delAt) }
      catch { case t: Throwable => failures.add(t) }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "race hung")
    assert(failures.isEmpty, s"racer failed: ${failures.peek()}")
    // BOTH serial orders converge on the same observable state:
    // ingest-then-delete re-lands the doc and then tombstones it;
    // delete-then-ingest tombstones it and the gate drops the upload
    val a = spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === aId).select($"status", $"content_b64").collect()
    assert(a.length == 1 && a.head.getString(0) == "removed"
             && a.head.isNullAt(1),
      s"deleted doc must end tombstoned either way: ${a.toSeq}")
    assert(spark.read.parquet(s"$store/chunks.parquet")
      .filter($"doc_id" === aId).count() == 0L)
    assert(spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"chunk_id".startsWith(aId)).count() == 0L)
    // the undeleted doc survives whichever order won
    assert(spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === bId).select($"status").as[String].head()
      == "completed")
    val (lines, nViol) = Main.runFsck(spark, store)
    assert(nViol == 0L, lines.mkString("\n"))
    val locks = new java.io.File(store).list().filter(_.endsWith(".lock"))
    assert(locks.isEmpty, s"leaked leases: ${locks.mkString(",")}")
    // the tombstone gate keeps holding after the race
    Main.runIngest(spark, in.toString, store, "nomic",
                   java.sql.Timestamp.valueOf("2025-06-04 12:00:00"))
    assert(spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === aId).select($"status").as[String].head()
      == "removed", "resurrection blocked after the race")
  }

  test("delete --scrub-snapshots racing a rollback: the postcheck detects the resurrected id and fails loudly; re-running the same command completes erasure") {
    // the per-snapshot completion loop re-acquires the live .store
    // lease between snapshots, so a rollback can land pre-delete
    // content live MID-COMMAND — the exact window runDelete's
    // rollback-race postcheck guards. Interleaved deterministically:
    // Faults.hookOnce runs the rollback at the committed-live-delete
    // point on the command's own thread (no sleeps, no real threads).
    val now1 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    val delAt = java.sql.Timestamp.valueOf("2025-06-02 12:00:00")
    val in = Files.createTempDirectory("graft_rbrace_in").toFile
    Seq("a.txt" -> "confidential saiga rollback race subject text",
        "b.txt" -> "watermark lateness checkpoint recovery streaming")
      .foreach { case (n, t) =>
        Files.write(new java.io.File(in, n).toPath, t.getBytes("UTF-8")) }
    val store = Files.createTempDirectory("graft_rbrace_store").toString
    Main.runIngest(spark, in.toString, store, "nomic", now1)
    graft.io.Snapshots.create(store, "s1")
    val snapRoot = s"$store/.snapshots/s1"
    val aId = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "a.md").select($"doc_id").as[String].head()
    def status(root: String): String = spark.read
      .parquet(s"$root/documents.parquet")
      .filter($"doc_id" === aId).select($"status").as[String].head()
    graft.io.Faults.hookOnce("delete.after-live-commit") {
      graft.io.Snapshots.restore(store, "s1")
    }
    try {
      val e = intercept[IllegalStateException] {
        Main.runDelete(spark, store, Seq(aId), delAt,
                       purgeSnapshots = false, scrubSnapshots = true)
      }
      assert(e.getMessage.contains("resurrected") &&
        e.getMessage.contains(aId), e.getMessage)
    } finally graft.io.Faults.reset()
    // the command did NOT end silently green: the snapshot's own scrub
    // landed (its root is erased), while the live store carries the
    // rolled-back pre-delete copy the postcheck detected
    assert(status(snapRoot) == "removed", "the snapshot scrub itself landed")
    assert(status(store) != "removed", "the rollback won the live store")
    // the documented recovery: the SAME command re-run. The live
    // transaction re-deletes; the scrubbed snapshot no longer holds
    // the id, so the completion has nothing left to do.
    val report = Main.runDelete(spark, store, Seq(aId),
      java.sql.Timestamp.valueOf("2025-06-03 12:00:00"),
      purgeSnapshots = false, scrubSnapshots = true)
    assert(report.last.contains(""""snapshots_scrubbed":[]"""), report.last)
    assert(status(store) == "removed")
    assert(spark.read.parquet(s"$store/chunks.parquet")
      .filter($"doc_id" === aId).count() == 0L)
    val (lines, nViol) = Main.runFsck(spark, store, snapshots = true)
    assert(nViol == 0L, lines.mkString("\n"))
    val locks = new java.io.File(store).list().filter(_.endsWith(".lock"))
    assert(locks.isEmpty, s"leaked leases: ${locks.mkString(",")}")
  }

  test("delete --purge-snapshots racing a rollback: the postcheck detects the resurrected id; re-running completes erasure with no snapshots left") {
    // the purge twin of the scrub race above: the rollback lands after
    // the live commit, the purge loop still drops the snapshot, and
    // without the postcheck the command would end green over a live
    // store carrying the rolled-back pre-delete copy.
    val now1 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    val delAt = java.sql.Timestamp.valueOf("2025-06-02 12:00:00")
    val in = Files.createTempDirectory("graft_prace_in").toFile
    Seq("a.txt" -> "confidential markhor purge rollback race subject text",
        "b.txt" -> "watermark lateness checkpoint recovery streaming")
      .foreach { case (n, t) =>
        Files.write(new java.io.File(in, n).toPath, t.getBytes("UTF-8")) }
    val store = Files.createTempDirectory("graft_prace_store").toString
    Main.runIngest(spark, in.toString, store, "nomic", now1)
    graft.io.Snapshots.create(store, "s1")
    val aId = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "a.md").select($"doc_id").as[String].head()
    def liveStatus(): String = spark.read
      .parquet(s"$store/documents.parquet")
      .filter($"doc_id" === aId).select($"status").as[String].head()
    graft.io.Faults.hookOnce("delete.after-live-commit") {
      graft.io.Snapshots.restore(store, "s1")
    }
    try {
      val e = intercept[IllegalStateException] {
        Main.runDelete(spark, store, Seq(aId), delAt,
                       purgeSnapshots = true)
      }
      assert(e.getMessage.contains("resurrected") &&
        e.getMessage.contains(aId), e.getMessage)
    } finally graft.io.Faults.reset()
    // the purge itself landed (erasure of history completed) while the
    // live store carries the rolled-back pre-delete copy the postcheck
    // refused to end green over
    assert(graft.io.Snapshots.list(store).isEmpty,
      "the purge dropped the snapshot before the postcheck fired")
    assert(liveStatus() != "removed", "the rollback won the live store")
    // the documented recovery: the SAME command re-run. The live
    // transaction re-deletes the rolled-back copy; no snapshots remain
    // to hold anything.
    val report = Main.runDelete(spark, store, Seq(aId),
      java.sql.Timestamp.valueOf("2025-06-03 12:00:00"),
      purgeSnapshots = true)
    assert(report.last.contains(""""snapshots_purged":[]"""), report.last)
    assert(liveStatus() == "removed")
    assert(spark.read.parquet(s"$store/chunks.parquet")
      .filter($"doc_id" === aId).count() == 0L)
    val (lines, nViol) = Main.runFsck(spark, store, snapshots = true)
    assert(nViol == 0L, lines.mkString("\n"))
    val locks = new java.io.File(store).list().filter(_.endsWith(".lock"))
    assert(locks.isEmpty, s"leaked leases: ${locks.mkString(",")}")
  }

  test("delete --scrub-snapshots with a concurrent ingest landing after the live commit: the completion preserves the new doc and ends green") {
    // the benign twin of the rollback races above: the completion
    // loops re-acquire the live lease per snapshot, so OTHER writers
    // legitimately interleave mid-command — a new doc landing in that
    // window must survive the completion (the loops touch only
    // snapshot roots; the postcheck is read-only) and must not trip
    // the resurrection detector (it is a different id).
    val now1 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    val delAt = java.sql.Timestamp.valueOf("2025-06-02 12:00:00")
    val in = Files.createTempDirectory("graft_irace_in").toFile
    Seq("a.txt" -> "confidential serow ingest race completion subject",
        "b.txt" -> "watermark lateness checkpoint recovery streaming")
      .foreach { case (n, t) =>
        Files.write(new java.io.File(in, n).toPath, t.getBytes("UTF-8")) }
    val store = Files.createTempDirectory("graft_irace_store").toString
    Main.runIngest(spark, in.toString, store, "nomic", now1)
    graft.io.Snapshots.create(store, "s1")
    val snapRoot = s"$store/.snapshots/s1"
    def docRow(root: String, fn: String) = spark.read
      .parquet(s"$root/documents.parquet").filter($"filename" === fn)
    val aId = docRow(store, "a.md").select($"doc_id").as[String].head()
    graft.io.Faults.hookOnce("delete.after-live-commit") {
      val in2 = Files.createTempDirectory("graft_irace_in2").toFile
      Files.write(new java.io.File(in2, "c.txt").toPath,
        "fresh arrival during the completion window".getBytes("UTF-8"))
      Main.runIngest(spark, in2.toString, store, "nomic",
        java.sql.Timestamp.valueOf("2025-06-02 12:30:00"))
    }
    try {
      val report = Main.runDelete(spark, store, Seq(aId), delAt,
                                  purgeSnapshots = false,
                                  scrubSnapshots = true)
      assert(report.last.contains(""""snapshots_scrubbed":["s1"]"""),
        report.last)
    } finally graft.io.Faults.reset()
    // the command ended green AND the mid-command ingest survives it
    assert(docRow(store, "a.md").select($"status").as[String].head()
      == "removed")
    assert(docRow(store, "c.md").select($"status").as[String].head()
      == "completed", "the concurrent ingest's doc must survive the completion")
    // the snapshot predates the new doc: scrubbed of a, no trace of c
    assert(docRow(snapRoot, "a.md").select($"status").as[String].head()
      == "removed")
    assert(docRow(snapRoot, "c.md").count() == 0L)
    val (lines, nViol) = Main.runFsck(spark, store, snapshots = true)
    assert(nViol == 0L, lines.mkString("\n"))
    val locks = new java.io.File(store).list().filter(_.endsWith(".lock"))
    assert(locks.isEmpty, s"leaked leases: ${locks.mkString(",")}")
  }

  test("a snapshot created between the live commit and the completion captures only post-delete state and cannot resurrect") {
    // the other benign interleave: `snapshot` lands mid-command. The
    // holding audit was computed under the transaction lease, so the
    // new snapshot is invisible to the completion loop — and correctly
    // so: created after the commit point it holds only the tombstone,
    // so it needs no scrub and a rollback to it cannot resurrect.
    val now1 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    val delAt = java.sql.Timestamp.valueOf("2025-06-02 12:00:00")
    val in = Files.createTempDirectory("graft_srace_in").toFile
    Seq("a.txt" -> "confidential takin snapshot race completion subject",
        "b.txt" -> "watermark lateness checkpoint recovery streaming")
      .foreach { case (n, t) =>
        Files.write(new java.io.File(in, n).toPath, t.getBytes("UTF-8")) }
    val store = Files.createTempDirectory("graft_srace_store").toString
    Main.runIngest(spark, in.toString, store, "nomic", now1)
    graft.io.Snapshots.create(store, "s1")
    val aId = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "a.md").select($"doc_id").as[String].head()
    def status(root: String): String = spark.read
      .parquet(s"$root/documents.parquet")
      .filter($"doc_id" === aId).select($"status").as[String].head()
    graft.io.Faults.hookOnce("delete.after-live-commit") {
      graft.io.Snapshots.create(store, "s2")
    }
    try {
      val report = Main.runDelete(spark, store, Seq(aId), delAt,
                                  purgeSnapshots = false,
                                  scrubSnapshots = true)
      // only the PRE-delete snapshot needed scrubbing
      assert(report.last.contains(""""snapshots_scrubbed":["s1"]"""),
        report.last)
    } finally graft.io.Faults.reset()
    assert(status(s"$store/.snapshots/s1") == "removed")
    assert(status(s"$store/.snapshots/s2") == "removed",
      "a snapshot created after the commit captures the tombstone")
    // a rollback to the mid-command snapshot cannot resurrect: the
    // tombstone rode into it
    graft.io.Snapshots.restore(store, "s2")
    assert(status(store) == "removed")
    val (lines, nViol) = Main.runFsck(spark, store, snapshots = true)
    assert(nViol == 0L, lines.mkString("\n"))
  }

  test("withTableLock: mutual exclusion, queued contender proceeds on release") {
    val path = Files.createTempDirectory("graft_lock_prim").toString + "/tbl"
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(4)
    (1 to 4).foreach { _ =>
      pool.execute { () =>
        Tables.withTableLock(path) {
          val now = inside.incrementAndGet()
          maxInside.updateAndGet(m => math.max(m, now))
          Thread.sleep(100)
          inside.decrementAndGet()
        }
      }
    }
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS), "contenders hung")
    assert(maxInside.get() == 1, s"critical section overlapped: ${maxInside.get()}")
    assert(!new java.io.File(s"$path.lock").exists(), "lease not released")
  }

  test("withTableLock: release/acquire churn never overlaps (stress)") {
    // the historical race lived in the release window: a contender that
    // caught lastModified()==0 between a failed create and the holder's
    // delete misread the vanished lock as infinitely stale and renamed
    // away the NEXT holder's fresh lease — many short cycles per thread
    // maximize that window
    val path = Files.createTempDirectory("graft_lock_churn").toString + "/tbl"
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(8)
    (1 to 8).foreach { _ =>
      pool.execute { () =>
        (1 to 12).foreach { _ =>
          Tables.withTableLock(path) {
            val now = inside.incrementAndGet()
            maxInside.updateAndGet(m => math.max(m, now))
            Thread.sleep(2)
            inside.decrementAndGet()
          }
        }
      }
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "contenders hung")
    assert(maxInside.get() == 1, s"critical section overlapped: ${maxInside.get()}")
    assert(!new java.io.File(s"$path.lock").exists(), "lease not released")
  }

  test("withTableLock: a stale lease (crashed holder) is taken over; a live one is honored") {
    val path = Files.createTempDirectory("graft_lock_stale").toString + "/tbl"
    val lock = new java.io.File(s"$path.lock")
    assert(lock.createNewFile())
    // a crashed holder's lease: mtime far in the past
    assert(lock.setLastModified(System.currentTimeMillis() - 60 * 60 * 1000L))
    var ran = false
    Tables.withTableLock(path, staleMs = 1000L, timeoutMs = 5000L) { ran = true }
    assert(ran, "stale lease must be taken over")
    assert(!lock.exists())
    // a LIVE lease (fresh mtime) must block until timeout
    assert(lock.createNewFile())
    val t0 = System.currentTimeMillis()
    intercept[IllegalStateException] {
      Tables.withTableLock(path, staleMs = 60 * 1000L, timeoutMs = 500L) { () }
    }
    assert(System.currentTimeMillis() - t0 >= 500L, "must wait out the timeout")
    lock.delete()
  }

  test("withTableLock heartbeat: a slow-but-live holder outlasts staleMs and is never taken over; without the beat it is") {
    val path = Files.createTempDirectory("graft_lock_beat").toString + "/tbl"
    // WITH heartbeat: the holder runs 4× past staleMs, beats keep the
    // lease fresh, so a contender arriving mid-body times out loudly
    // instead of stealing the lease (the long-export contract)
    @volatile var stolen = false
    val holder = new Thread(() =>
      Tables.withTableLock(path, staleMs = 400L, timeoutMs = 2000L,
                           heartbeatMs = 100L) {
        Thread.sleep(1600L)
      })
    holder.start()
    Thread.sleep(300L) // the holder owns the lease by now
    try
      Tables.withTableLock(path, staleMs = 400L, timeoutMs = 700L) {
        stolen = true
      }
    catch { case _: IllegalStateException => () }
    holder.join(5000L)
    assert(!stolen, "a heartbeat-fresh lease must never be taken over")
    assert(!new java.io.File(s"$path.lock").exists(),
      "the holder must release its own lease on exit")
    // WITHOUT heartbeat the same timings DO hand the lease over — the
    // staleness recovery the beat deliberately suspends
    val path2 = Files.createTempDirectory("graft_lock_beat2").toString + "/tbl"
    @volatile var took = false
    val holder2 = new Thread(() =>
      Tables.withTableLock(path2, staleMs = 400L, timeoutMs = 2000L) {
        Thread.sleep(1600L)
      })
    holder2.start()
    Thread.sleep(600L) // past staleMs with no beat
    Tables.withTableLock(path2, staleMs = 400L, timeoutMs = 2000L) {
      took = true
    }
    holder2.join(5000L)
    assert(took, "a beat-less lease past staleMs is taken over (crash recovery)")
  }
}
