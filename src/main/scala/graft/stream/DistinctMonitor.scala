package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** LIVE DISTINCT-COUNT monitoring — the streaming twin of the batch
  * cumulative curve (q173, [[graft.text.Profile.cumulativeDistinct]]):
  * "how many distinct users/keys has this stream seen so far", per
  * scope, emitted after every micro-batch.
  *
  * Exact streaming distinct needs state proportional to the key
  * cardinality — unbounded, the thing Structured Streaming state must
  * never be. The HLL register sketch is the correct state: ≤ m=256
  * (bucket → max rho) entries per scope FOREVER, merged by max (so
  * micro-batch order cannot matter), and the estimate replays the
  * EXACT integer algebra of [[graft.text.Profile.distinctSketch]] —
  * the stream's running answer is bit-identical to re-sketching
  * everything it has seen in one batch (spec-pinned), which is the
  * mergeability contract the batch/stream boundary needs.
  *
  * Scale posture: state is 256 longs per scope, partitioned by scope
  * and checkpointed by Structured Streaming; each micro-batch pays one
  * md5 per arrival and a map-max merge. No distinct shuffle, no key
  * set, no growth.
  */
object DistinctMonitor {

  /** One stream arrival: a scope (dashboard key — source, tenant,
    * day…) and the key whose cardinality is being tracked.
    */
  case class Arrival(scope: String, key: String)

  /** Emitted per scope per micro-batch: the register estimate beside
    * the raw arrival count (n_seen − est ≈ duplicate mass, the same
    * read as the batch truth-next-to-estimate convention).
    */
  case class DistinctEstimate(scope: String, registers_used: Long,
                              est_distinct: Long, n_seen: Long)

  /** The register update for one key — the driver-side twin of the md5
    * bit recipe in [[graft.text.Profile.distinctSketch]]: bucket =
    * first md5 byte, rho = 33 − bitlength of the next 32 md5 bits (33
    * when zero).
    */
  private[stream] def registerOf(key: String): (Int, Long) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bucket = Integer.parseInt(hex.substring(0, 2), 16)
    val v = java.lang.Long.parseLong(hex.substring(2, 10), 16)
    val rho = if (v == 0L) 33L else 33L - (64 - java.lang.Long.numberOfLeadingZeros(v))
    (bucket, rho)
  }

  /** Pure fold, unit-testable: merge a batch of keys into the register
    * state by per-bucket max — merge-order-independent, so any
    * micro-batching of the same arrivals converges to one state.
    */
  def mergeKeys(prior: Map[Int, Long], keys: Iterator[String]): Map[Int, Long] =
    keys.foldLeft(prior) { (regs, k) =>
      val (b, rho) = registerOf(k)
      if (regs.getOrElse(b, Long.MinValue) >= rho) regs else regs.updated(b, rho)
    }

  /** The exact-integer harmonic-mean estimate over a register map —
    * the same constants as [[graft.text.Profile]] (spliced, not
    * re-derived), truncating divisions included.
    */
  def estimate(regs: Map[Int, Long]): (Long, Long) = {
    import graft.text.Profile.{HllBuckets, HllEmptyTerm, HllNum, HllDen}
    val used = regs.size.toLong
    val dn = regs.valuesIterator.map(m => HllEmptyTerm >> m.toInt).sum +
      (HllBuckets - used) * HllEmptyTerm
    (used, HllNum / dn / HllDen)
  }

  /** Checkpointed state: the DENSE register vector packed as a
    * 512-char hex string (2 hex digits per bucket, 00 = empty — rho is
    * always ≥ 1 for a present key, ≤ 33 < 256) plus the arrival count.
    * Flat scalars only: the state encoder's generated accessors over a
    * Map/Seq field trip janino under forked-classloader codegen, and a
    * 512-byte string per scope is the same bounded size either way.
    */
  private[stream] case class ScopeState(regs: String, nSeen: Long)

  private[stream] def packRegs(regs: Map[Int, Long]): String =
    (0 until graft.text.Profile.HllBuckets)
      .map(b => f"${regs.getOrElse(b, 0L)}%02x").mkString

  private[stream] def unpackRegs(s: String): Map[Int, Long] =
    (0 until graft.text.Profile.HllBuckets).iterator
      .map(b => b -> java.lang.Long.parseLong(
        s.substring(2 * b, 2 * b + 2), 16))
      .filter(_._2 > 0L).toMap

  private def stateFunc(scope: String, arrivals: Iterator[Arrival],
                        state: GroupState[ScopeState]): DistinctEstimate = {
    val prior = state.getOption.getOrElse(
      ScopeState(packRegs(Map.empty), 0L))
    var n = prior.nSeen
    val regs = mergeKeys(unpackRegs(prior.regs),
                         arrivals.map { a => n += 1; a.key })
    state.update(ScopeState(packRegs(regs), n))
    val (used, est) = estimate(regs)
    DistinctEstimate(scope, used, est, n)
  }

  /** Streaming entry: arrivals → per-scope running estimate. Use with
    * `.writeStream.outputMode("update")`.
    */
  def run(arrivals: Dataset[Arrival]): Dataset[DistinctEstimate] = {
    implicit val ae = Encoders.product[Arrival]
    implicit val ee = Encoders.product[DistinctEstimate]
    implicit val ke = Encoders.STRING
    implicit val se = Encoders.product[ScopeState]
    arrivals.groupByKey(_.scope)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(stateFunc)
  }
}
