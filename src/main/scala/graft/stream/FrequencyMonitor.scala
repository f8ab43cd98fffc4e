package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE HEAVY-HITTER monitoring — the streaming twin of the batch
  * Count-Min family (q93/q187, [[graft.text.Profile.cmsSketch]]):
  * "which tokens dominate this stream right now", per scope, emitted
  * after every micro-batch.
  *
  * Exact streaming frequencies need state proportional to the
  * vocabulary — unbounded. The CMS counter table is the correct
  * state: d×w longs per scope FOREVER, merged by SUM (micro-batch
  * order cannot matter), with the same md5 bucket recipe as the batch
  * sketch — so every emitted estimate is bit-identical to probing a
  * batch [[graft.text.Profile.cmsSketch]] over everything the stream
  * has seen (spec-pinned), the batch/stream mergeability contract.
  *
  * Heavy-hitter SELECTION is the classic CMS+candidates split: the
  * counters answer "how often", a bounded candidate set answers
  * "which tokens are worth asking about". Candidates are (re)evaluated
  * on the POST-batch counters — never mid-fold — so emission is
  * deterministic whatever order the group iterator yields arrivals: a
  * token is reported iff `est · minFrac ≥ n_seen` (cross-multiplied
  * integers; minFrac=50 → the 2% rule). The candidate set is pruned
  * deterministically (est desc, token asc) to `maxCandidates`. CMS
  * error is one-sided, so a TRUE heavy hitter can never be excluded
  * by UNDER-counting; the only exclusion risk is candidate-list
  * overflow, and true hitters are ≤ minFrac by mass (Σ true = n), so
  * the default bound of 4·minFrac leaves 3·minFrac slots for
  * collision-inflated extras — `run` enforces maxCandidates ≥
  * 2·minFrac so the bound can never be configured below the
  * guarantee's working room.
  *
  * Scale posture: state is d·w counters + a bounded candidate list per
  * scope, partitioned by scope and checkpointed by Structured
  * Streaming; each micro-batch pays d md5s per arrival and one
  * candidate re-evaluation. No per-token state, no growth.
  */
object FrequencyMonitor {

  /** One stream arrival: a scope and the token whose frequency is
    * being tracked. Tokens must not contain U+0001 (the candidate-list
    * separator in the flat checkpoint state) — the engine's `\W+`
    * token model never produces it; enforced at fold time.
    */
  case class Arrival(scope: String, token: String)

  /** Emitted per heavy hitter per micro-batch: the CMS estimate (≥ the
    * true count — one-sided) beside the scope's total arrivals.
    * `saturated` marks an estimate that hit the packed 48-bit counter
    * ceiling ([[CounterMax]]): past it the value is a FLOOR, not an
    * upper bound — downstream consumers must be able to tell the two
    * apart instead of trusting a silently-clamped "bound".
    */
  case class HeavyHitter(scope: String, token: String, est_cnt: Long,
                         n_seen: Long, saturated: Boolean)

  /** Checkpointed state, flat scalars only (a Map/Seq field trips
    * janino under the forked-classloader codegen — the DistinctMonitor
    * convention): the d·w counter table packed as fixed-width hex (12
    * digits per counter — 48-bit headroom, ~2.8e14 arrivals per scope)
    * and the candidate tokens joined on U+0001.
    */
  private[stream] case class FreqState(counters: String, nSeen: Long,
                                       candidates: String)

  /** The bucket recipe — the driver-side twin of
    * [[graft.text.Profile]]'s `cmsBucket` (`md5(j || '|' || token)`
    * first 8 hex digits mod w), so stream and batch estimates are
    * bit-identical.
    */
  def bucketOf(j: Int, token: String, w: Int): Int =
    bucketWith(java.security.MessageDigest.getInstance("MD5"), j, token, w)

  /** The same bucket off an existing digest instance — the hot-path
    * form ([[bucketOf]] allocates; the fold pays d buckets per arrival
    * and must not allocate a MessageDigest + 32 hex chars for each):
    * the first 4 digest bytes as an unsigned int ARE
    * parseLong(hex.take(8), 16).
    */
  private def bucketWith(md: java.security.MessageDigest, j: Int,
                         token: String, w: Int): Int = {
    val b = md.digest(s"$j|$token".getBytes("UTF-8")) // digest() resets md
    val v = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    (v % w).toInt
  }

  /** Pure fold, unit-testable: add a batch of tokens into the counter
    * table (sum — order-independent). Empty tokens and tokens carrying
    * the reserved separator are rejected loudly — the engine's `\W+`
    * token model produces neither, and both would silently vanish from
    * the candidate list's flat string round-trip.
    */
  def mergeTokens(counters: Array[Long], tokens: Iterator[String],
                  d: Int, w: Int): Unit = {
    val md = java.security.MessageDigest.getInstance("MD5")
    tokens.foreach { t =>
      require(t.nonEmpty && !t.contains('\u0001'),
        "token must be non-empty and free of the reserved separator U+0001")
      var j = 0
      while (j < d) { counters(j * w + bucketWith(md, j, t, w)) += 1L; j += 1 }
    }
  }

  /** The point estimate off the counter table: min over the d rows —
    * identical to [[graft.text.Profile.cmsEstimate]]'s algebra.
    */
  def estimate(counters: Array[Long], token: String, d: Int, w: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until d).map(j => counters(j * w + bucketWith(md, j, token, w))).min
  }

  /** A counter SATURATES at the packed 48-bit ceiling (~2.8e14
    * arrivals per scope) instead of failing: a `require` here would be
    * a poison pill — the state update would throw on every restart
    * from the checkpoint and the query could never advance again.
    * CAVEAT (the price of saturating): past the ceiling an estimate
    * can UNDER-report, so the one-sided guarantee holds only below it;
    * the candidate gate compensates by treating a saturated estimate
    * ("at least the ceiling") as an unconditional candidate, so a
    * dominant token is still reported — its printed estimate is then a
    * floor, not a bound from above.
    */
  private[graft] val CounterMax = 0xffffffffffffL

  private[graft] def pack(counters: Array[Long]): String =
    counters.map { c =>
      require(c >= 0L, s"negative counter $c cannot be packed")
      f"${math.min(c, CounterMax)}%012x"
    }.mkString

  private[graft] def unpack(s: String, n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Long.parseLong(s.substring(12 * i, 12 * i + 12), 16)
      i += 1
    }
    out
  }

  /** Candidate (re)evaluation on the POST-batch counters — candidates
    * = survivors of the prior set ∪ this batch's tokens, ALL evaluated
    * on the final counters (deterministic whatever order the group
    * iterator yields arrivals), gated by `est·minFrac ≥ n`
    * (cross-multiplied integers), pruned (est desc, token asc) to the
    * bound. Shared by the standalone monitor and the combined inbox
    * monitor ([[InboxMonitor]]) so the selection rule cannot drift
    * between them.
    */
  private[stream] def evalCandidates(counters: Array[Long], n: Long,
      prevCands: Seq[String], batchTokens: Iterable[String],
      d: Int, w: Int, minFrac: Long, cap: Int): Seq[(String, Long)] =
    (prevCands ++ batchTokens).toSeq.distinct
      .map(t => (t, estimate(counters, t, d, w)))
      // a SATURATED estimate passes unconditionally: past the packed
      // ceiling the counter under-reports (the estimate stops being
      // one-sided), so once n_seen exceeds CounterMax·minFrac the
      // cross-multiplied gate would silently drop even a 100%-dominant
      // token — "at least the ceiling" is always a candidate
      .filter { case (_, est) => est >= CounterMax || est * minFrac >= n }
      .sortBy { case (t, est) => (-est, t) }
      .take(cap)

  private[stream] def splitCandidates(s: String): Seq[String] =
    if (s.isEmpty) Seq.empty else s.split('\u0001').toSeq

  private def stateFunc(d: Int, w: Int, minFrac: Long, maxCandidates: Int)(
      scope: String, arrivals: Iterator[Arrival],
      state: GroupState[FreqState]): Iterator[HeavyHitter] = {
    val counters = state.getOption
      .map(p => unpack(p.counters, d * w))
      .getOrElse(new Array[Long](d * w))
    var n = state.getOption.map(_.nSeen).getOrElse(0L)
    val batchTokens = scala.collection.mutable.LinkedHashSet.empty[String]
    mergeTokens(counters, arrivals.map { a =>
      n += 1; batchTokens += a.token; a.token
    }, d, w)
    val prevCands = state.getOption.map(p => splitCandidates(p.candidates))
      .getOrElse(Seq.empty)
    val hitters = evalCandidates(counters, n, prevCands, batchTokens,
                                 d, w, minFrac, maxCandidates)
    state.update(FreqState(pack(counters), n,
                           hitters.map(_._1).mkString("\u0001")))
    hitters.iterator.map { case (t, est) =>
      HeavyHitter(scope, t, est, n, saturated = est >= CounterMax)
    }
  }

  /** Streaming entry: arrivals → heavy hitters per scope per
    * micro-batch. Defaults mirror the batch sketch (d=4, w=1024);
    * `minFrac=50` reports tokens at ≥ 2% of the scope's arrivals.
    * Use with `.writeStream.outputMode("update")`.
    */
  def run(arrivals: Dataset[Arrival], d: Int = 4, w: Int = 1024,
          minFrac: Long = 50L, maxCandidates: Int = 0)
      : Dataset[HeavyHitter] = {
    // 0 = derive from the gate: true hitters are ≤ minFrac by mass, so
    // 4·minFrac leaves 3× working room for collision-inflated extras;
    // an explicit bound below 2·minFrac would quietly void the
    // no-true-hitter-excluded guarantee — refuse it
    val cap =
      if (maxCandidates == 0) (4L * minFrac).min(Int.MaxValue.toLong).toInt
      else maxCandidates
    require(cap >= 2L * minFrac,
      s"maxCandidates=$cap is below 2×minFrac=$minFrac — true heavy " +
        "hitters could be pruned out of the candidate list")
    implicit val ae = Encoders.product[Arrival]
    implicit val he = Encoders.product[HeavyHitter]
    implicit val ke = Encoders.STRING
    implicit val se = Encoders.product[FreqState]
    arrivals.groupByKey(_.scope)
      .flatMapGroupsWithState(OutputMode.Update(),
                              GroupStateTimeout.NoTimeout())(
        stateFunc(d, w, minFrac, cap))
  }
}
