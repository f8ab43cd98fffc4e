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
  * deterministically (est desc, token asc) to `maxCandidates`, and
  * CMS error is one-sided, so a TRUE heavy hitter can never be
  * excluded by under-counting — only collision-inflated extras join.
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
    */
  case class HeavyHitter(scope: String, token: String, est_cnt: Long,
                         n_seen: Long)

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
  private[stream] def bucketOf(j: Int, token: String, w: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j|$token".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(8), 16) % w).toInt
  }

  /** Pure fold, unit-testable: add a batch of tokens into the counter
    * table (sum — order-independent).
    */
  def mergeTokens(counters: Array[Long], tokens: Iterator[String],
                  d: Int, w: Int): Unit =
    tokens.foreach { t =>
      require(!t.contains('\u0001'),
        "token contains the reserved candidate separator \\u0001")
      var j = 0
      while (j < d) { counters(j * w + bucketOf(j, t, w)) += 1L; j += 1 }
    }

  /** The point estimate off the counter table: min over the d rows —
    * identical to [[graft.text.Profile.cmsEstimate]]'s algebra.
    */
  def estimate(counters: Array[Long], token: String, d: Int, w: Int): Long =
    (0 until d).map(j => counters(j * w + bucketOf(j, token, w))).min

  private[graft] def pack(counters: Array[Long]): String =
    counters.map(c => f"$c%012x").mkString

  private[graft] def unpack(s: String, n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Long.parseLong(s.substring(12 * i, 12 * i + 12), 16)
      i += 1
    }
    out
  }

  private def stateFunc(d: Int, w: Int, minFrac: Long, maxCandidates: Int)(
      scope: String, arrivals: Iterator[Arrival],
      state: GroupState[FreqState]): Iterator[HeavyHitter] = {
    val prior = state.getOption.getOrElse(
      FreqState(pack(new Array[Long](d * w)), 0L, ""))
    val counters = unpack(prior.counters, d * w)
    var n = prior.nSeen
    val batchTokens = scala.collection.mutable.LinkedHashSet.empty[String]
    mergeTokens(counters, arrivals.map { a =>
      n += 1; batchTokens += a.token; a.token
    }, d, w)
    // candidates = survivors of the prior set ∪ this batch's tokens,
    // ALL evaluated on the final counters (deterministic regardless of
    // the group iterator's order), gated by est·minFrac ≥ n, pruned
    // (est desc, token asc) to the bound
    val prevCands =
      if (prior.candidates.isEmpty) Seq.empty[String]
      else prior.candidates.split('\u0001').toSeq
    val hitters = (prevCands ++ batchTokens).distinct
      .map(t => (t, estimate(counters, t, d, w)))
      .filter { case (_, est) => est * minFrac >= n }
      .sortBy { case (t, est) => (-est, t) }
      .take(maxCandidates)
    state.update(FreqState(pack(counters), n,
                           hitters.map(_._1).mkString("\u0001")))
    hitters.iterator.map { case (t, est) => HeavyHitter(scope, t, est, n) }
  }

  /** Streaming entry: arrivals → heavy hitters per scope per
    * micro-batch. Defaults mirror the batch sketch (d=4, w=1024);
    * `minFrac=50` reports tokens at ≥ 2% of the scope's arrivals.
    * Use with `.writeStream.outputMode("update")`.
    */
  def run(arrivals: Dataset[Arrival], d: Int = 4, w: Int = 1024,
          minFrac: Long = 50L, maxCandidates: Int = 256)
      : Dataset[HeavyHitter] = {
    implicit val ae = Encoders.product[Arrival]
    implicit val he = Encoders.product[HeavyHitter]
    implicit val ke = Encoders.STRING
    implicit val se = Encoders.product[FreqState]
    arrivals.groupByKey(_.scope)
      .flatMapGroupsWithState(OutputMode.Update(),
                              GroupStateTimeout.NoTimeout())(
        stateFunc(d, w, minFrac, maxCandidates))
  }
}
