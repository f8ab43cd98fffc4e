package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONE stateful stream serving BOTH inbox monitors — the distinct-
  * payload estimate ([[DistinctMonitor]]'s HLL registers) and the
  * heavy-hitter report ([[FrequencyMonitor]]'s CMS counters +
  * candidate gate) fold in a single pass over each micro-batch, from
  * ONE source read. `Main watch` runs exactly two streams over the
  * inbox: the ingest pipeline and this monitor — kept separate on
  * purpose (a monitor emission can never stall or fail the ingest
  * drain, and each checkpoints independently), but never a third.
  *
  * The combined state row is flat scalars (the checkpoint-encoder
  * convention): the packed register vector, the packed counter table,
  * the arrival count, and the candidate list. Every estimate is
  * computed by the SAME kernels the standalone monitors use
  * (`mergeKeys`/`estimate`, `mergeTokens`/`estimate`/`evalCandidates`),
  * so the batch-sketch mergeability contracts those monitors pin hold
  * here bit-for-bit.
  *
  * Output rows are (sortKey, renderedJsonLine): the key orders each
  * scope's distinct line before its hitter lines and the hitters by
  * (est desc, token asc) — the emitter just sorts and prints.
  */
object InboxMonitor {

  /** One inbox arrival: the sniffed content-type scope and the content
    * digest (sha256 hex — duplicate payloads collide whatever they are
    * named, and hex never contains the U+0001 separator).
    */
  case class Arrival(scope: String, key: String)

  /** One emitted monitor row: the rendered JSON line plus the
    * structured (metric, value) pair the runlog persists — so "was the
    * inbox spamming us last Tuesday" survives the console. `metric` is
    * `distinct:<scope>` or `hitter:<scope>:<token>`; `value` the
    * estimate (exact in a Double below 2^53 — far above the 48-bit
    * counter ceiling).
    */
  case class MonitorLine(sortKey: String, line: String, metric: String,
                         value: Double)

  private[stream] case class MonState(regs: String, counters: String,
                                      nSeen: Long, candidates: String)

  private def esc(s: String) = graft.Main.jsonEscape(s)

  private def stateFunc(d: Int, w: Int, minFrac: Long, cap: Int)(
      scope: String, arrivals: Iterator[Arrival],
      state: GroupState[MonState]): Iterator[MonitorLine] = {
    val prior = state.getOption
    val counters = prior.map(p => FrequencyMonitor.unpack(p.counters, d * w))
      .getOrElse(new Array[Long](d * w))
    // the batch's keys buffer once (batch-sized, the foreachBatch
    // precedent) so both folds run over one materialization without
    // per-arrival digest allocations
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    arrivals.foreach(a => buf += a.key)
    val n = prior.map(_.nSeen).getOrElse(0L) + buf.size
    FrequencyMonitor.mergeTokens(counters, buf.iterator, d, w)
    val regs = DistinctMonitor.mergeKeys(
      prior.map(p => DistinctMonitor.unpackRegs(p.regs))
        .getOrElse(Map.empty[Int, Long]),
      buf.iterator)
    val hitters = FrequencyMonitor.evalCandidates(
      counters, n,
      prior.map(p => FrequencyMonitor.splitCandidates(p.candidates))
        .getOrElse(Seq.empty),
      buf.distinct, d, w, minFrac, cap)
    state.update(MonState(DistinctMonitor.packRegs(regs),
                          FrequencyMonitor.pack(counters), n,
                          hitters.map(_._1).mkString("\u0001")))
    val (used, est) = DistinctMonitor.estimate(regs)
    val dLine = MonitorLine(s"$scope|0",
      s"""{"monitor":"distinct","scope":"${esc(scope)}",""" +
        s""""registers_used":$used,"est_distinct":$est,"n_seen":$n}""",
      s"distinct:$scope", est.toDouble)
    val hLines = hitters.map { case (t, e) =>
      // a saturated estimate is a FLOOR, not an upper bound — flagged
      // on the line so a consumer can tell (FrequencyMonitor.CounterMax)
      val sat =
        if (e >= FrequencyMonitor.CounterMax) ""","saturated":true""" else ""
      MonitorLine(f"$scope|1|${Long.MaxValue - e}%019d|$t",
        s"""{"monitor":"hitter","scope":"${esc(scope)}",""" +
          s""""token":"${esc(t)}","est_cnt":$e,"n_seen":$n$sat}""",
        s"hitter:$scope:$t", e.toDouble)
    }
    (dLine +: hLines).iterator
  }

  /** Streaming entry: arrivals → [[MonitorLine]]s per scope per
    * micro-batch. Defaults mirror the standalone monitors (d=4,
    * w=1024, minFrac=50 → the 2% rule, candidate cap 4·minFrac).
    * Use with `.writeStream.outputMode("update")`.
    */
  def run(arrivals: Dataset[Arrival], d: Int = 4, w: Int = 1024,
          minFrac: Long = 50L): Dataset[MonitorLine] = {
    val cap = (4L * minFrac).min(Int.MaxValue.toLong).toInt
    implicit val ae = Encoders.product[Arrival]
    implicit val se = Encoders.product[MonState]
    implicit val ke = Encoders.STRING
    implicit val oe = Encoders.product[MonitorLine]
    arrivals.groupByKey(_.scope)
      .flatMapGroupsWithState(OutputMode.Update(),
                              GroupStateTimeout.NoTimeout())(
        stateFunc(d, w, minFrac, cap))
  }
}
