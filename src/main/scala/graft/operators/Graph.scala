package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the Pregel-shaped iterative ops
  * (join + aggregate per round), in the exact fixed-point integer
  * algebra the rest of the library uses so every round is
  * bit-reproducible across engines and partitionings.
  */
object Graph {

  /** Fixed-point PAGERANK over an UNDIRECTED edge list — the
    * centrality pass behind "template hub" detection: a document
    * near-dup-linked to many other documents (shared boilerplate,
    * templates, mirrors) collects rank from all of them, so the top of
    * the ranking names the corpus's template centers — the docs to
    * inspect first in a curation pass.
    *
    * Each round is the standard power iteration restricted to nodes
    * with at least one edge (isolated docs hold the uniform base rank
    * by definition and never move):
    *
    *   pr'(i) = BASE + d·(Σ_{j~i} pr(j) div deg(j)) div dampDen
    *
    * with BASE = scale·(dampDen−dampNum) div dampDen and d = dampNum —
    * every division TRUNCATING integer division, so the fixed `iters`
    * rounds give one exact answer (no float drift, no convergence
    * epsilon; truncation loses < 1 fixed-point quantum per term).
    *
    * Scale posture: the classic Pregel shape — per round, ONE edge-list
    * join against the rank table (both partitioned by node key) and
    * ONE inflow aggregate; `iters` is a small constant. Degrees and
    * ranks never leave the cluster; the driver only composes plans.
    */
  def pageRank(edges: DataFrame, aCol: String, bCol: String,
               iters: Int = 3, dampNum: Long = 85, dampDen: Long = 100,
               scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen)
    // the adjacency materializes ONCE (localCheckpoint): the degree
    // aggregate and EVERY power-iteration join read it — without the
    // pin each round re-runs the whole upstream edge construction. At
    // production scale this is "write the adjacency table, then
    // iterate over it" — the standard Pregel layout.
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = sym.join(deg, Seq("src"))
    val base = scale * (dampDen - dampNum) / dampDen
    var pr = deg.select(col("src").as("node"), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      val inflow = withDeg.join(pr, withDeg("src") === pr("node"))
        .select(col("dst").as("node"), expr("pr div deg").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      pr = deg.select(col("src").as("node"))
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
           expr(s"$dampNum * coalesce(__in, CAST(0 AS BIGINT)) div $dampDen"))
            .as("pr"))
    }
    pr.join(deg.select(col("src").as("node"), col("deg")), Seq("node"))
      .select(col("node"), col("deg"), col("pr"))
  }

  /** CLAMPED LABEL PROPAGATION over an undirected edge list (Zhu &
    * Ghahramani 2002, CMU-CALD-02-107) — the semi-supervised
    * weak-labeling pass: a small seed set carries trusted labels, and
    * each synchronous round every still-unlabeled node adjacent to a
    * labeled node takes the MAJORITY label among its labeled
    * neighbors (ties to the smallest label — total order, so the
    * fixed `iters` rounds give ONE exact answer). Labeled nodes are
    * CLAMPED — a label never flips once assigned — so labels flood
    * outward one hop per round and the `round` column records the
    * hop distance from the seed set (0 = seed).
    *
    * The counting vote needs no floats and no damping: it is
    * bit-reproducible across engines and partitionings, unlike the
    * usual normalized-weight formulation.
    *
    * Scale posture: the Pregel shape again — per round ONE edge⋈label
    * join and ONE (node,label) count aggregate, both on the node key;
    * the adjacency materializes once and every round reads it; the
    * label table grows monotonically (clamping), so round cost is
    * bounded by the frontier's edges, and `iters` is a small constant
    * (labels rarely carry meaning past a few near-dup hops).
    */
  def labelPropagate(edges: DataFrame, aCol: String, bCol: String,
                     seeds: DataFrame, idCol: String, labelCol: String,
                     iters: Int = 2): DataFrame = {
    require(iters >= 1)
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var lab = seeds
      .select(col(idCol).as("node"), col(labelCol).as("plabel"),
              lit(0L).as("round"))
      .localCheckpoint()
    for (r <- 1 to iters) {
      val votes = sym
        .join(lab.select(col("node").as("src"), col("plabel")), Seq("src"))
        .groupBy(col("dst"), col("plabel"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dst")).orderBy(col("n").desc, col("plabel").asc)
      val newly = votes
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dst").as("node"), col("plabel"),
                lit(r.toLong).as("round"))
        .join(lab.select(col("node")), Seq("node"), "left_anti")
      lab = lab.unionByName(newly).localCheckpoint()
    }
    lab
  }
}
