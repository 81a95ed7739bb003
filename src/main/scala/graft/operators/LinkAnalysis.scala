package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Iterative link analysis over an edge list — the centrality tier a
  * web-scale curation pipeline uses to weight sources (e.g. ranking
  * crawl domains by link structure before sampling).
  *
  * Scale design: each iteration is ONE shuffle (contributions grouped
  * by destination); the rank vector is re-partitioned by node once and
  * the edge list joins it on the source key. Iterations are chained
  * through [[Checkpoints]] so the plan (and its lineage) stays O(1)
  * across rounds instead of O(3^n) — same discipline as
  * [[Clustering.kmeans]] and [[Dedup.connectedComponents]].
  */
object LinkAnalysis {

  /** Weighted PageRank. Edges `(src, dst, weight)`; dangling nodes
    * (no out-edges) redistribute uniformly via the damping term only
    * (standard simplification). Returns `(node, rank)` with ranks
    * summing to ≈ 1 over non-dangling-reachable nodes.
    *
    * @param iters   fixed iteration count (deterministic plan depth)
    * @param damping classic 0.85
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters >= 1")
    val e = edges.select(col("src"), col("dst"),
      col("weight").cast(DoubleType).as("w"))

    // normalize out-weights once: P(u→v) = w_uv / Σ_v w_uv
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("w_out"))
    val p = Checkpoints.truncate(e.join(outW, Seq("src"))
      .select(col("src"), col("dst"), (col("w") / col("w_out")).as("p")))

    val nodes = Checkpoints.truncate(
      e.select(col("src").as("node")).union(e.select(col("dst"))).distinct())
    val n = nodes.count().toDouble

    var rank = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = p.join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("p") * col("rank")).as("in_mass"))
      rank = Checkpoints.truncate(nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank")))
    }
    rank
  }

  /** Weighted PageRank in FIXED-POINT INTEGER arithmetic: ranks are
    * maintained as `⌊rank · scale⌋` BIGINTs and every update is an
    * integer multiply + integer division — no floats anywhere, so the
    * result is bit-identical across engines, partitionings, and
    * retries (the property that earns q95 a DuckDB oracle; the float
    * [[pageRank]] above remains the production variant).
    *
    * Update rule (all `div` = floor division on non-negative values,
    * identical in Spark `div` and DuckDB `//`):
    * {{{
    *   contrib(u→v) = (w_uv · r_u) div W_u
    *   r'_v = ((dampDen−dampNum)·scale) div (dampDen·n)
    *        + (dampNum · Σ contrib) div dampDen
    * }}}
    * Each division truncates at most 1/scale of rank mass, so values
    * track the float iteration to ~|V|/scale absolute error.
    *
    * Overflow bound: `max(w_uv) · scale < 2⁶³` (w_uv · r_u ≤ w_uv ·
    * scale). At the default scale=10⁹ that allows edge weights to
    * ~9·10⁹ — lower `scale` if the graph is heavier. */
  def pageRankExact(edges: DataFrame, iters: Int = 5,
                    scale: Long = 1000000000L,
                    dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1, "iters >= 1")
    val e = edges.select(col("src"), col("dst"),
      col("weight").cast(LongType).as("w"))
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("w_out"))
    val p = Checkpoints.truncate(e.join(outW, Seq("src")))
    val nodes = Checkpoints.truncate(
      e.select(col("src").as("node")).union(e.select(col("dst"))).distinct())
    val n = nodes.count()
    val baseTerm = ((dampDen - dampNum) * scale) / (dampDen * n)
    var rank = nodes.withColumn("r", lit(scale / n))
    for (_ <- 1 to iters) {
      val contrib = p.join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("(w * r) div w_out").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("in_mass"))
      rank = Checkpoints.truncate(nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(baseTerm) +
            expr(s"($dampNum * coalesce(in_mass, 0L)) div $dampDen")).as("r")))
    }
    rank.select(col("node"), col("r").as("rank_scaled"))
  }

  /** Synchronous label-propagation community detection (Raghavan
    * et al. 2007) over an undirected edge set (a, b): every node
    * starts as its own label; each round it adopts the most frequent
    * label among its neighbors, ties broken (count desc, label asc)
    * — fully deterministic, unlike the classic random-order
    * asynchronous variant, so the result is reproducible on any
    * partitioning and oracle-checkable by unrolling rounds.
    *
    * Scale shape: one shuffle per round (vote aggregate + per-node
    * argmax window keyed on the node), plans kept constant-size via
    * [[Checkpoints.truncate]]; rounds are a fixed small constant, so
    * total cost is O(rounds · |E|) with no driver-side state.
    * Output: (node, community). */
  def labelPropagation(edges: DataFrame, rounds: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1, "rounds >= 1")
    val adj = Checkpoints.truncate(
      edges.select(col("a").as("v"), col("b").as("u"))
        .unionAll(edges.select(col("b").as("v"), col("a").as("u"))))
    var labels = adj.select(col("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
    for (_ <- 1 to rounds) {
      val votes = adj
        .join(labels.select(col("v").as("u"), col("lbl")), Seq("u"))
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("c"))
      labels = Checkpoints.truncate(votes
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("v"))
            .orderBy(col("c").desc, col("lbl"))))
        .filter(col("rn") === 1)
        .select(col("v"), col("lbl")))
    }
    labels.select(col("v").as("node"), col("lbl").as("community"))
  }

  /** k-core decomposition by fixed-round peeling (Seidman 1983,
    * Batagelj–Zaveršnik peel expressed as synchronous rounds): each
    * round recomputes degrees within the surviving induced subgraph
    * and drops nodes below k. A fixed round count keeps the result
    * deterministic and oracle-unrollable; extra rounds past
    * convergence are no-ops, so the output is the k-core whenever the
    * peel has stabilized (monotone — the survivor set only shrinks).
    *
    * Scale shape: each round is two semi-joins (restrict edge ends to
    * survivors) plus one count aggregate — O(|E|) per round, one
    * shuffle keyed on the node; plans stay constant-size via
    * [[Checkpoints.truncate]]. Output: (node, deg) — the node's
    * degree in the final induced subgraph. */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 8): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    // materialize the edge set ONCE at single-direction size (the
    // union doubling and every peel round then ride the checkpoint —
    // the source join never recomputes, and the materialized footprint
    // is |E|, not 2|E|)
    val e = Checkpoints.truncate(
      edges.select(col("a").as("v"), col("b").as("u")))
    val adj = e.unionAll(e.select(col("u").as("v"), col("v").as("u")))
    var alive: DataFrame = null
    var out: DataFrame = null
    // survivor sets shrink monotonically, so an unchanged count means
    // the exact fixed point — remaining rounds are provable no-ops
    // (the count is ~free: truncate() has already materialized the
    // round eagerly). The oracle still unrolls all `rounds` rounds.
    // Round 1's "restrict to survivors" is the identity, so it runs as
    // a bare degree count — no semi joins, no broadcast of the full
    // node set.
    var prev = -1L
    var r = 0
    while (r < rounds && prev != 0L) {
      val restricted =
        if (alive == null) adj
        else adj.join(alive, Seq("v"), "left_semi")
          .join(alive.select(col("v").as("u")), Seq("u"), "left_semi")
      out = Checkpoints.truncate(restricted
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k))
      alive = out.select(col("v"))
      val cnt = out.count()
      if (cnt == prev) r = rounds else { prev = cnt; r += 1 }
    }
    out.select(col("v").as("node"), col("deg"))
  }
}
