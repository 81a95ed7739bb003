package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

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
}
