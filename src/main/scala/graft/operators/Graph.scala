package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph operators in the Pregel-by-joins style: each
  * superstep is one equi-join (messages along edges) plus one
  * aggregate (combine at the destination) — the shape GraphX/Pregel
  * lower to, expressed directly in DataFrames so Catalyst handles
  * partitioning and AQE handles skewed hubs.
  *
  * Complements [[graft.llm.Dedup.connectedGroups]] (pointer-jumping
  * connected components — O(log d) rounds); PageRank here is the
  * fixed-iteration value-propagation member of the family.
  */
object Graph {

  /** PageRank with INTEGER micro-unit ranks — deterministic on any
    * engine and any partition order, so a fixed-iteration run is
    * DuckDB-oracle-checkable (the same quantization trick as
    * [[graft.llm.TextStats.unigramLogProb]]'s micro-nats).
    *
    * Every node starts at 1e6 micro-units; each iteration a node sends
    * `rank div outdeg` along each out-edge (integer division — the
    * dropped remainder is deterministic) and becomes
    * `150000 + (85 · Σ incoming) div 100` (α = 0.85 damping). All
    * arithmetic is BIGINT: sums are exact and order-independent, so
    * results hash-compare bit-identically across engines.
    *
    * Requirements: `edges` must be a directed edge list where every
    * node has at least one out-edge (pass both directions for an
    * undirected graph — which also makes the node set stable across
    * iterations). Dangling nodes would silently drop their mass;
    * symmetrized inputs cannot dangle.
    *
    * Scale shape: the (src, dst, deg) message table materializes ONCE
    * (`localCheckpoint`) and every superstep shuffles only the rank
    * table — hash-partitioned on the join key, combined map-side by
    * the dst aggregate. Lineage is checkpoint-truncated every
    * `checkpointEvery` rounds so the plan stays O(1) deep. On a
    * cluster, pre-bucketing edges by src makes the per-round join
    * co-located; AQE's skew split handles celebrity hubs.
    * Output: (node, rank) — rank in micro-units, Σ ≈ n·1e6. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10, checkpointEvery: Int = 3,
      assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1)
    val raw = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    // duplicate edges would double-count in deg and in the message sum;
    // callers that already dedup skip the extra edge-wide shuffle
    val e = if (assumeDistinct) raw else raw.distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // Message table (src, dst, deg): reused every superstep —
    // materialize ONCE, hash-partitioned on src. localCheckpoint
    // preserves the partitioning, so each round's join reuses it and
    // only the node-sized rank table moves (AQE usually broadcasts it);
    // the EDGE table never re-shuffles after this line.
    val ed = e.join(deg, "src").repartition(col("src")).localCheckpoint()
    var rank = deg.select(col("src").as("node"), lit(1000000L).as("rank"))
    var i = 1
    while (i <= iters) {
      rank = ed.join(rank, ed("src") === rank("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * m) div 100")).as("rank"))
      if (i % checkpointEvery == 0) rank = rank.localCheckpoint()
      i += 1
    }
    rank
  }
}
