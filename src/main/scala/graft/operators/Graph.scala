package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Canonical edge-table prep shared by every iterative operator here:
    * cast (src, dst) to long, optionally distinct (duplicate edges
    * would double-count degrees and messages), and persist so the
    * upstream edge-derivation plan never re-runs per superstep.
    * One definition — a change to canonicalization (null handling,
    * materialization strategy) applies to every operator at once.
    *
    * Edge-SIZED tables persist MEMORY_AND_DISK_SER, not localCheckpoint:
    * checkpoint blocks are deserialized and UN-EVICTABLE (truncated
    * lineage means eviction would lose data), so at 10⁸+ edges they pin
    * gigabytes of heap per invocation until the RDD is GC'd — the sf10
    * probe OOM'd exactly there. Serialized persist is ~4× smaller,
    * spills, evicts under pressure (recompute is one shallow
    * scan+distinct), and still preserves the hash partitioning the
    * per-superstep join reuse relies on. Node-sized ITERATIVE tables
    * (rank/labels/frontiers) keep localCheckpoint — they genuinely need
    * lineage truncation and stay small.
    *
    * LIFECYCLE: every persist registers in a per-invocation `Caches`
    * list, and each public operator ends by eagerly materializing its
    * node-sized result and releasing the list — the session's
    * CacheManager holds a persisted DataFrame until explicit unpersist,
    * so without this, repeated graph queries on a long-lived shared
    * session (HTTP serving, bench loops) accumulate edge-sized cached
    * tables without bound. */
  private type Caches = scala.collection.mutable.ArrayBuffer[DataFrame]

  /** `eager = true` forces materialization NOW (one cached count):
    * required when the table feeds several stages of ONE downstream job
    * — lazy persist would let those stages race and each recompute the
    * plan before the cache populates (the triangle count's orientation
    * table feeds four consumers; measured 5.9x wall regression when it
    * went lazy). Iterative consumers (pageRank's per-superstep reuse)
    * stay lazy: the first superstep materializes serially anyway. */
  private def matEdges(df: DataFrame, track: Caches,
      eager: Boolean = false): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    track += p
    if (eager) p.count()
    p
  }

  /** Eagerly materialize the (node-sized) result via localCheckpoint,
    * then release every edge-sized cache the invocation registered —
    * safe because the checkpoint severed the result's lineage to them.
    * `blocking = false`: block deletion proceeds asynchronously; the
    * caches are already unreferenced by the returned plan. */
  private def finishAndRelease(result: DataFrame, cached: Caches): DataFrame = {
    val out = result.localCheckpoint()
    cached.foreach(_.unpersist(blocking = false))
    out
  }

  /** When `repartitionBySrc`, the dedup (if needed) runs ABOVE the src
    * exchange: hashpartitioning(src) satisfies the (src, dst) clustering
    * the dedup aggregate requires, so ONE edge-sized exchange serves
    * both the dedup and the per-superstep join partitioning (r11 probe:
    * kHop 3.36 → 2.89 s vs the old distinct-then-repartition double
    * exchange; result identical — dropDuplicates(src, dst) ≡ distinct()
    * on a 2-column frame). */
  private def normEdges(edges: DataFrame, srcCol: String, dstCol: String,
      assumeDistinct: Boolean, track: Caches,
      repartitionBySrc: Boolean = false): DataFrame = {
    val raw = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val shaped =
      if (repartitionBySrc) {
        val rep = raw.repartition(col("src"))
        if (assumeDistinct) rep else rep.dropDuplicates("src", "dst")
      } else if (assumeDistinct) raw
      else raw.distinct()
    matEdges(shaped, track)
  }

  /** The once-materialized (src, dst, deg) message table hash-partitioned
    * on src — reused every superstep; the serialized persist preserves
    * the partitioning so each round's join reuses it and only the
    * node-sized rank table moves (AQE usually broadcasts it). The edge
    * table never re-shuffles after this.
    *
    * Out-degree rides the SAME src exchange as a window count: the
    * window's required ClusteredDistribution(src) inserts exactly the
    * exchange the per-round join layout needs, and the count over the
    * unbounded src frame attaches deg with no join at all. The previous
    * shape (separate groupBy(src) degree aggregate + SHUFFLE_HASH join
    * back) paid one more edge-sized exchange, a node-sized aggregate
    * exchange, a second edge-sized persist, and the join itself — r11
    * probe: pageRank 6.89 → 5.27 s, same rows. Per-src groups are
    * out-degree-sized, spillable (WindowExec buffers one group at a
    * time), and AQE's skew handling does not apply to windows — a
    * celebrity hub with 10⁸ out-edges lands in one task's buffer, the
    * same bound the old SHUFFLE_HASH build side had. */
  private def messageTable(e: DataFrame, track: Caches): DataFrame =
    matEdges(e.withColumn("deg",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")))), track)

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
    * (serialized, evictable persist) and every superstep shuffles only the rank
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
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val cached: Caches = scala.collection.mutable.ArrayBuffer.empty
    val ed = messageTable(normEdges(edges, srcCol, dstCol, assumeDistinct, cached), cached)
    // node init reads the persisted src-partitioned ed — the distinct is
    // a no-exchange aggregate (partitioning already satisfies it)
    var rank = ed.select(col("src")).distinct()
      .select(col("src").as("node"), lit(1000000L).as("rank"))
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
    finishAndRelease(rank, cached)
  }

  /** Personalized PageRank: the teleport mass lands on a SEED set
    * instead of uniformly, so ranks measure proximity-to-seeds — the
    * related-entity / recommendation form of PageRank (seed = a user's
    * purchases, a topic's known members). Same integer micro-unit
    * arithmetic as [[pageRank]] (bit-exact on any engine, unrollable
    * as SQL CTE stages): every node starts at 1e6; per round a seed
    * receives `(150000·n) div |S|` base mass, a non-seed 0, plus the
    * damped message sum.
    *
    * Scale shape identical to [[pageRank]] — the edge table
    * materializes once, only node-sized tables move per round; the
    * seed set is broadcast into each round's base-mass join. Seeds
    * must be nodes of the (symmetrized, non-dangling) graph — ENFORCED:
    * a seed outside the node set would receive no teleport mass via the
    * message-side left_outer and silently vanish from the rank table,
    * so the precondition is checked (cheap: anti-join of the tiny seed
    * set against the degree table) instead of documented-only.
    *
    * `knownNodeCount`: repeated-query callers can pass the node count
    * (e.g. from a prior run or catalog stats) to skip the one
    * `deg.count()` driver job per invocation. `validateSeeds = false`
    * likewise skips the seed-membership anti-join for callers that
    * have already established seeds ⊆ nodes (the two flags together
    * make the steady-state repeated-query path zero extra jobs). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 10,
      checkpointEvery: Int = 3, assumeDistinct: Boolean = false,
      knownNodeCount: Option[Long] = None,
      validateSeeds: Boolean = true): DataFrame = {
    require(iters >= 1)
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val cached: Caches = scala.collection.mutable.ArrayBuffer.empty
    val ed = messageTable(normEdges(edges, srcCol, dstCol, assumeDistinct, cached), cached)
    val nodes = ed.select(col("src")).distinct()
    val seedSet = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct().localCheckpoint()
    if (validateSeeds) {
      val strays = seedSet.join(nodes, seedSet("node") === nodes("src"), "left_anti").count()
      require(strays == 0,
        s"personalizedPageRank: $strays seed(s) are not nodes of the graph — " +
          "an isolated seed would lose its teleport mass; add its edges or drop it")
    }
    val nNodes = knownNodeCount.getOrElse(nodes.count())
    // Teleport mass: seeds are query-sized by contract (a user's
    // purchases, a topic's members), so up to `inSetSeedCap` the
    // membership test folds into the aggregate PROJECTION as a
    // codegen'd InSet — no per-round broadcast-join stage at all (r11
    // probe: ppr 6.94 → 4.34 s; 5 broadcast builds removed). One
    // BOUNDED fetch (cap+1 rows off the checkpointed seed set) decides
    // the strategy and, in the common small case, the seed count — no
    // separate count job, no unbounded collect. A larger-than-cap seed
    // set keeps the broadcast left_outer join — identical arithmetic
    // either way (a seed row gets `base`, a non-seed 0).
    val probe = seedSet.limit(inSetSeedCap.toInt + 1).collect()
    require(probe.nonEmpty, "seed set is empty")
    val seedIds = if (probe.length <= inSetSeedCap)
      Some(probe.map(_.getLong(0)).toSeq) else None
    val nSeeds = seedIds.map(_.length.toLong).getOrElse(seedSet.count())
    val base = (150000L * nNodes) / nSeeds
    val teleport: Column => Column = seedIds match {
      case Some(ids) => dst => when(dst.isInCollection(ids), lit(base)).otherwise(lit(0L))
      case None => _ => coalesce(col("__base"), lit(0L))
    }
    val seedBase = seedSet.withColumn("__base", lit(base))
    var rank = nodes.select(col("src").as("node"), lit(1000000L).as("rank"))
    var i = 1
    while (i <= iters) {
      val msgs = ed.join(rank, ed("src") === rank("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      val joined = if (seedIds.isDefined) msgs
        else msgs.join(broadcast(seedBase), col("dst") === seedBase("node"), "left_outer")
      rank = joined.select(col("dst").as("node"),
        (teleport(col("dst")) + expr("(85 * m) div 100")).as("rank"))
      if (i % checkpointEvery == 0) rank = rank.localCheckpoint()
      i += 1
    }
    finishAndRelease(rank, cached)
  }

  /** Seed-set size up to which [[personalizedPageRank]] folds the
    * teleport membership into an in-projection InSet instead of a
    * per-round broadcast join: 8192 longs ≈ 64 KB embedded in the task
    * binary — comfortably small; larger sets go through a broadcast. */
  private val inSetSeedCap = 8192L

  /** k-hop neighborhood expansion: for every seed, all nodes within
    * `k` hops with `hop` = the BFS shortest distance — the
    * related-entity / feature-neighborhood primitive ("suppliers
    * within 2 hops of this customer"). BFS-by-joins: each round joins
    * the frontier against the once-materialized edge table, dedups,
    * and anti-joins the visited set so a node is emitted exactly once
    * at its first (shortest) hop.
    *
    * Scale shape: edges materialize ONCE hash-partitioned on src; per
    * round only (seed, node) frontier rows move, and the anti-join
    * keys on the same (seed, node) the dedup just shuffled. Frontiers
    * are checkpoint-truncated per hop, so the plan stays O(1) deep for
    * any k. Output: (seed, node, hop), hop 0 = the seed itself. */
  def kHopNeighborhood(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, k: Int,
      assumeDistinct: Boolean = false): DataFrame = {
    require(k >= 1)
    val cached: Caches = scala.collection.mutable.ArrayBuffer.empty
    val ed = normEdges(edges, srcCol, dstCol, assumeDistinct, cached, repartitionBySrc = true)
    var visited = seeds.select(col(seedCol).cast("long").as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"), lit(0).as("hop"))
      .localCheckpoint()
    var frontier = visited
    var h = 1
    while (h <= k) {
      val next = ed.join(frontier, ed("src") === frontier("node"))
        .select(col("seed"), col("dst").as("node")).distinct()
        .join(visited.select(col("seed"), col("node")), Seq("seed", "node"), "left_anti")
        .withColumn("hop", lit(h))
        .localCheckpoint()
      // visited stays a LAZY union of checkpointed frontiers: each hop's
      // anti-join rereads only materialized blocks (an eager checkpoint
      // of the growing union re-copied all of visited every hop)
      visited = visited.unionByName(next)
      frontier = next
      h += 1
    }
    // no final checkpoint: the seed set and every frontier are ALREADY
    // localCheckpoint'd, so the union's lineage references only
    // materialized blocks — never the edge cache — and the cache can
    // release directly. The generic finishAndRelease would re-copy the
    // whole (seed × node × k) union, the family's LARGEST result, to
    // sever lineage that is already severed.
    cached.foreach(_.unpersist(blocking = false))
    visited
  }

  /** Synchronous label propagation (Raghavan et al. 2007) with
    * deterministic tie-breaking: every node starts labeled with its own
    * id; each round a node adopts the MODE of its neighbors' labels,
    * ties to the smallest label. Fixed `iters` rounds of the exact
    * integer/argmin rule make the run bit-identical on any engine —
    * the oracle unrolls the same rounds as CTE stages.
    *
    * Scale shape: the edge list materializes once hash-partitioned on
    * src ([[pageRank]]'s layout); each round is one join (node-sized
    * label table moves) + a repartition on dst that BOTH downstream
    * aggregates reuse — (dst, lbl) counts and the per-dst argmax are
    * each satisfied by the dst partitioning, so a round costs two
    * shuffles total (labels into the join, messages onto dst). The
    * argmax is `min_by` over the (−count, label) struct — mode with
    * smallest-label ties, no window sort. Requires every node to have
    * an out-edge (pass both directions for undirected graphs).
    *
    * Known synchronous-LPA caveat (EdgeSpec pins it): bipartite
    * structures can oscillate with period 2 — the standard remedies
    * are an extra iteration (compare both parities) or asynchronous
    * coloring; fixed `iters` keeps the operator deterministic and
    * oracle-checkable, which is the contract here.
    * Output: (node, lbl) — lbl is the elected community id. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, checkpointEvery: Int = 2,
      assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1)
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val cached: Caches = scala.collection.mutable.ArrayBuffer.empty
    val e = normEdges(edges, srcCol, dstCol, assumeDistinct, cached, repartitionBySrc = true)
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    var i = 1
    while (i <= iters) {
      labels = e.join(labels, e("src") === labels("node"))
        .select(col("dst"), col("lbl"))
        .repartition(col("dst")) // one dst exchange serves both aggs below
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl"))).as("lbl"))
        .select(col("dst").as("node"), col("lbl"))
      if (i % checkpointEvery == 0) labels = labels.localCheckpoint()
      i += 1
    }
    finishAndRelease(labels, cached)
  }

  /** Exact triangle count via DEGREE-ORDERED wedge enumeration — the
    * standard scalable orientation (compact-forward / Schank 2007):
    * each undirected edge points from its (degree, id)-smaller endpoint
    * to the larger, so every triangle has exactly ONE apex (the
    * orientation-least vertex) and is found once, and — the scale
    * property — wedge fan-out at any vertex is bounded by its FORWARD
    * degree: a celebrity hub of degree d generates O(d·√m)-ish wedges
    * instead of O(d²), because edges into the hub point AT it and
    * produce no wedges there. Plain id-orientation has no such bound.
    *
    * Three relational steps: degree aggregate, wedge self-join on the
    * apex, closing-edge semi-join — all equi-joins Catalyst/AQE handle
    * (the oriented edge table is reused three times; a serialized
    * persist materializes it once). Input edges are undirected pairs; dups and
    * self-loops are dropped. Output: 1 row (n_edges, n_triangles). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val cached: Caches = scala.collection.mutable.ArrayBuffer.empty
    // und feeds the degree aggregate AND the orientation join —
    // materialize once or the upstream edge-derivation plan runs twice
    val und = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("x"), greatest(col("u"), col("v")).as("y"))
      .distinct()
      .transform(df => matEdges(df, cached, eager = true))
    // undirected degree per node (each edge touches both endpoints)
    val deg = und.select(explode(array(col("x"), col("y"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val o = und
      .join(deg.withColumnRenamed("n", "x").withColumnRenamed("d", "dx"), "x")
      .join(deg.withColumnRenamed("n", "y").withColumnRenamed("d", "dy"), "y")
      .select(
        when(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")),
          struct(col("x").as("a"), col("y").as("b")))
          .otherwise(struct(col("y").as("a"), col("x").as("b"))).as("e"))
      .select(col("e.a"), col("e.b"))
      .transform(df => matEdges(df, cached, eager = true))
    val wedges = o.as("ab").join(o.as("ac"),
        col("ab.a") === col("ac.a") && col("ab.b") =!= col("ac.b"))
      .select(col("ab.b").as("p"), col("ac.b").as("q"))
    // closing edge in orientation order closes each wedge pair once
    val tri = wedges.join(o.as("bc"),
        col("p") === col("bc.a") && col("q") === col("bc.b"), "left_semi")
    finishAndRelease(
      o.agg(count(lit(1)).as("n_edges"))
        .crossJoin(tri.agg(count(lit(1)).as("n_triangles"))),
      cached)
  }
}
