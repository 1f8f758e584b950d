package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General graph centrality over an arbitrary weighted edge list — the
  * engine behind [[TextAnalysis.textRank]], exposed so any graph a pipeline
  * materializes (doc citation/link graphs, near-dup pair graphs, user
  * interaction graphs) can be ranked with the same machinery.
  */
object Graphs {

  /** Damped PageRank (d = 0.85) in FIXED-POINT integer arithmetic over a
    * weighted directed edge list `(src, dst, w)` — feed both directions for
    * an undirected graph. Ranks are ×1e6; each round a node sends
    * `(rank·w) DIV wdeg` along each out-edge and collects
    * `150000 + (85·Σ) DIV 100`. Integer ops make the fixpoint
    * bit-identical cross-engine and partitioning-independent — a double
    * formulation's sum order would not be.
    *
    * Nodes with no in-edges drop out after round 1 (rank mass flows only
    * along edges); on an undirected (symmetrized) graph every node keeps
    * both in- and out-edges, so nothing drops — the [[TextAnalysis
    * .textRank]] setting. Output: `(node, rank_x1e6)`.
    *
    * Plan shape: the per-round cost is ONE equi-join of the edge list with
    * the rank frame + one map-combinable sum — the [[Dedup.dedupClusters]]
    * iterative shape; `localCheckpoint` every 3rd round bounds the plan
    * while capping materializations. At 100 TB the edge list dominates: it
    * is checkpointed once (with its out-degree attached) and re-joined per
    * round, shuffling only the node-sized rank frame. */
  def graphRank(edges: DataFrame, iters: Int = 10,
                srcCol: String = "src", dstCol: String = "dst",
                wCol: String = "w"): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    // materialize the edge QUERY once: callers pass corpus-derived edge
    // chains (textRank's adjacency explode, the doc link graph), and `e`
    // feeds both the degree aggregate and the normalized-edge join
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).as("w")).localCheckpoint()
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    val edgeN = e.join(deg, Seq("src")).localCheckpoint() // reused per round
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rank"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      ranks = edgeN
        .join(ranks, edgeN("src") === ranks("node"))
        .select(col("dst"), expr("(rank * w) DIV wdeg").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg(expr("150000L + (85 * sum(contrib)) DIV 100").as("rank"))
      // a checkpoint per round costs a materialization each; every 3rd is
      // enough to keep the plan bounded (3 chained join+agg rounds) while
      // the eager cut still stops lineage-exponential re-execution
      if (i % 3 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("rank").as("rank_x1e6"))
  }

  /** PERSONALIZED PageRank: the damped walk teleports back to the SEED set
    * instead of everywhere, so rank mass concentrates around the seeds —
    * the "docs related to this set" / "expand this topic" primitive
    * (seeded relevance over citation or near-dup graphs). Same fixed-point
    * integer recurrence as [[graphRank]] with a per-node reset: seeds get
    * `150000`, everyone else `0`; initial rank is `1e6` on seeds only.
    * Same per-round join shape; the seed table joins in as a slim
    * (node, is_seed) frame computed once. */
  def graphRankPersonalized(edges: DataFrame, seeds: DataFrame,
                            iters: Int = 10,
                            srcCol: String = "src", dstCol: String = "dst",
                            wCol: String = "w"): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    // same entry materialization as graphRank: `e` feeds the degree
    // aggregate, the normalized-edge join, and (through deg) the node set
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).as("w")).localCheckpoint()
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    val edgeN = e.join(deg, Seq("src")).localCheckpoint()
    val nodes = deg.select(col("src").as("node"))
      .join(seeds.select(col("node")).distinct()
        .withColumn("is_seed", lit(1L)), Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .localCheckpoint()
    var ranks = nodes.select(col("node"),
      (col("is_seed") * 1000000L).as("rank")).localCheckpoint()
    for (i <- 1 to iters) {
      val contrib = edgeN
        .join(ranks, edgeN("src") === ranks("node"))
        .select(col("dst"), expr("(rank * w) DIV wdeg").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg(expr("(85 * sum(contrib)) DIV 100").as("flow"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("is_seed") * 150000L + coalesce(col("flow"), lit(0L))).as("rank"))
      if (i % 3 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("rank").as("rank_x1e6"))
  }

  /** k-core decomposition (peeling): repeatedly drop nodes with degree
    * < k until stable; what survives is the k-core — the graph's load-
    * bearing skeleton. On a near-dup graph the 2-core separates real
    * template families (cycles/cliques survive) from incidental pairwise
    * matches (trees peel away completely) — a cheaper structural cut than
    * triangle counting when only the verdict is needed.
    *
    * Per round: one degree agg + two semi-joins (edges to surviving
    * endpoints) + localCheckpoint — the [[Dedup.dedupClusters]] iterative
    * shape; rounds ≤ peel depth (tiny on near-dup graphs, the iteration
    * cap fails LOUDLY rather than returning a half-peeled graph). Output:
    * surviving `(node, degree)`. */
  def kCore(pairs: DataFrame, k: Int, maxIters: Int = 30,
            aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    require(k >= 1, "k must be positive")
    // canon materialized before the symmetrize union reads it twice — the
    // caller's pair QUERY (a shingle self-join or similar) must run once
    val canon = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    var e = canon.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(canon.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    // O(1)-action fixpoint (the [[Dedup.dedupClustersStar]] pattern): the
    // directed edge set is distinct by construction and semi-joins only
    // remove rows, so an order-independent (count, XOR of xxhash64) signature
    // detects "nothing peeled this round" in ONE map-side-combinable
    // aggregate instead of two count jobs over old + new edges.
    def edgeSig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(src, dst))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prevSig = edgeSig(e)
    var converged = false
    var i = 0
    var lastDeg: DataFrame = null
    while (!converged && i < maxIters) {
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
      val keep = deg.where(col("degree") >= k).select(col("node")).localCheckpoint()
      val e2 = e
        .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
      val sig = edgeSig(e2)
      converged = sig == prevSig
      prevSig = sig
      lastDeg = deg.where(col("degree") >= k)
      e = e2
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"k-core peel did not converge after $maxIters rounds")
    if (lastDeg == null) e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
    else lastDeg
  }

  /** Per-node triangle counts over an undirected pair list — the local
    * clustering signal: in a near-dup graph, triangle-rich nodes sit inside
    * CLIQUES (template families, mirror farms — every copy matches every
    * other), while triangle-free chains are drift (A~B~C where A and C
    * differ too much to pair). The dedup report wants the distinction: a
    * clique collapses to one canonical safely; a chain deserves a look.
    *
    * Degree-ordered enumeration (the O(E^1.5) standard): orient every edge
    * low→high in the total order (degree, id), which turns the graph into
    * a DAG whose max out-degree is O(√E) — a hub of degree d contributes
    * d² wedges under id-orientation but only O(E) total under degree
    * orientation. Join directed paths `u→v→w`, close with a semi-join on
    * the directed `(u, w)` edge: the triangle's three nodes have exactly
    * one topological order, so each triangle is counted once, then
    * credited to all three corners. Same three-join shape as the naive
    * id-ordering, same result set (the oracle enumerates by id), but the
    * path fan-out is bounded by the orientation, not by the hottest hub.
    *
    * Output: `(node, triangles)` for nodes in ≥ 1 triangle. */
  def triangleCounts(pairs: DataFrame, aCol: String = "doc_a",
                     bCol: String = "doc_b"): DataFrame = {
    // e is read three times (both degree union legs + the orientation
    // join) and dir three more (both path-join sides + the closing
    // semi-join) — materialize each once so the caller's pair query and
    // the orientation join run exactly once
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = e.select(col("a").as("n")).unionByName(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val dir = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint()
    val paths = dir.select(col("u"), col("v"))
      .join(dir.select(col("u").as("v"), col("v").as("w")), Seq("v"))
    val tri = paths
      .join(dir.select(col("u"), col("v").as("w")), Seq("u", "w"), "left_semi")
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /** COMMUNITY DETECTION by synchronous label propagation (after Raghavan
    * et al. 2007) — the near-linear community primitive the tier was
    * missing next to PageRank / triangles / k-core: every node starts as
    * its own label; each round, every node adopts the most frequent label
    * among its neighbors PLUS its own current label (label retention —
    * damps the bipartite oscillation synchronous LPA is known for), ties
    * → smallest label (the determinism the classic random-tie LPA lacks,
    * same device as the k-core and clustering fixpoints). `iters` fixed
    * rounds, synchronous (all nodes update from the round-t labels), so
    * the whole run replays as `iters` unrolled CTE rounds in the oracle,
    * bit for bit.
    *
    * Communities ≠ connected components ([[Dedup.dedupClusters]]): LPA
    * splits a connected graph along its dense regions — the
    * template-family vs drift-chain distinction at the community level.
    *
    * Output: (node, label, community_n) — final label + its community
    * size. Plan per round: one edge⨝labels equi-join (shuffles the
    * node-sized label frame; the checkpointed edge list never moves
    * again) → per-(node, label) count → map-combinable min(struct)
    * argmax. Nodes with no edges never appear (callers pass edge lists).
    * At 100 TB: rounds are O(E) hash aggs; `iters` is small (communities
    * stabilize in ~5 rounds on power-law graphs — Raghavan's empirical
    * bound). */
  def labelPropagation(edges: DataFrame, iters: Int = 3,
                       srcCol: String = "src",
                       dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e0 = edges.select(col(srcCol).as("node"), col(dstCol).as("nbr"))
    // the retention self-edge rides in the checkpointed edge list, so the
    // per-round join stays ONE join
    val e = e0.unionByName(
        e0.select(col("node")).distinct().withColumn("nbr", col("node")))
      .localCheckpoint()
    var labels = e.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      labels = e
        .join(labels.select(col("node").as("nbr"), col("label")), Seq("nbr"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        // argmax by (cnt desc, label asc) as a map-combinable min(struct)
        .groupBy(col("node"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("node"), col("m").getField("l").as("label"))
      if (i % 3 == 0 || i == iters) labels = labels.localCheckpoint()
    }
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("community_n"))
    labels.join(sizes, Seq("label"))
      .select(col("node"), col("label"), col("community_n"))
  }

  /** Degree ASSORTATIVITY — Newman's r: the Pearson correlation of
    * endpoint degrees over the (symmetrized) directed edge list. Do hubs
    * attach to hubs (r > 0, social-network shape) or to leaves (r < 0,
    * hub-and-spoke / technological shape)? The one-number structural
    * summary next to rank/triangles/k-core/communities — it predicts
    * whether degree-based partitioning will skew.
    *
    * Exact integer sums over (deg(u), deg(v)) per directed edge, the
    * [[Relational.valueCorrelation]] IEEE-sqrt finish. Plan: one degree
    * agg + two edges⨝degrees equi-joins + one map-combinable global agg —
    * no shuffle beyond the degree group-by and the joins. Output one row:
    * (m_edges, r_x10000). */
  def assortativity(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint() // degree agg + the endpoint joins read it thrice
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    e.join(deg.select(col("node").as("src"), col("deg").as("x")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("y")), "dst")
      .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
      .select(col("m").as("m_edges"),
        floor(lit(10000.0) *
          (col("m") * col("sxy") - col("sx") * col("sy")) /
          (sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double")))
          + 0.5).cast("long").as("r_x10000"))
  }
}
