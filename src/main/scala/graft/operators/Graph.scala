package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over pair tables (the dedup near-dup graph being the
  * in-engine producer: [[Dedup.simhashPairs]] / [[Dedup.dedupClusters]]'s
  * edge set). Everything is expressed as keyed joins + aggregates — no
  * driver-side graph state, the same discipline as the min-label
  * propagation in [[Dedup.dedupClusters]].
  */
object Graph {

  /** Fixed-iteration PageRank (Page et al. 1999) over an undirected pair
    * graph — ranks duplicate-cluster hubs: a document tied to many
    * near-dups concentrates rank, the signal a curation pipeline uses to
    * pick which template family to inspect first.
    *
    * Nodes are the documents appearing in `pairs`; every node of an
    * undirected pair graph has degree ≥ 1, so there is no dangling-mass
    * term. A FIXED `iters` power iterations (not convergence-tested) keeps
    * the computation a pure function of the input — the DuckDB oracle
    * unrolls the same rounds as CTEs. Rank state is EXACT INTEGER
    * pico-units (10⁻¹²) end to end (round-9 verdict #6, retiring the
    * previous round-to-12-decimals double sums): contributions are
    * floor_div(rank_pico, deg), their per-node sum is an exact integer
    * sum (order-free by construction, where a rounded double sum merely
    * pinned the order at 12 dp), the damping multiply is a rational
    * dm/10⁶ in integer arithmetic, and the only float op left is the
    * final /1e12 display division. Mass leaks < 1 pico per floor — a few
    * ×10⁻¹² per iteration globally, invisible at the 8-dp output.
    *
    * Plan shape per iteration: one keyed join (ranks ⨝ out-edges on src —
    * AQE broadcasts the rank side when small), one keyed aggregate
    * (contributions by dst), one keyed left join back to the roster; the
    * teleport scalar rides as a broadcast 1-row cross join. State between
    * iterations is one (id, rank) frame — O(nodes), partitioned, never on
    * the driver. At 100 TB the edge list dominates and every shuffle here
    * is keyed on its natural column; a whale hub makes one big aggregate
    * partition (mitigable by the two-stage salted-sum pattern in [[Skew]]
    * if ever needed). */
  def pageRank(pairs: DataFrame, damping: Double = 0.85, iters: Int = 5): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // pre-persisted input (the session-shared simhash pair graph) is used
    // as-is — re-persist/unpersist here would evict the caller's cache
    val pre = graft.RunHygiene.preMaterialized(pairs)
    val p = if (pre) pairs else graft.RunHygiene.track(pairs.persist(lvl))
    if (!pre) p.count() // fill once: both union branches read it
    val edges = graft.RunHygiene.track(
      p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .distinct()
        .persist(lvl))
    edges.count() // every iteration reads edges — materialize once
    if (!pre) p.unpersist()
    val deg = graft.RunHygiene.track(
      edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .select(col("src").as("id"), col("deg")).persist(lvl))
    deg.count()
    val outEdges = graft.RunHygiene.track(
      edges.join(deg, edges("src") === deg("id"))
        .select(col("src"), col("dst"), col("deg")).persist(lvl))
    outEdges.count()
    val nn = broadcast(deg.agg(count(lit(1)).as("n_nodes")))

    // floor_div for non-negative integers, exact through decimal (the pico
    // products reach ~8.5e17 — past double's 2^53 but comfortable in
    // decimal(38,0); all quantities here are ≥ 0 so trunc = floor)
    val dec = "decimal(38,0)"
    def floorDiv(x: Column, y: Column): Column =
      ((x.cast(dec) - x.cast(dec) % y.cast(dec)) / y.cast(dec)).cast("long")
    val Pico = 1000000000000L
    val dm = math.round(damping * 1e6) // damping as a rational dm/1e6

    var ranks = deg.select("id").crossJoin(nn)
      .select(col("id"), floorDiv(lit(Pico), col("n_nodes")).as("rank_pico"))
    for (_ <- 1 to iters) {
      val contribs = ranks.join(outEdges, ranks("id") === outEdges("src"))
        .select(col("dst"), floorDiv(col("rank_pico"), col("deg")).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = deg.select("id").join(contribs, col("id") === col("dst"), "left")
        .crossJoin(nn)
        .select(col("id"),
          (floorDiv(lit((1000000L - dm) * Pico), lit(1000000L) * col("n_nodes")) +
            floorDiv(lit(dm) * coalesce(col("s"), lit(0L)), lit(1000000L)))
            .as("rank_pico"))
    }
    deg.join(ranks, Seq("id"))
      .select(col("id").as("doc_id"), col("deg").as("degree"),
        round(col("rank_pico").cast("double") / lit(1e12), 8).as("pagerank"))
      .orderBy("doc_id")
  }

  /** Bounded-round k-core peel (Seidman 1983's coreness; the synchronized
    * peeling round is Matula–Beck's algorithm parallelized — the standard
    * distributed formulation): `rounds` rounds of "drop every node whose
    * degree among still-alive nodes is < k". Survivors approximate the
    * k-core from above, monotonically tightening each round; a FIXED round
    * count (not a fixpoint test) keeps the output a pure function of the
    * input so the DuckDB oracle can unroll the identical rounds as CTEs —
    * the [[pageRank]] discipline. On the dedup near-dup graph the k-core
    * is the dense template-family nucleus: nodes that survive peeling sit
    * in tangles of mutual near-duplicates, the first candidates for
    * wholesale removal where pagerank merely ranks hubs.
    *
    * Plan shape per round: two keyed LEFT SEMI joins restrict the
    * (persisted, bidirectional) edge frame to alive×alive, one keyed
    * count per src = degree, one filter — all shuffles keyed on node id,
    * state between rounds is ONE id frame, localCheckpoint'd so lineage
    * stays flat (the [[graft.operators.Dedup.dedupClusters]] lesson — the
    * alive frame feeds two semi-joins, doubling lineage per round
    * otherwise). Pure integer arithmetic — exact by construction.
    *
    * Output: survivors after `rounds` with their within-survivor degree
    * (0 when the final round peeled all the node's neighbors but not the
    * node — the next round WOULD drop it; the bounded contract reports it
    * honestly). */
  def kCore(pairs: DataFrame, k: Int = 2, rounds: Int = 4): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // pre-persisted input (the session-shared simhash pair graph) is used
    // as-is — re-persist/unpersist here would evict the caller's cache
    val pre = graft.RunHygiene.preMaterialized(pairs)
    val p = if (pre) pairs else graft.RunHygiene.track(pairs.persist(lvl))
    if (!pre) p.count() // fill once: both union branches read it
    val edges = graft.RunHygiene.track(
      p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .distinct()
        .persist(lvl))
    edges.count() // every round reads edges — materialize once
    if (!pre) p.unpersist()
    def aliveEdges(alive: DataFrame): DataFrame = edges
      .join(alive.select(col("id").as("src")), Seq("src"), "leftsemi")
      .join(alive.select(col("id").as("dst")), Seq("dst"), "leftsemi")
    var alive = graft.RunHygiene.track(
      edges.select(col("src").as("id")).distinct().localCheckpoint(true))
    for (_ <- 1 to rounds) {
      alive = graft.RunHygiene.track(
        aliveEdges(alive)
          .groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select("id")
          .localCheckpoint(true))
    }
    val degF = aliveEdges(alive)
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("core_deg"))
    alive.join(degF, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"))
      .orderBy("doc_id")
  }

  /** Resource-Allocation link prediction (Zhou, Lü & Zhang 2009) over an
    * undirected pair graph: for node pairs NOT yet linked, score
    * RA(x,y) = Σ_{z ∈ N(x)∩N(y)} 1/deg(z), emitted as the top `k`
    * predicted links. RA is chosen over the more famous Adamic-Adar
    * deliberately: 1/deg sums as EXACT integer micro-units
    * (1000000 div deg), so the score is order-independent and the DuckDB
    * twin matches bit-for-bit, where AA's Σ 1/ln(deg) would be a
    * partitioning-dependent float sum (and RA outperforms AA in the
    * original paper's evaluation anyway).
    *
    * Plan shape: two-hop path enumeration keyed on the MIDDLE node — a
    * self-join of the bidirectional edge list on z — then an anti-join
    * against existing edges and one keyed rollup. Candidate volume is
    * Σ_z deg(z)², the known cost law of common-neighbor methods; the
    * `hubCap` filter excludes high-degree bridges from generating paths
    * (the standard mitigation — a hub's common-neighbor evidence is
    * near-zero information AND quadratic cost, so production systems drop
    * it; the cap makes the 100 TB cost deg-bounded by construction). The
    * final top-k is TakeOrderedAndProject with full tie-break, never a
    * global sort. */
  def linkPrediction(pairs: DataFrame, hubCap: Int = 256, k: Int = 100): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = graft.RunHygiene.track(
      pairs.select(col("pa"), col("pb")).distinct().persist(lvl))
    e.count() // feeds bi (twice), the anti-join, and deg — fill once
    val bi = e.select(col("pa").as("x"), col("pb").as("y"))
      .unionAll(e.select(col("pb").as("x"), col("pa").as("y")))
    val deg = graft.RunHygiene.track(
      bi.groupBy("x").agg(count(lit(1)).as("d")).persist(lvl))
    deg.count()
    val bridges = bi.join(deg.filter(col("d") <= hubCap), Seq("x"))
      .select(col("x").as("z"), col("y").as("n"), col("d"))
    val cand = bridges.as("b1").join(bridges.as("b2"),
        col("b1.z") === col("b2.z") && col("b1.n") < col("b2.n"))
      .select(col("b1.n").as("pa"), col("b2.n").as("pb"), col("b1.d").as("dz"))
    cand.join(e, Seq("pa", "pb"), "left_anti")
      .groupBy("pa", "pb")
      .agg(sum(expr("1000000L div dz")).as("ra_micro"),
        count(lit(1)).as("n_common"))
      .withColumn("ra_micro", col("ra_micro").cast("long"))
      .orderBy(col("ra_micro").desc, col("pa"), col("pb"))
      .limit(k)
  }
}
