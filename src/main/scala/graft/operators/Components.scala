package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Materialize

/** Connected components over a pair relation — the resolution step that
  * turns near-dup PAIRS (x40/x45 output) into duplicate CLUSTERS so a
  * pipeline can keep exactly one document per cluster. Without it, pairwise
  * dedup under-removes: for a triangle A~B, B~C, A~C, dropping "the second
  * doc of every pair" keeps A only by luck of pair ordering, while the
  * component view makes {A,B,C} one group with one keeper.
  *
  * Algorithm: hash-min label propagation. Every node starts labeled with its
  * own id; each round every node takes the min label among itself and its
  * neighbors; converged when no label changes. The final label is the
  * component's MINIMUM doc id — which doubles as the canonical keeper, so no
  * second pass is needed to elect one.
  *
  * Scale shape (100 TB posture):
  *  - The input is the PAIR relation, not the corpus: candidates-sized
  *    (near-dup rate x corpus), orders of magnitude smaller than the
  *    documents table. Each round is one equi-join of the edge list with the
  *    label relation (shuffle keyed on doc id) plus one keyed min-aggregate —
  *    no cross joins, no driver-side adjacency.
  *  - Rounds = component DIAMETER, not corpus size. LSH dup clusters are
  *    near-cliques (members collide in the same band buckets), so diameter
  *    is small (typically <= 3) and the loop runs a handful of rounds. For
  *    adversarially chain-shaped graphs the known O(log n)-round refinement
  *    is the alternating large-star/small-star algorithm (Kiveris et al.,
  *    "Connected Components in MapReduce and Beyond", SoCC'14); the
  *    propagation loop here keeps the per-round plan simpler and is bounded
  *    by `maxIters` with a LOUD failure, never a silently-wrong answer.
  *  - Each round's label relation is eagerly materialized
  *    ([[graft.util.Materialize.eager]]): iterative DataFrame loops
  *    otherwise stack lineage (round k replans rounds 1..k-1) and blow up
  *    planning time; the materialize also gives the convergence check its
  *    count without a second computation.
  *
  * Reference behavior context: the reference engine has no graph step — its
  * dedup surface stops at pair emission. This operator is part of the
  * mandated beyond-reference training-pipeline surface (builder prompt;
  * SURVEY.md §2.7).
  */
object Components {

  /** Rounds the most recent components call on the CURRENT THREAD ran
    * (probe/spec instrumentation: the 100 TB claim is that rounds track
    * component DIAMETER — flat as the corpus grows — and
    * [[graft.tools.ScaleProbe]] records this alongside wall ratios).
    * Thread-local, not JVM-global: sbt runs suites in parallel, and a
    * JVM-global would let one suite's 1-round call clobber the value
    * another suite just asserted on.
    */
  private[graft] object lastRounds {
    private val tl = ThreadLocal.withInitial[Integer](() => 0)
    def get: Int = tl.get
    def set(v: Int): Unit = tl.set(v)
  }

  /** Connected components of the undirected graph given by `pairs`
    * (columns `srcCol`, `dstCol`, any integral type — cast to BIGINT, the
    * engine-wide id type). Returns (node BIGINT, component BIGINT) for every
    * node appearing in at least one pair, where `component` is the minimum
    * node id of the node's component.
    *
    * Fails with IllegalStateException if propagation has not converged
    * after `maxIters` rounds (graph diameter > maxIters): a truncated
    * component labeling is silently WRONG (two halves of one cluster keep
    * two "keepers"), so non-convergence must be loud. Choosing `maxIters`
    * (and when to prefer star contraction): DEDUP_TUNING.md §3.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String = "doc_a",
                          dstCol: String = "doc_b", maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst"))
    // Symmetrize once; the edge relation is reused every round, so pin it.
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    // init FOLDED with the first propagation round: from identity labels,
    // round 1's result is min(node, min neighbors) — one aggregation over
    // the edge list, replacing the separate distinct-nodes pass plus a full
    // join round (per-call fixed cost matters: the loop usually runs only
    // diameter ≈ 2–3 rounds on dup graphs)
    var labels = Materialize.eager(
      sym.groupBy(col("src").as("node"))
        .agg(min(least(col("src"), col("dst"))).as("component")))
    var changed = 1L
    var round = 1
    try {
      while (changed > 0 && round < maxIters) {
        // min label among each node's neighbors (every node has >= 1
        // neighbor by construction — nodes come from the edge endpoints)
        val nbrMin = sym
          .join(labels.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(min(col("component")).as("nbr_min"))
        val next = labels.join(nbrMin, Seq("node"), "left")
          .select(col("node"),
            least(col("component"), coalesce(col("nbr_min"), col("component")))
              .as("component"),
            (col("nbr_min") < col("component")).as("_chg"))
        val mat = Materialize.eager(next)
        changed = mat.filter(col("_chg")).count()
        labels = mat.drop("_chg")
        round += 1
      }
    } finally sym.unpersist(false) // also on a mid-round job failure
    lastRounds.set(round)
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIters rounds " +
          "(component diameter exceeds maxIters); raise maxIters or use " +
          "connectedComponentsStar for chain-shaped graphs")
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the O(log n)-ROUND alternative to
    * [[connectedComponents]]'s label propagation for graphs whose
    * component DIAMETER is large (drift chains), where propagation would
    * need diameter rounds. Same API and output contract: (node BIGINT,
    * component BIGINT = the component's minimum node id) for every node
    * appearing in at least one pair.
    *
    * One round = two bounded-shuffle passes over the (candidates-sized)
    * edge relation, each a keyed min-aggregate plus an equi-join — no
    * driver-side adjacency, no cross joins:
    *  - large-star: every node x computes m = min({x} ∪ N(x)); each
    *    LARGER neighbor y > x re-points to m (edge (y, m)).
    *  - small-star (on parent-oriented edges u > v): every node u with
    *    smaller neighbors computes m = min N<(u); all its smaller
    *    neighbors and u itself re-point to m.
    * Both preserve connectivity and strictly shrink star height; the edge
    * set converges to a star forest (child → component min) in O(log n)
    * alternations regardless of diameter. Each round's edge relation is
    * eagerly materialized ([[Materialize.eager]]) to keep lineage flat;
    * convergence = the round changed nothing (an EXCEPT over the
    * pairs-sized edge sets, exact — no sampled/hashed equality that could
    * declare a wrong fixpoint).
    *
    * When to prefer which: DEDUP_TUNING.md §3 — propagation's per-round
    * plan is simpler and wins on near-clique dup graphs (diameter ≤ 3);
    * star contraction wins whenever diameter approaches `maxIters`.
    */
  def connectedComponentsStar(pairs: DataFrame, srcCol: String = "doc_a",
                              dstCol: String = "doc_b", maxIters: Int = 50): DataFrame = {
    val raw = pairs.select(col(srcCol).cast(LongType).as("u"),
      col(dstCol).cast(LongType).as("v"))
    // every input endpoint must be labeled, including self-loop-only nodes
    val nodes = raw.select(col("u").as("node"))
      .union(raw.select(col("v").as("node"))).distinct()
    // parent-oriented canonical edges u > v (self loops carry no
    // connectivity; the final left-join labels their nodes as their own)
    var edges = Materialize.eager(
      raw.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct())
    var changed = edges.count() // enter the loop iff there are edges at all
    var round = 0
    while (changed > 0 && round < maxIters) {
      // large-star over the SYMMETRIZED neighbor relation
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u").as("x"))
        .agg(min(col("v")).as("mn"))
        .select(col("x"), least(col("x"), col("mn")).as("m"))
      val large = sym.join(mins, sym("u") === mins("x"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star over the parent-oriented result (all neighbors < u)
      val g = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large.join(g, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(g.select(col("u"), col("m").as("v")))
        .distinct()
      val next = Materialize.eager(small)
      // exact convergence: the round is a no-op on the edge SET (counts
      // alone can agree while edges differ, so compare both directions
      // via one anti-semantics EXCEPT each way — pairs-sized, cheap)
      changed =
        if (next.count() != edges.count()) 1L
        else next.exceptAll(edges).count()
      edges = next
      round += 1
    }
    lastRounds.set(round)
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponentsStar: not converged after $maxIters rounds — " +
          "this bounds O(log n) alternations and should never bind on real " +
          "graphs; raise maxIters")
    // converged star forest: children point at their component min; roots
    // (and self-loop-only nodes) label themselves
    nodes.join(edges.select(col("u").as("node"), col("v").as("component")),
        Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component"))
  }

  /** COMPACT a pair relation to its spanning STAR: one (component-min,
    * member) pair per non-hub member. The result has the same connected
    * components as the input from |V|−#components pairs instead of |E| —
    * the compaction device the accumulating pair stores reference
    * ([[graft.streaming.CurationStreams.dupComponents]] /
    * `semanticDupComponents` fail loudly when their store exceeds its
    * budget; rewriting the store with this relation resets |E| to its
    * information-theoretic floor without changing any resolution answer).
    * Dense dup cliques are the win case: a 1000-member clique holds up to
    * ~500k verified pairs but compacts to 999.
    *
    * Cost: one [[connectedComponents]] resolution (candidates-sized, the
    * same job the consuming pipeline already runs) + a filter — no extra
    * shuffle beyond it. Idempotent: compacting a star yields itself.
    * Column names follow the input (`srcCol` = hub, `dstCol` = member).
    * SINGLETON components (only producible by self-loop input rows —
    * a verified near-dup pair store holds none, its pairs are strictly
    * `a < b`) carry no dup structure and vanish from the compacted
    * relation.
    */
  def compactPairs(pairs: DataFrame, srcCol: String = "doc_a",
                   dstCol: String = "doc_b", maxIters: Int = 50): DataFrame =
    connectedComponents(pairs, srcCol, dstCol, maxIters)
      .filter(col("node") =!= col("component"))
      .select(col("component").as(srcCol), col("node").as(dstCol))
}
