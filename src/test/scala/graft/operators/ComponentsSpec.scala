package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], maxIters: Int = 50): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("doc_a", "doc_b"), maxIters = maxIters)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component"))
      .toMap

  test("two disjoint pairs stay two components") {
    assert(cc(Seq((1L, 2L), (10L, 11L))) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a chain collapses to the minimum endpoint (diameter > 1 round)") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.keySet == (1L to 10L).toSet)
    assert(got.values.toSet == Set(1L), s"chain split: $got")
    // the probe instrumentation must reflect this call: a 10-chain needs
    // multiple propagation rounds (ScaleProbe records lastRounds per probe
    // point for the flat-rounds-at-scale observation)
    assert(Components.lastRounds.get >= 2,
      s"lastRounds not recorded: ${Components.lastRounds.get}")
  }

  test("a triangle plus a tail is one component labeled by the min id") {
    // 7-8-9 triangle, tail 9-20; min id 7 wins everywhere
    val got = cc(Seq((7L, 8L), (8L, 9L), (7L, 9L), (9L, 20L)))
    assert(got == Map(7L -> 7L, 8L -> 7L, 9L -> 7L, 20L -> 7L))
  }

  test("edge direction does not matter (min id on either side)") {
    assert(cc(Seq((5L, 3L))) == Map(5L -> 3L, 3L -> 3L))
  }

  test("duplicate and self edges are harmless") {
    val got = cc(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("empty pair set yields an empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("labels match a union-find reference on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 200
    val edges = Seq.fill(220)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
    // canonicalize the reference label to the component min (find() already
    // unions toward the min root, but path order can matter — recompute)
    val byComp = want.groupBy(_._2).flatMap { case (_, m) =>
      val mn = m.keys.min; m.keys.map(_ -> mn)
    }
    assert(cc(edges) == byComp)
  }

  test("non-convergence within maxIters fails loudly, never truncates") {
    val chain = (1L until 30L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] { cc(chain, maxIters = 2) }
    assert(ex.getMessage.contains("not converged"))
  }

  private def ccStar(pairs: Seq[(Long, Long)], maxIters: Int = 50): Map[Long, Long] =
    Components.connectedComponentsStar(pairs.toDF("doc_a", "doc_b"), maxIters = maxIters)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component"))
      .toMap

  test("star contraction equals propagation on seeded random graphs") {
    // several densities: sparse (forest-ish, long chains), near the
    // percolation threshold, and dense (few big components)
    for ((nEdges, seed) <- Seq((60, 1), (200, 2), (420, 3))) {
      val rnd = new scala.util.Random(seed)
      val n = 200
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(ccStar(edges) == cc(edges),
        s"star != propagation at nEdges=$nEdges seed=$seed")
    }
  }

  test("star contraction handles the degenerate inputs like propagation") {
    assert(ccStar(Seq.empty).isEmpty)
    assert(ccStar(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    assert(ccStar(Seq((5L, 3L))) == Map(5L -> 3L, 3L -> 3L))
  }

  test("star contraction resolves a chain whose diameter defeats propagation") {
    // diameter 60 > propagation's maxIters=20 — propagation must fail
    // LOUDLY there, while star contraction converges in O(log n) rounds
    // well inside the same budget
    val chain = (1L until 61L).map(i => (i, i + 1))
    intercept[IllegalStateException] { cc(chain, maxIters = 20) }
    val got = ccStar(chain, maxIters = 20)
    assert(got.keySet == (1L to 61L).toSet)
    assert(got.values.toSet == Set(1L), s"chain split: ${got.toSeq.sorted.take(10)}")
  }

  test("output schema is (node BIGINT, component BIGINT) even from int input") {
    val df = Components.connectedComponents(
      Seq((1, 2)).toDF("doc_a", "doc_b"))
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("node", "long"), ("component", "long")))
  }

  private def compact(pairs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    Components.compactPairs(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq

  test("compaction preserves components at the spanning-star size") {
    for ((nEdges, seed) <- Seq((60, 7), (200, 8), (420, 9))) {
      val rnd = new scala.util.Random(seed)
      val n = 200
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val before = cc(edges)
      val star = compact(edges)
      // same components from the compacted relation — minus SINGLETONS
      // (self-loop-only nodes; real pair stores hold none), which carry no
      // dup structure and vanish
      val multi = before.filter { case (_, c) => before.count(_._2 == c) > 1 }
      assert(cc(star) == multi, s"components changed at seed=$seed")
      // spanning-star floor: |V| - #components pairs, every hub a component min
      val nComponents = multi.values.toSet.size
      assert(star.size == multi.size - nComponents,
        s"size ${star.size} != ${multi.size} - $nComponents at seed=$seed")
      star.foreach { case (hub, member) =>
        assert(before(member) == hub, s"pair ($hub,$member) not hub-oriented")
      }
      // idempotent: a star compacts to itself
      assert(compact(star).toSet == star.toSet, s"not idempotent at seed=$seed")
    }
  }

  test("compaction of a dense clique drops to size-1 pairs") {
    val clique = for (i <- 1L to 30L; j <- (i + 1) to 30L) yield (i, j)
    val star = compact(clique)
    assert(star.toSet == (2L to 30L).map(m => (1L, m)).toSet,
      s"clique star wrong: ${star.take(5)} (size ${star.size} vs ${clique.size} input)")
  }

  test("compaction degenerate inputs: empty, self-loop-only, single pair") {
    assert(compact(Seq.empty).isEmpty)
    // self-loop-only nodes are their own component -> nothing to keep
    assert(compact(Seq((4L, 4L))).isEmpty)
    assert(compact(Seq((5L, 3L))) == Seq((3L, 5L)))
  }
}
