package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ShardingSpec extends SparkSpec {

  private def docs = graft.queries.Tables.documents(spark, Sf)

  test("trainOrder: deterministic (shard, pos) addresses, contiguous per shard") {
    val a = Sharding.trainOrder(docs, 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    val b = Sharding.trainOrder(docs, 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(a.sameElements(b), "re-run must reproduce the identical order")
    assert(a.length == docs.count())
    // every shard's positions are exactly 1..size (a rewritable shard is
    // a complete, gap-free unit)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length),
        s"shard $shard positions not contiguous")
    }
  }

  test("trainOrderBySize derives ceil(n/docsPerShard) hash-balanced shards") {
    val n = docs.count() // sf0.001: 500
    val got = Sharding.trainOrderBySize(docs, docsPerShard = 100L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val nShards = math.ceil(n.toDouble / 100).toInt
    assert(got.map(_._2).distinct.sorted.sameElements(0 until nShards),
      s"expected shards 0..${nShards - 1}, got ${got.map(_._2).distinct.sorted.mkString(",")}")
    // hash balance: each shard within 3σ-ish of the 100-doc target
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(math.abs(rows.length - 100) <= 40,
        s"shard $shard badly unbalanced: ${rows.length} docs")
    }
    // per-shard positions stay contiguous here too
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length),
        s"shard $shard positions not contiguous")
    }
    // a shard-size larger than the corpus degenerates to ONE shard
    val one = Sharding.trainOrderBySize(docs, docsPerShard = 10 * n)
    assert(one.select(col("shard")).distinct().count() == 1L)
  }

  test("the count relation broadcasts — no corpus-sized shuffle added") {
    val df = Sharding.trainOrderBySize(docs, docsPerShard = 100L)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"shard count not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("x88 registry entry delegates to the operator (same addresses)") {
    val fromOp = graft.queries.Canon(Sharding.trainOrder(docs, 16))
      .collect().map(_.toSeq)
    val fromRegistry = graft.SparkEntry.queries("x88_train_order")(spark, Sf)
      .collect().map(_.toSeq)
    assert(fromOp.sameElements(fromRegistry))
  }
}
