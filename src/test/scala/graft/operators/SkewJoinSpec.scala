package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  // heavily skewed left side: 90% of rows share key 1
  private lazy val left = (1 to 2000).map(i =>
    (if (i % 10 == 0) i.toLong else 1L, s"payload$i")).toDF("k", "payload")
  private lazy val right = (1L to 200L).map(i => (i, s"dim$i")).toDF("rk", "attr")

  test("saltedJoin equals the plain inner join on skewed data") {
    val plain = left.join(right, left("k") === right("rk"))
      .select("k", "payload", "attr")
    val salted = SkewJoin.saltedJoin(left, right, "k", "rk")
      .select("k", "payload", "attr")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin spreads a hot key over multiple salt buckets") {
    val saltSrc = left.columns.map(col)
    val salts = left.filter(col("k") === 1L)
      .withColumn("_salt", pmod(xxhash64(saltSrc: _*), lit(8L)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts >= 6, s"hot key only landed in $salts buckets")
  }

  test("saltedCount equals the plain groupBy count") {
    val plain = left.groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedCount(left, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salting is deterministic across runs") {
    val a = SkewJoin.saltedJoin(left, right, "k", "rk").count()
    val b = SkewJoin.saltedJoin(left, right, "k", "rk").count()
    assert(a == b)
  }
}
