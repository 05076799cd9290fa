package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TokenBudgetSpec extends SparkSpec {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
      r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"))).toSet

  test("two-phase cut is bit-identical to the one-window plan (synthetic)") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 500L).map { i =>
      val lang = Seq("en", "de", "zh")(rnd.nextInt(3))
      (i, lang, Seq.fill(1 + rnd.nextInt(30))("tok").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val fast = rows(TokenBudget.budgetCut(docs, budget = 400))
    val naive = rows(TokenBudget.budgetCutNaive(docs, budget = 400))
    assert(fast == naive)
    assert(fast.nonEmpty && fast.size < 500, s"no real cut: ${fast.size}")
  }

  test("two-phase cut matches the one-window plan on the real corpus") {
    val docs = graft.queries.Tables.documents(spark, Sf)
    val fast = rows(TokenBudget.budgetCut(docs, budget = 2000))
    val naive = rows(TokenBudget.budgetCutNaive(docs, budget = 2000))
    assert(fast == naive && fast.nonEmpty)
  }

  test("every group's kept total is within budget and maximal in hash order") {
    val docs = (1L to 100L).map(i => (i, "en", Seq.fill(10)("t").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val kept = TokenBudget.budgetCut(docs, budget = 95)
    // 10 tokens each: exactly 9 docs fit, cum max 90
    assert(kept.count() == 9)
    assert(kept.agg(max("cum_tokens")).as[Long].head() == 90L)
    // the kept set is the hash-order prefix: its max hash < every dropped hash
    val keptH = kept.select(md5(col("doc_id").cast("string"))).as[String].collect().toSet
    val allH = docs.select(md5(col("doc_id").cast("string"))).as[String].collect().toSet
    val dropped = allH -- keptH
    assert(keptH.max < dropped.min, "kept set is not a hash-order prefix")
  }

  test("NULL groups cut exactly like the naive plan's NULL partition") {
    val docs = Seq(
      (1L, Some("en"), "a b c"), (2L, None, "d e f g"),
      (3L, None, "h i"), (4L, Some("en"), "j k l m n"), (5L, None, "o p q")
    ).toDF("doc_id", "lang", "text")
    val fast = rows(TokenBudget.budgetCut(docs, budget = 6))
    val naive = rows(TokenBudget.budgetCutNaive(docs, budget = 6))
    assert(fast == naive)
    assert(fast.exists(_._2 == null), s"NULL-group docs vanished: $fast")
  }

  test("non-string group columns work (grouping is type-opaque)") {
    val docs = Seq((1L, 7, "a b c"), (2L, 7, "d e"), (3L, 8, "f g h i"))
      .toDF("doc_id", "src", "text")
    val fast = TokenBudget.budgetCut(docs, budget = 4, groupCol = "src")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("src"),
        r.getAs[Long]("cum_tokens"))).toSet
    val naive = TokenBudget.budgetCutNaive(docs, budget = 4, groupCol = "src")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("src"),
        r.getAs[Long]("cum_tokens"))).toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("budget 0 keeps nothing; budget >= total keeps everything") {
    val docs = Seq((1L, "en", "a b c"), (2L, "en", "d e")).toDF("doc_id", "lang", "text")
    assert(TokenBudget.budgetCut(docs, budget = 0).count() == 0)
    val all = TokenBudget.budgetCut(docs, budget = 100)
    assert(all.count() == 2)
    assert(all.agg(max("cum_tokens")).as[Long].head() == 5L)
  }
}
