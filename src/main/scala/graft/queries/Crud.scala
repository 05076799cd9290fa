package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.6 Q36: the reference's CRUD semantics (A4 lookup, A5 delete,
  * A6 update — application.kt:279–348) expressed as before/after-snapshot
  * queries over `orders`. The real mutating write path (copy-on-write parquet
  * snapshots keyed like tank's (hash, uid)) lives in
  * [[graft.sources.FeatureStore]] and is exercised by its ScalaTest spec;
  * these three queries gate the *semantics* against the oracle.
  */
object Crud {

  private val Key = 42L

  def defs: Seq[QueryDef] = Seq(q36a, q36b, q36c)

  /** A4: point lookup by key. */
  val q36a: QueryDef = QueryDef(
    "q36a_lookup",
    Sql.canon(
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |  ${Sql.ts("o_orderdate")} AS o_orderdate, o_orderpriority
         |FROM orders WHERE o_orderkey = $Key""".stripMargin,
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))) { (s, d) =>
    Canon(Tables.orders(s, d)
      .filter(col("o_orderkey") === Key)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
  }

  /** A5: the after-delete snapshot aggregate. */
  val q36b: QueryDef = QueryDef(
    "q36b_delete",
    Sql.canon(
      s"""SELECT COUNT(*) AS n_remaining, ${Sql.moneySum("o_totalprice")} AS total_spent
         |FROM orders WHERE o_orderkey <> $Key""".stripMargin,
      Seq("n_remaining", "total_spent"))) { (s, d) =>
    Canon(Tables.orders(s, d)
      .filter(col("o_orderkey") =!= Key)
      .agg(count(lit(1)).as("n_remaining"),
        Canon.moneySum(col("o_totalprice")).as("total_spent")))
  }

  /** A6: update-preserves-other-attrs — the updated row's customer history
    * after setting the row's status, all other columns untouched.
    */
  val q36c: QueryDef = QueryDef(
    "q36c_update",
    Sql.canon(
      s"""SELECT o.o_orderkey,
         |  CASE WHEN o.o_orderkey = $Key THEN 'X' ELSE o.o_orderstatus END AS o_orderstatus,
         |  o.o_totalprice, ${Sql.ts("o.o_orderdate")} AS o_orderdate
         |FROM orders o
         |WHERE o.o_custkey = (SELECT o_custkey FROM orders WHERE o_orderkey = $Key)""".stripMargin,
      Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"))) { (s, d) =>
    val o = Tables.orders(s, d)
    val keyCust = o.filter(col("o_orderkey") === Key).select(col("o_custkey").as("k"))
    Canon(o.join(broadcast(keyCust), o("o_custkey") === col("k"), "left_semi")
      .select(col("o_orderkey"),
        when(col("o_orderkey") === Key, lit("X")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate")))
  }
}
