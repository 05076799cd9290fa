package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Registry wiring guards — failures here are silent-coverage bugs no
  * per-query gate can see: a `val xNN: QueryDef` that its module forgot
  * to list in `defs` simply vanishes from Verify/Bench/check.py and the
  * round's correctness surface shrinks without any test failing.
  */
class RegistrySpec extends AnyFunSuite {

  private val modules: Seq[AnyRef] =
    Seq(Relational, EventWindows, Spatial, TextOps, VectorOps,
      CurationOps, Crud)

  /** Every public `QueryDef`-typed member of every query module. */
  private def declared: Set[String] = modules.flatMap { o =>
    o.getClass.getMethods
      .filter(m => m.getParameterCount == 0 &&
        classOf[QueryDef].isAssignableFrom(m.getReturnType))
      .map(m => m.invoke(o).asInstanceOf[QueryDef].name)
  }.toSet

  test("every declared QueryDef is registered, exactly once, under a unique name") {
    val registered = graft.SparkEntry.registry.map(_.name)
    assert(registered.distinct.size == registered.size,
      s"duplicate registry names: ${registered.diff(registered.distinct)}")
    val unregistered = declared -- registered.toSet
    assert(unregistered.isEmpty,
      s"QueryDefs declared but missing from their module's defs: $unregistered")
    val phantom = registered.toSet -- declared
    assert(phantom.isEmpty, s"registered but not declared (?): $phantom")
  }

  test("every __VERIFY_OUT__ replay oracle references a registered producer") {
    val names = graft.SparkEntry.registry.map(_.name).toSet
    val refPat = "__VERIFY_OUT__/([A-Za-z0-9_]+)/".r
    graft.SparkEntry.oracleSql.foreach { case (consumer, sql) =>
      refPat.findAllMatchIn(sql).map(_.group(1)).foreach { producer =>
        assert(names.contains(producer),
          s"$consumer's oracle replays '$producer', which is not registered" +
            " — its output will never be written and DuckDB will error")
      }
    }
  }

  test("oracle SQL keys are exactly the oracled registry subset") {
    val withOracle = graft.SparkEntry.registry
      .collect { case QueryDef(n, _, Some(_)) => n }.toSet
    assert(graft.SparkEntry.oracleSql.keySet == withOracle)
  }
}
