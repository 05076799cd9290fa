package graft.sources

import graft.SparkSpec

/** The enforced single-mutating-writer guard behind every index-store
  * verb: a held marker blocks a second writer loudly, a crashed writer's
  * stale marker is stolen after the TTL, and both success and failure
  * release.
  */
class MutationGuardSpec extends SparkSpec {

  private def base = s"/tmp/mutguard_spec_${System.nanoTime}/store"

  test("a held guard makes a second writer fail loudly, not lose files") {
    val b = base
    val ex = intercept[IllegalStateException] {
      MutationGuard.withGuard(spark, b) {
        // second mutating verb arrives while the first holds the marker
        MutationGuard.withGuard(spark, b, waitMillis = 600L) { fail("acquired a held guard") }
      }
    }
    assert(ex.getMessage.contains("single-writer"))
  }

  test("the guard releases on success and on body failure") {
    val b = base
    MutationGuard.withGuard(spark, b) { () }
    intercept[RuntimeException] {
      MutationGuard.withGuard(spark, b) { throw new RuntimeException("boom") }
    }
    // both released: a fresh acquire succeeds immediately
    MutationGuard.withGuard(spark, b, waitMillis = 600L) { () }
  }

  test("a crashed writer's stale marker is stolen after the TTL") {
    val b = base
    val marker = new org.apache.hadoop.fs.Path(b + "_mutating")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(marker, false) // a writer that died holding it
    try out.write("dead 0\n".getBytes("UTF-8")) finally out.close()
    var ran = false
    MutationGuard.withGuard(spark, b, waitMillis = 2000L, ttlMillis = 1L) {
      ran = true
    }
    assert(ran, "stale marker not stolen")
    assert(!fs.exists(marker), "marker left behind after release")
  }

  test("staleness honors the HOLDER's declared TTL, not the stealer's") {
    val b = base
    val marker = new org.apache.hadoop.fs.Path(b + "_mutating")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a holder that declared a long TTL: NOT stealable even by a
    // session running a tiny TTL — it must wait and fail loudly
    val out = fs.create(marker, false)
    try out.write(s"longjob ${3600 * 1000L}\n".getBytes("UTF-8"))
    finally out.close()
    intercept[IllegalStateException] {
      MutationGuard.withGuard(spark, b, waitMillis = 800L, ttlMillis = 1L) {
        fail("stole an unexpired marker")
      }
    }
    // once the marker outlives the DECLARED TTL, it is stolen promptly
    // even under a long session TTL
    fs.delete(marker, false)
    val out2 = fs.create(marker, false)
    try out2.write("crashed 5\n".getBytes("UTF-8")) finally out2.close()
    var ran = false
    MutationGuard.withGuard(spark, b, waitMillis = 2000L,
        ttlMillis = 3600 * 1000L) { ran = true }
    assert(ran, "TTL-outlived marker not stolen")
  }

  test("a stolen marker makes the overlapped writer fail loudly at release") {
    val b = base
    val marker = new org.apache.hadoop.fs.Path(b + "_mutating")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ex = intercept[IllegalStateException] {
      MutationGuard.withGuard(spark, b) {
        // simulate a thief that stole after our TTL lapsed
        fs.delete(marker, false)
        val out = fs.create(marker, false)
        try out.write("thief 60000\n".getBytes("UTF-8"))
        finally out.close()
      }
    }
    assert(ex.getMessage.contains("stolen"))
    // and the thief's marker is left alone
    assert(fs.exists(marker), "overlapped writer deleted the thief's marker")
    fs.delete(marker, false): Unit
  }

  test("store verbs run under the guard (a held marker blocks an append)") {
    import spark.implicits._
    val dir = s"/tmp/mutguard_spec_store_${System.nanoTime}"
    GramHistory.create(spark, dir,
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"), k = 4,
      buckets = 2)
    val b = Bucketing.guardBase(spark, GramHistory.tableFor(dir))
    val inc = GramHistory.gramHashes(
      Seq((2L, "epsilon zeta eta theta")).toDF("doc_id", "text"), 4)
    // fast-fail for the spec: the default 30 s wait, conf-overridden
    spark.conf.set("spark.graft.store.guardWaitMillis", "600")
    try {
      intercept[IllegalStateException] {
        MutationGuard.withGuard(spark, b) {
          val t0 = System.currentTimeMillis
          try GramHistory.append(spark, dir, inc)
          finally assert(System.currentTimeMillis - t0 >= 600L,
            "append did not wait on the held guard")
        }
      }
    } finally spark.conf.unset("spark.graft.store.guardWaitMillis")
    GramHistory.invalidate(spark, dir)
  }
}
