package graft.util

import graft.SparkSpec

class MaterializeSpec extends SparkSpec {

  test("eager() uses a RELIABLE checkpoint when a checkpoint dir is set") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val df = Materialize.eager((1 to 100).toDF("v").filter($"v" % 2 === 0))
      assert(df.count() == 50)
      // the checkpoint landed in the DURABLE dir (survives executor loss),
      // not in executor-local block storage
      assert(df.rdd.toDebugString.contains("ReliableCheckpoint"),
        s"expected a reliable checkpoint:\n${df.rdd.toDebugString}")
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "no checkpoint files written to the checkpoint dir")
    } finally {
      // Option(null) clears the dir, restoring localCheckpoint behavior for
      // every other suite sharing this context
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("eager() falls back to localCheckpoint without a checkpoint dir") {
    import spark.implicits._
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "fixture: checkpoint dir should be unset")
    val df = Materialize.eager((1 to 10).toDF("v"))
    assert(df.count() == 10)
    assert(df.rdd.toDebugString.contains("LocalCheckpoint"),
      s"expected a local checkpoint:\n${df.rdd.toDebugString}")
  }
}
