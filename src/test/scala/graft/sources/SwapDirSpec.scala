package graft.sources

import graft.SparkSpec

/** The shared write-sibling-then-swap device behind Bm25Store/IvfStore
  * compaction: a failed sibling write must leave the current store
  * untouched and readable (the "reads stay consistent until the swap"
  * half of the contract), and a successful swap must leave exactly the
  * rewritten content with no `_compact` residue.
  */
class SwapDirSpec extends SparkSpec {

  test("a failed sibling write leaves the current dir untouched") {
    import spark.implicits._
    val dir = s"/tmp/swapdir_spec_fail_${System.nanoTime}/store"
    Seq(1L, 2L, 3L).toDF("v").write.parquet(dir)
    intercept[java.io.IOException] {
      SwapDir(spark, dir) { tmp =>
        // partial sibling content, then the crash
        Seq(9L).toDF("v").write.parquet(tmp)
        throw new java.io.IOException("injected mid-rewrite")
      }
    }
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L), "current store mutated by a failed compaction")
  }

  test("a successful swap installs the rewritten content, no residue") {
    import spark.implicits._
    val dir = s"/tmp/swapdir_spec_ok_${System.nanoTime}/store"
    Seq(1L, 2L, 2L).toDF("v").write.parquet(dir)
    SwapDir(spark, dir) { tmp =>
      spark.read.parquet(dir).distinct().write.parquet(tmp)
    }
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "_compact")),
      "sibling residue left behind")
  }

  test("a stale sibling from an earlier crash is discarded, not swapped in") {
    import spark.implicits._
    val dir = s"/tmp/swapdir_spec_stale_${System.nanoTime}/store"
    Seq(1L, 2L).toDF("v").write.parquet(dir)
    Seq(99L).toDF("v").write.parquet(dir + "_compact") // crashed prior run
    SwapDir(spark, dir) { tmp =>
      spark.read.parquet(dir).write.parquet(tmp)
    }
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L), "stale _compact content leaked into the store")
  }
}
