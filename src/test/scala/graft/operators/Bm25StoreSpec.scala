package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25StoreSpec extends SparkSpec {

  private def tmpStore(): String = {
    val d = java.nio.file.Files.createTempDirectory("bm25store").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/idx"
  }

  private lazy val docs = graft.queries.Tables.documents(spark, Sf).cache()
  private val qs = graft.queries.CurationOps.Bm25QuerySet

  test("an empty-corpus store creates, queries and compacts without throwing") {
    val path = tmpStore()
    Bm25Store.create(spark, path, docs.limit(0))
    assert(Bm25Store.query(spark, path, qs, k = 5).count() == 0,
      "empty store must answer empty")
    Bm25Store.compact(spark, path)
    assert(Bm25Store.query(spark, path, qs, k = 5).count() == 0,
      "empty store must answer empty after compact")
  }

  test("queryTerms normalization equals the postings-side lower() on locale-adversarial input") {
    import spark.implicits._
    // the index is built with Spark's locale-independent lower(); the ONE
    // shared query normalization (Bm25.queryTerms) must match it token for
    // token — a regression to String.toLowerCase diverges under e.g. a
    // Turkish default locale ('I' -> dotless ı) and silently matches zero
    // postings. Adversarial set: dotted/dotless I, sharp s, final sigma.
    val adversarial = Seq("TITLE Index", "İstanbul I ı", "STRASSE groß",
      "ΣΟΦΟΣ σοφος", "MiXeD CaSe tOkEnS")
    adversarial.foreach { q =>
      val viaQueryTerms = Bm25.queryTerms(Seq((0, q))).map(_._2)
      val viaSparkLower = Seq(q).toDF("t")
        .select(lower(col("t"))).as[String].collect().head
        .split("\\s+").toSeq.distinct
      assert(viaQueryTerms == viaSparkLower,
        s"'$q': queryTerms $viaQueryTerms != lower() $viaSparkLower")
    }
  }

  test("index answers are bit-identical to the transient corpus scan") {
    val path = tmpStore()
    Bm25Store.create(spark, path, docs)
    val fromIndex = Bm25Store.query(spark, path, qs, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val fromScan = Bm25.topK(docs, qs, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(fromIndex.nonEmpty)
    assert(fromIndex == fromScan,
      s"index-only: ${fromIndex -- fromScan take 5}; scan-only: ${fromScan -- fromIndex take 5}")
  }

  test("query-time postings scan prunes to the terms' bucket partitions") {
    val path = tmpStore()
    Bm25Store.create(spark, path, docs, nBuckets = 64)
    // count distinct buckets the query terms hash into
    val termSet = qs.flatMap(_._2.toLowerCase.split("\\s+")).distinct
    import spark.implicits._
    val nTermBuckets = termSet.toDF("tok")
      .select(pmod(xxhash64(col("tok")), lit(64))).distinct().count()
    val df = Bm25Store.query(spark, path, qs, k = 10)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // partition pruning on the bucket directory column must reach the scan
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no bucket partition pruning in:\n$plan")
    // and the scan must actually read <= the terms' buckets, not all 64
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("postings"))
    assert(scanned.nonEmpty)
    assert(nTermBuckets < 64, "fixture must not cover every bucket")
  }

  test("append equals full rebuild bit-identically (postings, df, meta all merge)") {
    val pathInc = tmpStore()
    val pathFull = tmpStore()
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    assert(batch.count() > 0 && base.count() > 0)
    Bm25Store.create(spark, pathInc, base, nBuckets = 16)
    Bm25Store.append(spark, pathInc, batch)
    Bm25Store.create(spark, pathFull, docs, nBuckets = 16)
    def ans(p: String) = Bm25Store.query(spark, p, qs, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val inc = ans(pathInc)
    val full = ans(pathFull)
    assert(inc.nonEmpty)
    assert(inc == full,
      s"inc-only: ${inc -- full take 5}; full-only: ${full -- inc take 5}")
    // meta segments sum to the whole corpus (df/idf shift with N — exact
    // stats are what makes the scores above bit-match, not just the ranks)
    val m = Bm25Store.meta(spark, pathInc).collect().head
    assert(m.getInt(0) == 16 && m.getLong(1) == docs.count())
  }

  test("two appends compose: segment-merge is associative") {
    val path = tmpStore()
    val b0 = docs.filter(col("doc_id") % 3 === 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)
    Bm25Store.create(spark, path, b0, nBuckets = 16)
    Bm25Store.append(spark, path, b1)
    Bm25Store.append(spark, path, b2)
    val inc = Bm25Store.query(spark, path, qs, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val scan = Bm25.topK(docs, qs, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(inc == scan && inc.nonEmpty)
  }

  test("compact collapses segments without changing answers") {
    val path = tmpStore()
    val b0 = docs.filter(col("doc_id") % 3 === 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)
    Bm25Store.create(spark, path, b0, nBuckets = 16)
    Bm25Store.append(spark, path, b1)
    Bm25Store.append(spark, path, b2)
    def ans() = Bm25Store.query(spark, path, qs, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    def files(rel: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$path/$rel")).count(_.getName.endsWith(".parquet"))
    }
    val before = ans()
    val (pf0, df0, mf0) = (files("postings"), files("df"), files("meta"))
    Bm25Store.compact(spark, path)
    assert(ans() == before, "compaction changed query answers")
    // one meta segment, merged df rows (no token appears in >1 segment),
    // and strictly fewer files everywhere
    assert(files("meta") == 1, s"meta not collapsed: ${files("meta")} files")
    assert(files("postings") < pf0 && files("df") < df0 && mf0 > 1,
      s"compaction did not shrink file counts: postings $pf0->${files("postings")}, " +
        s"df $df0->${files("df")}, meta $mf0->${files("meta")}")
    val dupToks = spark.read.parquet(s"$path/df")
      .groupBy(col("bucket"), col("tok")).count().filter(col("count") > 1).count()
    assert(dupToks == 0, s"$dupToks (bucket, tok) pairs still span segments")
    // and the store still appends + answers correctly afterwards
    val probe = Seq(7 -> "table scan")
    assert(Bm25Store.query(spark, path, probe, k = 5).collect().nonEmpty)
  }

  test("segmentStat: listing-only trigger grows with appends, resets on " +
      "compact") {
    val path = tmpStore()
    val b0 = docs.filter(col("doc_id") % 3 === 0)
    Bm25Store.create(spark, path, b0, nBuckets = 16)
    val fresh = Bm25Store.segmentStat(spark, path)
    assert(fresh.buckets > 0 && fresh.metaSegments == 1L,
      s"fresh store stat off: $fresh")
    Bm25Store.append(spark, path, docs.filter(col("doc_id") % 3 === 1))
    Bm25Store.append(spark, path, docs.filter(col("doc_id") % 3 === 2))
    val grown = Bm25Store.segmentStat(spark, path)
    assert(grown.metaSegments == 3L &&
      grown.postingsFiles > fresh.postingsFiles &&
      grown.meanFilesPerBucket > fresh.meanFilesPerBucket,
      s"appends did not grow the stat: $fresh -> $grown")
    Bm25Store.compact(spark, path)
    val post = Bm25Store.segmentStat(spark, path)
    assert(post.metaSegments == 1L &&
      post.postingsFiles < grown.postingsFiles &&
      post.maxFilesPerBucket <= 2L,
      s"compact did not reset the stat: $grown -> $post")
  }

  test("x94b with a registered store serves the hybrid query with NO corpus scan, same answers as x94") {
    Bm25Store.invalidate()
    val x94 = graft.queries.CurationOps.x94_hybrid_rrf.build(spark, Sf)
    // no producer ran -> transient fallback, identical by construction
    val fallback = graft.queries.CurationOps.x94b_hybrid_rrf_store.build(spark, Sf)
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(sig(fallback) == sig(x94) && sig(x94).nonEmpty)
    try {
      Bm25Store.createFor(spark, Sf, docs)
      val served = graft.queries.CurationOps.x94b_hybrid_rrf_store.build(spark, Sf)
      assert(sig(served) == sig(x94), "store-served hybrid diverged from x94")
      // the steady-state claim: the index answers the lexical side — the
      // corpus file must be absent from the WHOLE hybrid plan's inputs
      // (embeddings stay: the vector side is the exact ranking by design)
      val inputs = served.inputFiles
      assert(inputs.exists(_.contains("graft_bm25_store")),
        s"store files not in inputs: ${inputs.take(5).mkString(", ")}")
      assert(!inputs.exists(_.contains("documents.parquet")),
        "x94b still scans the corpus with a registered store")
    } finally Bm25Store.invalidate()
  }

  test("meta records the modulus; a restore with different terms still matches") {
    val path = tmpStore()
    Bm25Store.create(spark, path, docs, nBuckets = 16)
    assert(Bm25Store.meta(spark, path).collect().head.getInt(0) == 16)
    val sub = Seq(7 -> "table scan")
    val fromIndex = Bm25Store.query(spark, path, sub, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val fromScan = Bm25.topK(docs, sub, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromIndex == fromScan && fromIndex.nonEmpty)
  }
}
