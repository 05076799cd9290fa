package graft.queries

import graft.SparkSpec
import graft.operators.Kernels

class CurationOpsSpec extends SparkSpec {

  test("x61: NFC composes, whitespace collapses, hash is over normalized text") {
    val rows = CurationOps.x61_normalize.build(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nRaw = r.getAs[Int]("n_raw")
      val nNorm = r.getAs[Int]("n_norm")
      // leading "  \t" collapses, NBSP collapses into the joining space,
      // e+combining-acute composes to one code point: strictly shorter
      assert(nNorm < nRaw, s"norm $nNorm !< raw $nRaw")
    }
  }

  test("x62: every doc has exactly one synthetic email/ip/phone redacted") {
    val rows = CurationOps.x62_redact.build(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_email") == 1)
      assert(r.getAs[Int]("n_ip") == 1)
      assert(r.getAs[Int]("n_phone") == 1)
    }
  }

  test("x63 kernel: repeated trigrams measured, short docs excluded") {
    assert(Kernels.triStats("a b").isEmpty)
    assert(Kernels.triStats("a b c").sameElements(Array(1L, 1L)))
    // "a b c a b c a b c": 7 trigrams, 3 distinct
    assert(Kernels.triStats("a b c a b c a b c").sameElements(Array(7L, 3L)))
    val rows = CurationOps.x63_repetition.build(spark, Sf).collect()
    rows.foreach { r =>
      val ratio = r.getAs[Double]("rep_ratio")
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(r.getAs[Long]("n_uniq") <= r.getAs[Long]("n_tri"))
    }
  }

  test("x64: both injected URLs extracted; domains carry source/lang") {
    val rows = CurationOps.x64_urls.build(spark, Sf).collect()
    val domains = rows.map(_.getAs[String]("domain")).toSet
    assert(domains.exists(_.endsWith(".example.com")))
    assert(domains.exists(_.startsWith("mirror-")))
    val urlTotal = rows.map(_.getAs[Long]("n_urls")).sum
    val docCount = Tables.documents(spark, Sf).count()
    assert(urlTotal == 2 * docCount, s"expected 2 URLs/doc, got $urlTotal for $docCount docs")
  }

  test("x65: one centroid row per (label, dim); components bounded by data") {
    val rows = CurationOps.x65_label_centroids.build(spark, Sf).collect()
    val labels = Tables.embeddings(spark, Sf).select("label").distinct().count()
    assert(rows.length == labels * 64)
    assert(rows.forall(r => math.abs(r.getAs[Double]("centroid")) < 10.0))
  }

  test("x66 kernel: int8 range, max component hits ±127, zeros stay zero") {
    assert(Kernels.quantizeInt8(Array(0f, 0f)).sameElements(Array(0, 0)))
    val q = Kernels.quantizeInt8(Array(1.0f, -0.5f, 0.25f))
    assert(q(0) == 127 && q(1) == -63 && q(2) == 32) // floor(x+0.5) rounding
    val rows = CurationOps.x66_quantize.build(spark, Sf)
      .agg(org.apache.spark.sql.functions.min("q"),
        org.apache.spark.sql.functions.max("q")).collect()(0)
    assert(rows.getInt(0) >= -127 && rows.getInt(1) <= 127)
  }

  test("x67: split is a partition of the corpus and stable across runs") {
    val rows = CurationOps.x67_split.build(spark, Sf).collect()
    val docs = Tables.documents(spark, Sf).count()
    assert(rows.length == docs)
    val bySplit = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test")) // ~80/10/10
    val again = CurationOps.x67_split.build(spark, Sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("x68: every language capped at K, selection is hash-ordered") {
    val rows = CurationOps.x68_balance.build(spark, Sf).collect()
    val perLang = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.size)
    assert(perLang.values.forall(_ <= 50))
    assert(rows.forall(r => r.getAs[Int]("rn") >= 1 && r.getAs[Int]("rn") <= 50))
  }

  test("x69: offsets stay inside the bin; bins fill sequentially per (source, shard)") {
    val rows = CurationOps.x69_pack.build(spark, Sf).collect()
    val perSourceDocs = rows.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.length).toMap
    rows.foreach { r =>
      val off = r.getAs[Long]("off")
      assert(off >= 0 && off < 2048)
      val sh = r.getAs[Long]("shard")
      val bound = math.ceil(
        perSourceDocs(r.getAs[String]("source")).toDouble /
          CurationOps.PackShardDocs).toLong
      assert(sh >= 0 && sh < bound, s"shard $sh outside [0, $bound)")
    }
    // within one (source, shard) pack stream, cumulative reconstruction:
    // bin*2048 + off is the running token count before the doc — strictly
    // non-decreasing by doc_id
    rows.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("shard")))
      .foreach { case (_, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
        val starts = sorted.map(r => r.getAs[Long]("bin") * 2048 + r.getAs[Long]("off"))
        assert(starts.zip(starts.drop(1)).forall { case (a, b) => a <= b })
      }
    // the de-skew is real: docs of one source spread over >1 shard
    val shardsPerSource = rows.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("shard")).distinct.size)
    assert(shardsPerSource.values.forall(_ > 1),
      s"sources not sharded: ${shardsPerSource.toMap}")
  }

  test("x69: shard count derives from per-source doc counts on a skewed mix") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // hot source with 200 docs, cold source with 10: the hot one must fan
    // out to ceil(200/16) = 13 shards while the cold one stays at 1
    val docs = ((1L to 200L).map(i => ("hot", i)) ++
      (201L to 210L).map(i => ("cold", i))).toDF("source", "doc_id")
    val sharded = CurationOps.packShards(docs, CurationOps.PackShardDocs)
    val perSource = sharded.groupBy("source")
      .agg(countDistinct(col("shard")).as("n"), max(col("shard")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perSource("cold")._1 == 1 && perSource("cold")._2 == 0L)
    val (hotShards, hotMax) = perSource("hot")
    assert(hotMax <= 12L, s"hot shard ids must stay below ceil(200/16)=13, max=$hotMax")
    assert(hotShards >= 10, s"hot source only spread over $hotShards shards")
  }

  test("x80: per-source keep rates track their basis points; decision is deterministic") {
    val rows = CurationOps.x80_source_mix.build(spark, Sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("keep_bps"), r.getAs[Long]("n_kept")))
    assert(rows.nonEmpty)
    val totals = Tables.documents(spark, Sf)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    rows.foreach { case (src, bps, kept) =>
      assert(Set(2000, 4500, 7000).contains(bps), s"$src bps=$bps")
      val frac = kept.toDouble / totals(src)
      // hash threshold is uniform: observed rate within a generous CLT band
      val target = bps / 10000.0
      assert(math.abs(frac - target) < 0.35,
        s"$src kept $frac, target $target")
    }
    // deterministic: a second build yields the identical result
    val again = CurationOps.x80_source_mix.build(spark, Sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("keep_bps"), r.getAs[Long]("n_kept")))
    assert(rows.toSeq == again.toSeq)
  }

  test("x70: benchmark docs excluded; self-contaminated corpus docs flagged") {
    val rows = CurationOps.x70_decontaminate.build(spark, Sf).collect()
    val benchIds = Tables.documents(spark, Sf)
      .filter(org.apache.spark.sql.functions.col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !benchIds.contains(r.getAs[Long]("doc_id"))))
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      val flag = r.getAs[Int]("contaminated")
      assert(flag == (if (n >= 5) 1 else 0))
    }
  }

  test("x71: a token present in EVERY doc spreads over >1 salted sub-key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the hot-key shape: "information" appears in all 200 docs, so an
    // unsalted tf⋈df shuffle would funnel all 200 tf rows of that token into
    // the single reducer owning the key
    val docs = (1L to 200L)
      .map(i => (i, s"information shared everywhere unique$i token$i"))
      .toDF("doc_id", "text")
    val tokCounts = udf((t: String) => Kernels.tokenCounts(t, 4))
    val tf = docs.select(col("doc_id"),
      explode(tokCounts(lower(col("text")))).as(Seq("tok", "tf")))
    val salts = tf.withColumn("_salt",
        graft.operators.SkewJoin.saltColumn(tf, 8))
      .filter(col("tok") === "information")
      .select("_salt").distinct().count()
    assert(salts > 1, s"hot token carried by only $salts sub-key(s)")
    // and the salted join is still exactly the inner equi-join
    val dfRel = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .withColumnRenamed("tok", "_tok_df")
    val salted = graft.operators.SkewJoin
      .saltedJoin(tf, dfRel, "tok", "_tok_df")
      .select("doc_id", "tok", "tf", "df")
    val plain = tf.join(dfRel, col("tok") === col("_tok_df"))
      .select("doc_id", "tok", "tf", "df")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("x71: five top terms per doc, ranked by rounded score then token") {
    val rows = CurationOps.x71_tfidf.build(spark, Sf).collect()
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.values.forall(_.length <= 5))
    perDoc.values.foreach { rs =>
      val ordered = rs.sortBy(_.getAs[Int]("rn"))
      val scores = ordered.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b },
        s"rank order broken: ${ordered.mkString(", ")}")
    }
  }

  test("x92: bucketed two-phase top-k is bit-identical to the naive rank") {
    import graft.operators.Bm25
    val scored = Bm25.scores(
      Tables.documents(spark, Sf), CurationOps.Bm25QuerySet)
    val twoPhase = Bm25.rankTopK(scored, CurationOps.Bm25TopK, buckets = 32)
    val naive = Bm25.rankNaive(scored, CurationOps.Bm25TopK)
    assert(twoPhase.exceptAll(naive).isEmpty &&
      naive.exceptAll(twoPhase).isEmpty,
      "two-phase rank diverged from the single-window reference")
  }

  test("x92: dense per-query ranks, descending scores, matched terms only") {
    val rows = CurationOps.x92_bm25.build(spark, Sf).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Int]("query_id"))
    assert(byQuery.keySet == CurationOps.Bm25QuerySet.map(_._1).toSet)
    byQuery.values.foreach { rs =>
      val ordered = rs.sortBy(_.getAs[Int]("rn"))
      assert(ordered.map(_.getAs[Int]("rn")).toSeq ==
        (1 to ordered.length).toSeq, "ranks not dense from 1")
      assert(ordered.length <= CurationOps.Bm25TopK)
      val scores = ordered.map(_.getAs[Long]("score_scaled"))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b },
        s"scores not descending: ${scores.mkString(",")}")
      assert(scores.forall(_ > 0L))
    }
    // every retrieved doc really contains >= 1 term of its query
    val text = Tables.documents(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+").toSet).toMap
    val terms = CurationOps.Bm25QuerySet.toMap
    rows.foreach { r =>
      val q = terms(r.getAs[Int]("query_id")).split(" ").toSet
      val toks = text(r.getAs[Long]("doc_id"))
      assert(q.intersect(toks).nonEmpty, s"doc without any query term: $r")
    }
  }

  test("x94: rrf is exactly the integer fusion of the source ranks; per-query top-10") {
    val rows = CurationOps.x94_hybrid_rrf.build(spark, Sf).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Int]("query_id"))
    assert(byQuery.keySet == CurationOps.Bm25QuerySet.map(_._1).toSet)
    byQuery.values.foreach { rs =>
      assert(rs.length <= CurationOps.Bm25TopK)
      val ordered = rs.sortBy(_.getAs[Int]("rn"))
      assert(ordered.map(_.getAs[Int]("rn")).toSeq ==
        (1 to ordered.length).toSeq)
      val scores = ordered.map(_.getAs[Long]("rrf"))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    }
    def contrib(rn: Any): Long = rn match {
      case null => 0L
      case i: Int => CurationOps.RrfScale / (CurationOps.RrfK + i)
      case other => fail(s"unexpected rank type: $other")
    }
    rows.foreach { r =>
      val want = contrib(r.getAs[Any]("brn")) + contrib(r.getAs[Any]("vrn"))
      assert(r.getAs[Long]("rrf") == want, s"rrf drifted from its ranks: $r")
      assert(r.getAs[Any]("brn") != null || r.getAs[Any]("vrn") != null)
    }
    // query i's vector IS doc i's embedding: the dense side must rank doc i
    // first, so doc i carries vrn = 1 in its query's fused list
    CurationOps.Bm25QuerySet.map(_._1).foreach { qid =>
      val self = rows.find(r =>
        r.getAs[Int]("query_id") == qid && r.getAs[Long]("doc_id") == qid.toLong)
      assert(self.exists(_.getAs[Any]("vrn") == 1),
        s"query $qid: own-vector doc not vrn=1 — ${self.mkString}")
    }
  }

  test("x73: every vector assigned to exactly one centroid; self-consistent") {
    val rows = CurationOps.x73_cluster_assign.build(spark, Sf).collect()
    val vecs = Tables.embeddings(spark, Sf).count()
    assert(rows.length == vecs)
    assert(rows.forall(_.getAs[Long]("dist_scaled") >= 0))
    // kernel tie-break: equidistant centroids pick the lowest label
    val a = graft.operators.Kernels.assignNearest(
      Array(0f, 0f), Array(3, 7),
      Array(Array(1.0, 0.0), Array(-1.0, 0.0)))
    assert(a(0) == 3L && a(1) == math.round(1e9))
  }

  test("x74: pipeline summary conserves the deduped, gated doc count") {
    import org.apache.spark.sql.functions._
    val rows = CurationOps.x74_pipeline.build(spark, Sf).collect()
    val docs = Tables.documents(spark, Sf)
      .filter(size(split(col("text"), " ")) >= 20)
      .groupBy(md5(col("text"))).agg(min(col("doc_id")))
      .count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
  }

  test("x101: v2 summary is conserved and consistent with x90's gates + the nll filter") {
    import org.apache.spark.sql.functions._
    val rows = CurationOps.x101_curation_v2.build(spark, Sf).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    // every doc accounted once per lang
    val perLang = Tables.documents(spark, Sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == perLang.keySet)
    rows.foreach { case (l, r) => assert(r.getAs[Long]("n_docs") == perLang(l)) }
    // gate counts match the x90 audit (length/repetition gates unchanged)
    val audit = CurationOps.x90_curation_audit.build(spark, Sf).collect()
    val auditShort = audit.count(_.getAs[Boolean]("too_short"))
    assert(rows.values.map(_.getAs[Long]("n_too_short")).sum == auditShort)
    // the nll filter fires somewhere, and keepers never exceed survivors
    assert(rows.values.map(_.getAs[Long]("n_low_quality")).sum > 0)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_kept_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_kept_docs") == 0 ||
        r.getAs[Long]("kept_tokens") > 0)
    }
  }

  test("x83: chunks tile every doc with exact overlap; short docs yield one chunk") {
    import spark.implicits._
    // token counts straddling the interesting boundaries: <window, =window,
    // window+1 (forces a 2nd chunk), an exact multiple of stride, and a
    // long doc
    val docs = Seq(5, 63, 64, 65, 112, 160, 300).zipWithIndex.map {
      case (n, i) => ((i + 1).toLong, (1 to n).map(t => s"t$t").mkString(" "))
    }.toDF("doc_id", "text")
    val w = 64; val s = 48
    val got = CurationOps.chunkWithOverlap(docs, w, s).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Int]("chunk_id"))
          .map(r => (r.getAs[Int]("chunk_id"), r.getAs[Int]("start_tok"),
            r.getAs[Int]("n_tokens"), r.getAs[String]("chunk_text")))
      }
    val nToks = Map(1L -> 5, 2L -> 63, 3L -> 64, 4L -> 65, 5L -> 112,
      6L -> 160, 7L -> 300)
    got.foreach { case (id, chunks) =>
      val n = nToks(id)
      val expectStarts =
        if (n <= w) Seq(0)
        else (0 to math.ceil((n - w).toDouble / s).toInt).map(_ * s)
      assert(chunks.map(_._2).toSeq == expectStarts,
        s"doc $id ($n toks): starts ${chunks.map(_._2).toSeq} != $expectStarts")
      // full coverage: the last chunk reaches the final token, and every
      // token index is inside some [start, start + n_tokens) window
      val last = chunks.last
      assert(last._2 + last._3 == n, s"doc $id tail not covered: $last")
      val covered = chunks.flatMap(c => c._2 until (c._2 + c._3)).toSet
      assert(covered == (0 until n).toSet, s"doc $id has coverage holes")
      // chunk text is exactly the sliced tokens
      chunks.foreach { case (_, start, len, text) =>
        val want = ((start + 1) to math.min(start + w, n)).map(t => s"t$t")
        assert(text == want.mkString(" ") && len == want.size,
          s"doc $id chunk at $start wrong text/len")
      }
      // overlap between consecutive chunks is exactly window - stride
      chunks.toSeq.sliding(2).foreach { pair =>
        if (pair.size == 2) {
          val (a, b) = (pair(0), pair(1))
          val overlap = (a._2 + a._3) - b._2
          assert(overlap == w - s || a._2 + a._3 == n,
            s"doc $id overlap $overlap != ${w - s}")
        }
      }
    }
    assert(got(1L).length == 1 && got(3L).length == 1, "<=window must be ONE chunk")
    assert(got(4L).length == 2, "window+1 tokens must split into two chunks")
  }

  test("q34 per-doc token-count kernel matches the explode plan") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf)
    val explodePlan = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) >= 4)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val kernelPlan = {
      val tokCounts = udf((t: String) => Kernels.tokenCounts(t, 4))
      docs.select(explode(tokCounts(lower(col("text")))).as(Seq("tok", "c")))
        .groupBy(col("tok")).agg(sum(col("c")).as("n"))
    }
    assert(explodePlan.except(kernelPlan).isEmpty && kernelPlan.except(explodePlan).isEmpty)
  }
}
