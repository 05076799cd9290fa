package graft.queries

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Physical-plan shape gates: the declarative queries must actually compile
  * to the plans the 100 TB posture assumes — filters pushed into the parquet
  * scan, columns pruned, small dimensions broadcast, top-k as
  * TakeOrderedAndProject, and the tile read pruning on the stored hash.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): (DataFrame, String) = {
    val df = graft.SparkEntry.queries(name)(spark, Sf)
    df.count() // materialize so AQE settles on the final plan
    (df, df.queryExecution.executedPlan.toString)
  }

  test("q01: the shipdate filter is pushed into the lineitem scan") {
    val (_, plan) = planOf("q01_agg")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      plan)
  }

  test("q02: only the selected part columns are read") {
    val (_, plan) = planOf("q02_filter")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("p_partkey") && read.contains("p_type") &&
      !read.contains("p_retailprice"),
      s"column pruning failed: $read")
  }

  test("q04: the region dimension joins via broadcast") {
    val (_, plan) = planOf("q04_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q05: the 6-table join contains no cartesian product") {
    val (_, plan) = planOf("q05_multijoin")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q06/q07: semi and anti joins stay semi/anti in the physical plan") {
    assert(planOf("q06_semijoin")._2.contains("LeftSemi"))
    assert(planOf("q07_antijoin")._2.contains("LeftAnti"))
  }

  test("q16: global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val (_, plan) = planOf("q16_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("x46: the tile read pushes hash-range predicates into the stored scan") {
    val (_, plan) = planOf("x46_tile")
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(hash") || plan.contains("Or(And(")),
      plan)
  }

  test("x91: the ST bbox predicate auto-lowers to pushed hash ranges") {
    val (_, plan) = planOf("x91_st_bbox")
    // the optimizer rule injected the Z-range cover and parquet scans it...
    assert(plan.contains("PushedFilters: [Or("), plan.take(3000))
    // ...while the exact centroid conjunct survives to discard the
    // cover's bounded over-scan (the caller never touched ZRange)
    assert(plan.contains("st_centroid_in_bbox"), plan.take(3000))
  }

  test("q31: exact dedup is a single hash aggregate, partial then final") {
    val (_, plan) = planOf("q31_dedup_exact")
    assert(plan.contains("HashAggregate"), plan)
    // one shuffle for the group-by (plus at most one for the canonical sort)
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles <= 3, s"$shuffles exchanges:\n$plan")
  }

  private def exchanges(plan: String): Int =
    "Exchange (range|hash|SinglePartition)".r.findAllIn(plan).length

  test("x61/x62/x63/x66/x67: per-row curation ops are scan + canon sort only") {
    // the ONLY exchange each plan may contain is the canonical ORDER BY's
    // range partitioning (a driver-compare artifact, not operator semantics)
    Seq("x61_normalize", "x62_redact", "x63_repetition", "x66_quantize",
      "x67_split").foreach { name =>
      val (_, plan) = planOf(name)
      assert(exchanges(plan) == 1, s"$name not shuffle-free:\n$plan")
    }
  }

  test("x68/x69: windowed curation ops shuffle once on the partition key") {
    val (_, p68) = planOf("x68_balance")
    assert(p68.contains("Window"), s"x68 lost its window:\n$p68")
    assert(exchanges(p68) <= 2, s"x68 over-shuffles:\n$p68")
    // x69 carries one extra exchange: the per-source shard-count agg
    // (O(#sources) rows, broadcast back onto the scan — not a corpus shuffle)
    val (_, p69) = planOf("x69_pack")
    assert(p69.contains("Window"), s"x69 lost its window:\n$p69")
    assert(p69.contains("BroadcastHashJoin"), s"x69 counts not broadcast:\n$p69")
    assert(exchanges(p69) <= 3, s"x69 over-shuffles:\n$p69")
  }

  test("x87: the budget cut windows on (grp, bucket), never on the group alone") {
    // gate the INNER two-phase plan (x87's returned frame is checkpoint-
    // backed, the x40 device): every windowspec must mention the 256-way
    // hash-prefix bucket — a lang-only corpus windowspec would mean the
    // one-reducer-per-language sort the operator exists to avoid (the grid
    // offsets window orders by bucket over groups x 256 rows; the corpus
    // window partitions by it)
    val cut = graft.operators.TokenBudget.budgetCutPlan(
      Tables.documents(spark, Sf), budget = 2000L)
    cut.count()
    val plan = cut.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"x87 lost its window:\n$plan")
    specs.foreach { s =>
      assert(s.contains("bucket"), s"window not bucket-partitioned: $s\n$plan")
    }
    // the per-bucket offsets join back via broadcast (grid-sized side)
    assert(plan.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$plan")
  }

  test("x92: term filter sits inside the map (pre-explode); first rank is bucketed") {
    val (_, plan) = planOf("x92_bm25")
    // the explode must generate from the map_filter'ed token map — the
    // exploded relation is candidate-sized (docs x matched query terms),
    // never corpus-token-sized
    assert(plan.contains("map_filter"),
      s"x92 explodes the full token map:\n$plan")
    // two-phase rank: the first row_number windows on (query_id, bucket) —
    // a query_id-only first window would funnel every candidate of a query
    // into one reducer
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.size >= 2, s"x92 lost its two windows:\n$plan")
    assert(specs.exists(_.contains("bucket")),
      s"no bucketed window spec in: ${specs.mkString("; ")}\n$plan")
    // df / query terms / corpus stats all join back as broadcasts
    assert(plan.contains("BroadcastHashJoin"), s"df side not broadcast:\n$plan")
  }

  test("NO registry query compiles to a CartesianProduct (global gate)") {
    // a cartesian over corpus-sized inputs is the canonical 100 TB killer;
    // today every deliberate cross (q11's tiny dims, q33's one-row query
    // vector) broadcasts into a BroadcastNestedLoopJoin instead, so the
    // allowlist is EMPTY — a future query that trips this must either fix
    // its join keys or argue its way onto the list explicitly
    val declared = Set.empty[String]
    val skip = Set("q36a_lookup", "q36b_delete", "q36c_update",
      "x46_tile", "x47_heatmap") // store-fixture queries, gated elsewhere
    val hits = graft.SparkEntry.queries.keys.toSeq
      .filterNot(skip).filterNot(declared).flatMap { name =>
        val df = graft.SparkEntry.queries(name)(spark, Sf)
        df.count()
        if (df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
          Some(name)
        else None
      }
    assert(hits.isEmpty, s"undeclared cartesian products in: ${hits.mkString(", ")}")
  }

  test("x125: the composed triage plan never shuffles ANY history store") {
    // the triage rides all THREE text-side stores in ONE plan; the
    // per-store no-history-exchange gates (HashHistory/GramHistory/
    // MinHashHistory specs) must survive the composition — an exchange
    // above any history scan here would mean the composed optimizer
    // output re-shuffles a corpus-scale relation per crawl batch
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // fixture stores are broadcast-tiny; a 100 TB store is not — force
    // the co-located join paths the gate exists to protect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.HashHistory.create(spark, Sf,
        graft.queries.TextOps.x86HistoryHashes(spark, Sf))
      graft.sources.GramHistory.create(spark, Sf,
        graft.queries.TextOps.x86Split(spark, Sf)._1,
        graft.queries.TextOps.DupGramK)
      graft.sources.MinHashHistory.create(spark, Sf,
        graft.queries.TextOps.x123HistoryBands(spark, Sf),
        graft.queries.TextOps.x123HistoryShingles(spark, Sf))
      val df = graft.SparkEntry.queries("x125_crawl_triage")(spark, Sf)
      df.count()
      val exec = df.queryExecution.executedPlan
      def isHistScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p match {
          case s: FileSourceScanExec =>
            s.tableIdentifier.exists(t =>
              t.table.startsWith("graft_hash_history") ||
                t.table.startsWith("graft_gram_history") ||
                t.table.startsWith("graft_minhash_history")) ||
              // the gram probe reads the store FILES as plain parquet
              // (Bucketing.probeScan) — match by location too
              s.relation.location.rootPaths.exists(p0 =>
                p0.toString.contains("graft_hash_history") ||
                  p0.toString.contains("graft_gram_history") ||
                  p0.toString.contains("graft_minhash_history"))
          case _ => false
        }
      // the property the per-store specs gate, surviving composition:
      // every history scan reaches its FIRST join without crossing an
      // exchange (downstream exchanges — the verdict joins, Canon's
      // final sort — legitimately sit above joined results). Walk each
      // exchange's child; a history scan reachable without passing a
      // join means the store relation itself was re-shuffled.
      import org.apache.spark.sql.execution.joins.{BaseJoinExec}
      def scanBeforeJoin(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p match {
          case _: BaseJoinExec => false
          case s if isHistScan(s) => true
          case other => other.children.exists(scanBeforeJoin)
        }
      val offenders = exec.collect {
        case e: ShuffleExchangeExec if scanBeforeJoin(e.child) => e
      }
      assert(offenders.isEmpty,
        s"history store shuffled before its probe join in the composed " +
          s"triage plan:\n${offenders.mkString("\n")}")
      assert(exec.collectFirst {
        case s: FileSourceScanExec if isHistScan(s) => s
      }.isDefined, "triage plan does not scan the stores at all")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      graft.sources.HashHistory.invalidate(spark, Sf)
      graft.sources.GramHistory.invalidate(spark, Sf)
      graft.sources.MinHashHistory.invalidate(spark, Sf)
    }
  }

  test("x42: blocked pair search — no cartesian, bounded shuffles, TakeOrdered merge") {
    // gate the PRODUCER plan: with no producer step run, the registry
    // builder returns the real blocked pair-search pipeline (scanOrCompute
    // is lazy) — invalidate first so a pair-store test running earlier
    // can't swap a parquet scan under this gate
    graft.operators.PairStore.invalidate(spark, "x42_embed_neardup", Sf)
    val (_, plan) = planOf("x42_embed_neardup")
    assert(!plan.contains("CartesianProduct"), plan)
    // one shuffle groups the chunk-pair tasks, the global top-k merge is a
    // TakeOrdered (never a full sort); AQE may add one coalesce read
    assert(exchanges(plan) <= 2, s"x42 over-shuffles:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("pair store: cold build is the lazy pipeline plan; warm consumers scan parquet") {
    import graft.operators.PairStore
    val name = "x42_embed_neardup"
    PairStore.invalidate(spark, name, Sf)
    try {
      // COLD: building the registry frame persists nothing and returns the
      // (unexecuted) pair-search plan — constructing frames for explain()/
      // empty-input tests must never run the most expensive pipeline
      val cold = graft.SparkEntry.queries(name)(spark, Sf)
      assert(cold.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
        "cold build did not return the pair-search plan")
      assert(PairStore.persistedPath(spark, name, Sf).isEmpty,
        "building a registry frame must not persist anything")
      // WARM: after the explicit producer step, the consumer entry point
      // plans a parquet scan of the store and never touches its compute
      // thunk (x89's resolution input — the composition the store exists for)
      PairStore.refresh(spark, name, Sf)(cold)
      val warm = PairStore.scanOrCompute(spark, name, Sf)(
        sys.error("consumer re-ran the pair pipeline despite a persisted store"))
      val plan = warm.queryExecution.executedPlan.toString
      assert(plan.contains("FileScan parquet") &&
        !plan.contains("TakeOrderedAndProject"),
        s"warm consumer did not plan a store scan:\n$plan")
      // and the scanned rows are the producer's rows
      assert(warm.count() == 20L, "store scan row count != producer top-20")
    } finally PairStore.invalidate(spark, name, Sf)
  }

  test("x40 candidate generation: one corpus shuffle, no join, map-side bucket cap") {
    // gate the INNER pipeline (x40's returned frame is checkpoint-backed):
    // banding + capped-members aggregation + in-aggregation pair
    // generation. The (band, bucket) aggregation exchange must be the only
    // wide op over the corpus (distinct shuffles only the candidate
    // PAIRS), the cap must truncate map-side — the CappedMembersAgg
    // aggregate runs a PARTIAL pass before the exchange, bounding what a
    // hot bucket ships per input partition — and there must be no
    // self-join recomputing the signature pipeline twice, and no window
    // pass (the old rank-based cap sorted every bucket's rows first).
    val docs = Tables.documents(spark, Sf)
    val arrs = graft.queries.TextOps.shingleArrays(docs).select("doc_id", "shs")
    val sigs = graft.operators.Dedup.minHashSignaturesFromArrays(arrs)
    val cands = graft.operators.Dedup.lshCandidates(sigs)
    cands.count()
    val plan = cands.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"pair generation must not join:\n$plan")
    assert(exchanges(plan) <= 2, s"lshCandidates over-shuffles:\n$plan")
    assert(!plan.contains("Window"), s"cap must not need a window pass:\n$plan")
    // partial + final object-hash aggregate nodes around the exchange: the
    // partial (map-side) pass is what bounds a hot bucket's shuffle volume
    val objAggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(objAggs >= 2,
      s"expected partial+final capped-members aggregates, found $objAggs:\n$plan")
  }

  test("x40 verify fetch: the candidate semi-join sits below the shingle projection") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    // the verify join's input must be candidates-sized: the semi-join on
    // doc_id has to reach the scan BELOW the expensive shingle kernel, so
    // arrays are computed only for docs appearing in a candidate pair —
    // never materializing (or caching) the corpus-scale array relation.
    // This is the exact fetch shape x40 passes as `verifyFetch` (Catalyst
    // does not sink a LeftSemi through a Project, so it must be structural).
    val docs = Tables.documents(spark, Sf)
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    // the PRODUCTION fetch closure (what the x40 QueryDef passes as
    // verifyFetch) — gating a reconstruction would let the real wiring drift
    val fetch = graft.queries.TextOps.x40VerifyFetch(docs)(ids)
    val optimized = fetch.queryExecution.optimizedPlan
    val semis = optimized.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, s"no semi join in the verify fetch:\n$optimized")
    // the shingle kernel is a ScalaUDF — it must appear only ABOVE the semi
    // join (the join subtree holds just the scan and the id set)
    semis.foreach { j =>
      assert(!j.toString.contains("UDF("),
        s"shingle kernel still below the semi join (fetch is corpus-sized):\n$j")
    }
    assert(optimized.toString.contains("UDF("),
      s"shingle kernel vanished entirely:\n$optimized")
  }

  test("x71: the tf⋈df join is salted — no raw token-keyed exchange") {
    val (_, plan) = planOf("x71_tfidf")
    // the join keys must carry the _salt sub-key (hot tokens spread over
    // `buckets` reducers) and the tiny df side must be exploded per salt
    assert(plan.contains("_salt"), s"tf⋈df join not salted:\n$plan")
    assert(plan.contains("xxhash64"), s"salt not deterministic:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("x82: boilerplate mark join broadcasts; aggregations partial+final") {
    val (_, plan) = planOf("x82_shared_spans")
    assert(plan.contains("BroadcastHashJoin"),
      s"shared-vocabulary mark join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("rank-limited queries carry the map-side WindowGroupLimit") {
    // every `row_number() <= k` query must keep Spark's group-limit node:
    // the partial (map-side) pass bounds each partition's contribution to k
    // rows per group BEFORE the window exchange, so a hot group (one lang
    // can be half a real corpus) never funnels its full membership through
    // one reducer's sort. A query-shape edit that breaks the
    // InferWindowGroupLimit pattern (e.g. filtering on a derived column or
    // mixing specs) would silently reintroduce the full partition sort —
    // this gate makes that loud.
    Seq("q14_rank", "x68_balance", "x71_tfidf").foreach { name =>
      val (_, plan) = planOf(name)
      assert(plan.contains("WindowGroupLimit"),
        s"$name lost its WindowGroupLimit (full per-group sort at scale):\n$plan")
    }
  }

  test("x70: decontamination joins without a cartesian product") {
    val (_, plan) = planOf("x70_decontaminate")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("x70: the corpus side is bloom-pruned BELOW the join (before its exchange)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val df = graft.SparkEntry.queries("x70_decontaminate")(spark, Sf)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    // the bloom probe must sit in a Filter CONDITION inside a join input —
    // i.e. it runs map-side, before the join's shuffle (the trigram kernel
    // UDF lives in a Generate, so a Filter-condition UDF is the bloom alone)
    val pruned = joins.exists(_.children.exists(_.collectFirst {
      case f: Filter if f.condition.exists(_.isInstanceOf[ScalaUDF]) => f
    }.isDefined))
    assert(pruned, s"no bloom filter below a join:\n${df.queryExecution.optimizedPlan}")
  }

  test("x95: the vocabulary joins back via broadcast (score side stays map-only)") {
    val (_, plan) = planOf("x95_unigram_lm")
    // vocab + scalars both broadcast; the only shuffles are the two
    // map-combined aggregations (vocab build, per-doc sum)
    assert(plan.contains("BroadcastHashJoin"), s"vocab not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"x95 shuffles a join side:\n$plan")
    val partials = "HashAggregate\\(keys".r.findAllIn(plan).size
    assert(partials >= 4, s"x95 aggregations not partial+final:\n$plan")
  }

  test("x97: bigram + both unigram sides broadcast (score side stays map-only)") {
    val (_, plan) = planOf("x97_bigram_lm")
    assert(plan.contains("BroadcastHashJoin"), s"model sides not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"x97 shuffles a join side:\n$plan")
  }

  test("x99: one gram-keyed exchange; the dup-gram set broadcasts back") {
    // collect() the frame itself (not a count() wrapper) so AQE finalizes
    // THIS plan — a count() probe would let Catalyst prune the dup join
    // entirely and gate a plan the query never runs
    val df = graft.SparkEntry.queries("x99_dupgrams")(spark, Sf)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    // AQE prints Final + Initial sections; gate the FINAL plan only
    val plan = full.split("== Initial Plan ==").head
    // the corpus-duplicated gram set joins back as a broadcast, so grams
    // cross exactly ONE exchange (the map-combined aggregate) — a second
    // gram-keyed exchange means the join stopped broadcasting
    assert(plan.contains("BroadcastHashJoin"), s"dup set not broadcast:\n$plan")
    val gramExchanges = "Exchange hashpartitioning\\(gram".r.findAllIn(plan).size
    assert(gramExchanges <= 1, s"x99 shuffles grams $gramExchanges times:\n$plan")
  }

  test("x114: removal keeps x99's gram bill — one gram exchange, dup set broadcasts") {
    // same device as the x99 gate: collect the frame itself so AQE
    // finalizes the plan the query actually runs
    val df = graft.SparkEntry.queries("x114_remove_dup_spans")(spark, Sf)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"dup set not broadcast:\n$plan")
    val gramExchanges = "Exchange hashpartitioning\\(gram".r.findAllIn(plan).size
    assert(gramExchanges <= 1, s"x114 shuffles grams $gramExchanges times:\n$plan")
    // hit positions reduce per doc BEFORE rejoining the corpus: the rows
    // crossing the doc-keyed exchange are the dup-density-sized hits
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).nonEmpty,
      s"expected a doc-keyed exchange for hit positions:\n$plan")
  }

  test("x100: the components relation broadcasts into the corpus scan") {
    val (_, plan) = planOf("x100_best_keeper")
    // dup clusters are candidates-sized: the corpus side must never
    // shuffle for this join
    assert(plan.contains("BroadcastHashJoin"), s"components not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"x100 shuffles the corpus side:\n$plan")
  }

  test("x96: the sketch candidates broadcast as a semi-join below the recount") {
    val (_, plan) = planOf("x96_heavy_hitters")
    // candidate filter is a broadcast LeftSemi — the exact recount's
    // exchange then carries candidate tokens only, never the vocabulary
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"candidates not broadcast-semi-joined:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"x96 shuffles a join side:\n$plan")
  }
}
