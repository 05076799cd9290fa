package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property battery for the per-bucket bloom sidecar — the probe
  * exactness story rests on ONE invariant: after any build/fold
  * sequence, every key present in the store is bloom-HIT (no false
  * negatives — a miss is definitively absent). The deterministic
  * pseudo-random key sets below exercise it across both tiers
  * (broadcast cut and task-local cut), plus the manifest round-trip,
  * generation monotonicity and the torn-sidecar degradations.
  */
class KeyBloomSpec extends SparkSpec {

  import spark.implicits._

  private val Buckets = 4

  // seed-DISJOINT key sets: hashing (seed, id) as two inputs keeps
  // different seeds' ranges from colliding (xxhash64(id + seed) would
  // make seed 52's ids a subset of seed 51's — "foreign" keys that are
  // genuinely present)
  private def keysDf(seed: Long, n: Int) =
    spark.range(n.toLong)
      .select(xxhash64(lit(seed), col("id")).as("k"))

  private def tmpBase(): String =
    java.nio.file.Files.createTempDirectory("graft-kb").toString + "/store"

  test("no false negatives across build + folds, through BOTH cut tiers") {
    val base = tmpBase()
    val built = keysDf(1L, 500)
    KeyBloom.build(spark, base, built, "k", Buckets)
    KeyBloom.fold(spark, base, keysDf(2L, 300), "k")
    KeyBloom.fold(spark, base, keysDf(3L, 1), "k")
    val all = built.union(keysDf(2L, 300)).union(keysDf(3L, 1))
    val meta = KeyBloom.readMeta(spark, base).get
    assert(meta.buckets == Buckets && meta.inserted == 801L)
    // broadcast tier: every inserted key must pass the expression cut
    val (arr, _) = KeyBloom.readAll(spark, base).get
    // compute each key's bucket exactly as the cut does (pmod(murmur3))
    // in ONE pass, then check the per-bucket blooms driver-side
    val withBid = all
      .select(KeyBloom.bucketIdCol("k", Buckets).as("b"), col("k"))
      .as[(Int, Long)].collect()
    val missesB = withBid.count { case (b, k) => !arr(b).mightContainLong(k) }
    assert(missesB == 0, s"$missesB inserted keys bloom-MISS (broadcast tier)")
    // task-local tier: the cut must return every inserted key
    val cut = KeyBloom.taskLocalCut(spark, base, all, "k", Buckets)
      .as[Long].collect().toSet
    val want = all.as[Long].collect().toSet
    assert((want -- cut).isEmpty,
      s"task-local cut lost ${(want -- cut).size} inserted keys")
    KeyBloom.delete(spark, base)
  }

  test("generation is strictly monotonic across build/fold/rebuild") {
    val base = tmpBase()
    KeyBloom.build(spark, base, keysDf(10L, 100), "k", Buckets)
    val g1 = KeyBloom.readMeta(spark, base).get.gen
    KeyBloom.fold(spark, base, keysDf(11L, 50), "k")
    val g2 = KeyBloom.readMeta(spark, base).get.gen
    KeyBloom.build(spark, base, keysDf(12L, 100), "k", Buckets)
    val g3 = KeyBloom.readMeta(spark, base).get.gen
    assert(g1 < g2 && g2 < g3, s"generations not monotonic: $g1 $g2 $g3")
    KeyBloom.delete(spark, base)
  }

  test("torn sidecar degradations: missing bucket file fails fold loudly, " +
      "reads to None, keeps task-local keys uncut") {
    val base = tmpBase()
    KeyBloom.build(spark, base, keysDf(20L, 200), "k", Buckets)
    val fs = KeyBloom.bucketPath(base, 1)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(KeyBloom.bucketPath(base, 1), false)
    // fold over the torn sidecar must throw (a silent fold could leave
    // bucket-1 keys bloom-invisible = false negatives)
    val boom = intercept[org.apache.spark.SparkException] {
      KeyBloom.fold(spark, base, keysDf(21L, 200), "k")
    }
    assert(boom.getMessage.contains("torn") ||
      Option(boom.getCause).exists(_.getMessage.contains("torn")) ||
      boom.toString.contains("KeyBloom.fold"),
      s"fold over a torn sidecar failed for the wrong reason: $boom")
    // driver-side readAll refuses the torn sidecar entirely
    assert(KeyBloom.readAll(spark, base).isEmpty,
      "readAll served a sidecar with a missing bucket")
    // the task-local cut keeps the torn bucket's keys UNCUT (supersets
    // are safe; losing keys is not)
    val probe = keysDf(99L, 400)
    val cut = KeyBloom.taskLocalCut(spark, base, probe, "k", Buckets)
      .as[Long].collect().toSet
    val tornBucketKeys = probe
      .filter(KeyBloom.bucketIdCol("k", Buckets) === 1)
      .as[Long].collect().toSet
    assert(tornBucketKeys.subsetOf(cut),
      "task-local cut dropped keys of a torn bucket")
    KeyBloom.delete(spark, base)
  }

  test("binary keys: build + fold + both cut tiers keep every key") {
    val base = tmpBase()
    def binKeys(seed: Long, n: Int) =
      spark.range(n.toLong)
        .select(unhex(md5((col("id") + lit(seed)).cast("string"))).as("k"))
    KeyBloom.build(spark, base, binKeys(30L, 300), "k", Buckets)
    KeyBloom.fold(spark, base, binKeys(31L, 100), "k")
    val all = binKeys(30L, 300).union(binKeys(31L, 100))
    val (arr, _) = KeyBloom.readAll(spark, base).get
    val rows = all.select(KeyBloom.bucketIdCol("k", Buckets).as("b"),
      col("k")).collect()
    val misses = rows.count(r =>
      !arr(r.getInt(0)).mightContainBinary(r.getAs[Array[Byte]](1)))
    assert(misses == 0, s"$misses binary keys bloom-MISS")
    val cut = KeyBloom.taskLocalCut(spark, base, all, "k", Buckets)
      .select(hex(col("k"))).as[String].collect().toSet
    val want = all.select(hex(col("k"))).as[String].collect().toSet
    assert((want -- cut).isEmpty,
      s"binary task-local cut lost ${(want -- cut).size} keys")
    KeyBloom.delete(spark, base)
  }

  test("saturation: folding far past capacity keeps exactness (no false " +
      "negatives), only selectivity decays; a rebuild restores it") {
    val base = tmpBase()
    // capacity floor is 1024/bucket; fold 40× that total
    KeyBloom.build(spark, base, keysDf(50L, 100), "k", Buckets)
    val expected = KeyBloom.readMeta(spark, base).get.expected
    KeyBloom.fold(spark, base, keysDf(51L, 40 * 1024 * Buckets), "k")
    val meta = KeyBloom.readMeta(spark, base).get
    assert(meta.expected == expected && meta.inserted > 40L * 1024 * Buckets,
      s"saturation bookkeeping off: $meta")
    // exactness through saturation: EVERY inserted key still bloom-hits
    val all = keysDf(50L, 100).union(keysDf(51L, 40 * 1024 * Buckets))
    val lost = all.except(
      KeyBloom.taskLocalCut(spark, base, all, "k", Buckets)).count()
    assert(lost == 0L, s"saturated sidecar LOST $lost keys")
    // selectivity: a saturated bloom passes most foreign keys (the
    // degradation direction is toward the plain scan)...
    val foreign = keysDf(52L, 2000)
    val satHits = KeyBloom.taskLocalCut(spark, base, foreign, "k", Buckets)
      .count()
    assert(satHits > 1000L,
      s"fixture not saturated enough to demonstrate decay: $satHits/2000")
    // ...and the compact-time rebuild (same keys, re-sized capacity)
    // restores it
    KeyBloom.build(spark, base, all, "k", Buckets)
    val freshHits = KeyBloom.taskLocalCut(spark, base, foreign, "k", Buckets)
      .count()
    assert(freshHits < satHits / 2,
      s"re-sized rebuild did not restore selectivity: $freshHits vs $satHits")
    assert(KeyBloom.taskLocalCut(spark, base, all, "k", Buckets).count() ==
      all.count(), "rebuild lost inserted keys")
    KeyBloom.delete(spark, base)
  }

  test("saturation statistic: manifest-only, conservative, collapses past " +
      "capacity, reset by the compact-shaped rebuild") {
    // pure model gates (no I/O): empty sidecar → unbounded ceiling;
    // design capacity → effFpp ≈ the created fpp (the bloom contract);
    // far past capacity → effFpp ≈ 1, ceiling collapses to ~1 key;
    // effFpp monotone in inserted
    val empty = KeyBloom.saturation(KeyBloom.Meta(1L, 4, 1024L, 0.02, 0L))
    assert(empty.effFpp == 0.0 && empty.zeroReadCeiling == Long.MaxValue,
      s"empty-sidecar stat off: $empty")
    val atCap = KeyBloom.saturation(
      KeyBloom.Meta(1L, 1, 1000000L, 0.02, 1000000L))
    assert(atCap.fill == 1.0 && atCap.effFpp > 0.01 && atCap.effFpp < 0.04,
      s"design-capacity effFpp should sit near the created fpp: $atCap")
    val over = KeyBloom.saturation(
      KeyBloom.Meta(1L, 1, 1000000L, 0.02, 40000000L))
    assert(over.effFpp > 0.9 && over.zeroReadCeiling <= 2L,
      s"40x-capacity stat should read saturated: $over")
    val ladder = Seq(1L, 10L, 100L, 1000L).map(f => KeyBloom.saturation(
      KeyBloom.Meta(1L, 1, 100000L, 0.02, f * 10000L)).effFpp)
    assert(ladder == ladder.sorted && ladder.distinct.size == ladder.size,
      s"effFpp not strictly monotone in inserted: $ladder")

    // I/O form rides the manifest through the store lifecycle
    val base = tmpBase()
    KeyBloom.build(spark, base, keysDf(60L, 100), "k", Buckets)
    val fresh = KeyBloom.saturationStat(spark, base).get
    assert(fresh.fill > 0.0 && fresh.fill < 0.5 &&
      fresh.effFpp < KeyBloom.DefaultFpp,
      s"fresh-build stat out of band: $fresh")
    KeyBloom.fold(spark, base, keysDf(61L, 40 * 1024 * Buckets), "k")
    val sat = KeyBloom.saturationStat(spark, base).get
    assert(sat.fill > 10.0 && sat.effFpp > 0.5 && sat.zeroReadCeiling < 10L,
      s"saturated stat should be loud: $sat")
    // compact() rebuilds from the surviving keys at re-sized capacity
    KeyBloom.build(spark, base,
      keysDf(60L, 100).union(keysDf(61L, 40 * 1024 * Buckets)), "k", Buckets)
    val reset = KeyBloom.saturationStat(spark, base).get
    assert(reset.fill <= 0.51 && reset.effFpp < KeyBloom.DefaultFpp,
      s"rebuild did not reset the stat: $reset")
    // no sidecar → no stat (legacy store: the probe is already the scan)
    assert(KeyBloom.saturationStat(spark, tmpBase()).isEmpty)
    KeyBloom.delete(spark, base)
  }

  test("probe-time saturation trip wire: silent at design capacity, named " +
      "warning past the 10x-created-fpp trigger") {
    // at design capacity effFpp ≈ the created fpp — no warning
    val healthy = KeyBloom.Meta(1L, 1, 1000000L, 0.02, 1000000L)
    assert(ProbeReduce.saturationWarning("graft_t", healthy).isEmpty,
      "design-capacity store tripped the saturation warning")
    // at 3x capacity effFpp ≈ 0.5 ≥ 10 × 0.02 — warn, naming store + verb
    val sat = KeyBloom.Meta(2L, 1, 1000000L, 0.02, 3000000L)
    val msg = ProbeReduce.saturationWarning("graft_t", sat).getOrElse(
      fail("3x-capacity store did not trip the saturation warning"))
    assert(msg.contains("graft_t") && msg.contains("compact()"),
      s"warning must name the store and the verb: $msg")
    // a LOOSE-fpp store (10x its fpp exceeds 1.0 — unreachable, effFpp
    // caps at 1.0) must still warn when genuinely saturated, via the
    // threshold ceiling ...
    val looseSat = KeyBloom.Meta(3L, 1, 1000000L, 0.2, 40000000L)
    assert(ProbeReduce.saturationWarning("graft_t", looseSat).isDefined,
      "saturated loose-fpp store never able to warn (threshold > 1.0)")
    // ... and stay silent at its design capacity
    val looseOk = KeyBloom.Meta(3L, 1, 1000000L, 0.2, 1000000L)
    assert(ProbeReduce.saturationWarning("graft_t", looseOk).isEmpty,
      "design-capacity loose-fpp store tripped the warning")
  }

  test("empty build: manifest valid, every bucket file present, probes " +
      "of anything miss everywhere") {
    val base = tmpBase()
    KeyBloom.build(spark, base, keysDf(40L, 0), "k", Buckets)
    val meta = KeyBloom.readMeta(spark, base).get
    assert(meta.inserted == 0L && meta.buckets == Buckets)
    assert(KeyBloom.readAll(spark, base).isDefined,
      "empty build left a torn sidecar (missing bucket files)")
    val cut = KeyBloom.taskLocalCut(spark, base, keysDf(41L, 200), "k",
      Buckets)
    assert(cut.count() == 0L, "keys hit an empty store's blooms")
    KeyBloom.delete(spark, base)
  }
}
