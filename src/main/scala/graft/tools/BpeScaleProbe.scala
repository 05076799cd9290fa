package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exercises [[graft.operators.Bpe]]'s DISTRIBUTED merge-round path above
  * [[graft.operators.Bpe.MaxLocalVocab]] for real: BpeSpec differential-
  * gates the two training paths equal on fixtures with the cap lowered,
  * but no recorded run had > 4M distinct words (the testdata vocabulary
  * is 31 words), so the localCheckpoint'd rounds' wall and the path
  * switch (Bpe.train's wc.count() branch) had never been observed at
  * their design scale.
  *
  * Corpus: `nWords` DISTINCT synthetic words (`"w" + base-26(id)` — one
  * occurrence each, 1000 words per document). Distinctness inflates the
  * vocabulary past the cap; the shared letter structure still gives every
  * adjacent character pair corpus-scale counts (BPE trains on TYPE
  * counts, so single-occurrence words are the worst case for the
  * vocabulary relation's SIZE while keeping the merge rounds
  * meaningful — exactly what the scale path must survive).
  *
  * Reports: distinct words, the chosen path, word-count wall, total
  * training wall, per-round wall, and the first merges. Recorded in
  * BASELINE.md. Usage:
  *   runMain graft.tools.BpeScaleProbe [nWords] [numMerges]
  */
object BpeScaleProbe {

  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toLong).getOrElse(4_300_000L)
    val numMerges = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("bpe-scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[bpe-scale-probe] loadavg ${graft.Bench.loadAvg()} " +
      s"nWords=$nWords numMerges=$numMerges")
    import graft.operators.Bpe
    val docs = spark.range(nWords)
      .select((col("id") / 1000).cast("long").as("doc_id"),
        concat(lit("w"), conv(col("id"), 10, 26)).as("w"))
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list(col("w"))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[bpe-scale-probe] docs=${docs.count()}")
    val t0 = System.nanoTime()
    val wc = Bpe.wordCounts(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDistinct = wc.count()
    val wallWc = (System.nanoTime() - t0) / 1e9
    val path = if (nDistinct <= Bpe.MaxLocalVocab) "LOCAL" else "DISTRIBUTED"
    println(f"BPE-SCALE distinct_words=$nDistinct cap=${Bpe.MaxLocalVocab} " +
      f"path=$path wall_wordcount=$wallWc%.2f s")
    assert(path == "DISTRIBUTED",
      s"probe corpus did not clear the cap: $nDistinct <= ${Bpe.MaxLocalVocab}")
    wc.unpersist(): Unit
    // train() re-derives word counts internally — the full entry-point
    // cost, exactly what a caller above the cap pays
    val t1 = System.nanoTime()
    val merges = Bpe.train(docs, numMerges)
    val wall = (System.nanoTime() - t1) / 1e9
    println(f"BPE-SCALE merges_learned=${merges.length} " +
      f"wall_train=$wall%.2f s per_round=${wall / math.max(1, merges.length)}%.2f s " +
      s"first=${merges.take(5).map(m => s"${m.left}+${m.right}").mkString(",")}")
    assert(merges.nonEmpty, "distributed training learned no merges")
    // encode round-trip sanity on a sample of the synthetic words
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // Spark's conv() emits UPPERCASE digits (0-9A-P) — match it
    val sample = Seq(0L, 1L, 25L, 26L, 676L, nWords - 1)
      .map(i => "w" + java.lang.Long.toString(i, 26).toUpperCase)
    sample.foreach { w =>
      assert(Bpe.encodeWord(w, ranks).mkString == w, s"round-trip broke on $w")
    }
    println("[bpe-scale-probe] encode round-trip OK on sampled words")
    docs.unpersist(): Unit
    spark.stop()
  }
}
