package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed byte-pair-encoding merge learning (Sennrich-style word-level
 * BPE) — actually TRAINING the subword vocabulary, not approximating its
 * token count (`TextOps.bpeishTokenCount` is the cheap proxy).
 *
 * Cost shape, sized for a 100 TB corpus:
 *  - The only corpus-sized pass is the word count: codegen'd tokenize +
 *    explode + one combine-enabled groupBy. Everything after runs on the
 *    VOCABULARY (unique words x counts) — millions of rows, not trillions —
 *    so the per-merge iteration cost is independent of corpus size.
 *  - Each merge round is one pair-count aggregation over the vocab (map-side
 *    combined; only distinct pairs reach the shuffle) and one narrow map to
 *    apply the merge. Lineage is truncated every few rounds the same way
 *    `Dedup.components` does, or the driver-side plan alone goes quadratic.
 *  - The argmax pair breaks ties lexicographically — fully deterministic,
 *    replayable run to run and machine count to machine count.
 *
 * The learned merge list is driver-sized (`numMerges` entries) and rides
 * into [[encodeWord]] / [[tokenCount]] as a closure, the same
 * broadcast-small pattern as IVF centroids.
 */
object Bpe {

  final case class Vocab(syms: Seq[String], cnt: Long)

  /** End-of-word sentinel appended to every word (standard BPE: merges
    * never cross word boundaries, and word-final units stay distinct). */
  val Eow = "</w>"

  /** Learn `numMerges` merges from the corpus. Stops early when no pair
    * reaches `minPairCount`. */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var words: Dataset[Vocab] = corpus
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => Vocab(w.map(_.toString) :+ Eow, c) }
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val best = words.flatMap(v =>
          if (v.syms.size < 2) Iterator.empty
          else v.syms.iterator.zip(v.syms.iterator.drop(1))
            .map { case (a, b) => (a, b, v.cnt) })
        .toDF("a", "b", "cnt")
        .groupBy("a", "b").agg(sum("cnt").as("total"))
        .orderBy(desc("total"), asc("a"), asc("b"))
        .as[(String, String, Long)]
        .take(1)
      best match {
        case Array((a, b, total)) if total >= minPairCount =>
          merges += ((a, b))
          val prev = words
          words = words.map(v => Vocab(mergeOnce(v.syms, a, b), v.cnt))
            .persist(StorageLevel.MEMORY_AND_DISK)
          // truncate lineage: 10 stacked map rounds are cheap, 100 are a
          // driver-side analysis blow-up (the Dedup.components lesson)
          if ((round + 1) % 10 == 0) words = words.localCheckpoint()
          prev.unpersist()
          round += 1
        case _ => done = true
      }
    }
    words.unpersist()
    merges.result()
  }

  /** One left-to-right pass replacing every adjacent (a, b) with a+b —
    * the standard greedy merge application. */
  private[graft] def mergeOnce(syms: Seq[String], a: String, b: String)
      : Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word: apply the merges in learned order. Driver-pure and
    * deterministic; the merge list is closure-broadcast when mapped over a
    * corpus. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString) :+ Eow: Seq[String]) {
      case (syms, (a, b)) => mergeOnce(syms, a, b)
    }

  /** Per-document token count under the learned vocabulary. The per-word
    * encode is cached per partition (Zipf: a few thousand distinct words
    * cover almost all tokens), so the corpus pass does hash lookups, not
    * re-encodes. */
  def tokenCount(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        TextOps.tokens(col(textCol)).as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, toks) =>
          (id, toks.map(w =>
            cache.getOrElseUpdate(w, encodeWord(w, merges).size).toLong).sum)
        }
      }
      .toDF("doc_id", "n_bpe_tokens")
  }
}
