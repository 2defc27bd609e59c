package graft

import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val classic =
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")

  test("classic corpus learns the hand-computed merge sequence") {
    val corpus = Seq(classic).toDF("text")
    val merges = Bpe.train(corpus, "text", numMerges = 4)
    // counts: es/st/t</w> tie at 9 -> lexicographic picks (e,s); then the
    // chain (es,t), (est,</w>); then the l-o/o-w tie at 7 -> (l,o)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow),
      ("l", "o")))
  }

  test("distributed training equals a single-node reference on random words") {
    val rnd = new scala.util.Random(13)
    val lexicon = Seq("aba", "abc", "cab", "bac", "aabb", "ccab", "ba", "ab")
    val text = Seq.fill(400)(lexicon(rnd.nextInt(lexicon.size))).mkString(" ")
    val got = Bpe.train(Seq(text).toDF("text"), "text", numMerges = 6)

    // reference: plain Scala BPE over the same word multiset
    var vocab: Map[Seq[String], Long] = text.split(" ").toSeq
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString) :+ Bpe.Eow, ws.size.toLong) }
    val want = Seq.newBuilder[(String, String)]
    for (_ <- 1 to 6) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p =>
          pairs(p) = pairs.getOrElse(p, 0L) + c) }
      if (pairs.nonEmpty) {
        val (a, b) = pairs.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head._1
        want += ((a, b))
        vocab = vocab.groupBy { case (syms, _) =>
          Bpe.mergeOnce(syms, a, b) }.map { case (s, m) =>
            (s, m.values.sum) }
      }
    }
    assert(got === want.result())
  }

  test("encode applies merges in order; token counts use the cache path") {
    val corpus = Seq(classic).toDF("text")
    val merges = Bpe.train(corpus, "text", numMerges = 4)
    assert(Bpe.encodeWord("lowest", merges) ===
      Seq("lo", "w", "est" + Bpe.Eow))
    assert(Bpe.encodeWord("low", merges) === Seq("lo", "w", Bpe.Eow))
    val counted = Bpe.tokenCount(
      Seq((1L, "low lowest"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    assert(counted === Map(1L -> 6L, 2L -> 0L)) // 3 ("lo w </w>") + 3
  }

  test("early stop when no pair reaches minPairCount") {
    val merges = Bpe.train(Seq("ab cd ef").toDF("text"), "text",
      numMerges = 10, minPairCount = 2)
    // every pair occurs once (incl. the </w> pairs) -> nothing to merge
    assert(merges.isEmpty)
  }
}
