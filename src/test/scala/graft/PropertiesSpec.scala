package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.incr.Incremental

/** Property-style tests via raw ScalaCheck generators (the scalatestplus
  * bridge is not in the offline cache), sampled with a fixed seed. */
class PropertiesSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 300): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("ordinal encode/decode inverse over the regex-gated range") {
    // the DateMagic regex admits ordinals 700000..2999999 and 3000000..3599999
    samples(Gen.choose(700000L, 3599999L)).foreach { n =>
      assert(Incremental.toOrdinal(Incremental.fromOrdinal(n)) == n)
    }
  }

  test("date -> ordinal stays in python's toordinal convention") {
    samples(Gen.choose(-200000L, 200000L)).foreach { epochDay =>
      val d = LocalDate.ofEpochDay(epochDay)
      assert(Incremental.toOrdinal(d) == epochDay + 719163L)
    }
  }

  test("range split: contiguous, complete, monotone for any n") {
    val s = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    samples(Gen.zip(Gen.choose(1, 50), Gen.choose(60L, 10000000L)), 150)
      .foreach { case (n, secs) =>
        val e = s.plusSeconds(secs)
        val parts = Incremental.splitRange(s, e, n)
        assert(parts.length == n)
        assert(parts.head._1 == s && parts.last._2 == e)
        parts.sliding(2).foreach {
          case Seq(a, b) => assert(a._2 == b._1)
          case _ =>
        }
        parts.foreach { case (a, b) => assert(!b.isBefore(a)) }
      }
  }

  test("salted join equals plain join for arbitrary key sets and salt counts") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val gen = Gen.zip(
      Gen.listOfN(60, Gen.choose(0L, 8L)), // left keys, heavy collisions
      Gen.listOfN(10, Gen.choose(0L, 12L)), // right keys, partial overlap
      Gen.choose(1, 16)) // salt count
    samples(gen, 12).foreach { case (lk, rk, nSalts) =>
      val left = lk.zipWithIndex.map { case (k, i) => (k, s"l$i") }.toDF("k", "v")
      val right = rk.distinct.map(k => (k, s"r$k")).toDF("k", "w")
      val plain = left.join(right, Seq("k"))
      val salted = graft.ops.Skew.saltedJoin(left, right, Seq("k"), nSalts)
      assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty,
        s"nSalts=$nSalts")
    }
  }

  test("native tokenizer equals the composed split/filter form") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', ',', '.', '-', '\n', '\t'),
      1 -> Gen.oneOf('好', 'É', 'ß', 'и', '€'))).map(_.mkString)
    val texts = samples(gen, 200) :+ "" :+ "   " :+ "a" :+ "7h9-x好x"
    val df = texts.toDF("t")
    val got = df.select(graft.ops.TextOps.tokens($"t"))
      .as[Seq[String]].collect().toSeq
    val want = df.select(
      filter(split(lower($"t"), "[^a-z0-9]+"), x => length(x) > 0))
      .as[Seq[String]].collect().toSeq
    assert(got == want)
  }

  test("contamination pairs equal a brute-force shingle-set reference") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    val docs = samples(doc, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val corpus = docs.take(32).toDF("doc_id", "text")
    val bench = docs.drop(32).toDF("doc_id", "text")
    val n = 3
    def shingleSet(t: String): Set[String] = {
      val toks = graft.plans.TokenizeAlnum.tokensOf(t)
      if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val want = (for {
      (cid, ct) <- docs.take(32)
      (bid, bt) <- docs.drop(32)
      shared = (shingleSet(ct) intersect shingleSet(bt)).size
      if shared >= 2
    } yield (cid, bid) -> (shared.toLong, shingleSet(bt).size.toLong,
      shared.toDouble / shingleSet(bt).size)).toMap
    val got = graft.ops.Dedup.contaminationPairs(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = n, minShared = 2)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got == want)
    assert(want.nonEmpty, "degenerate fixture: no overlaps generated")
  }

  test("span removal with an unreachable threshold is the identity") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // with minDf no tile can reach, reassembly must reproduce the
    // normalized text exactly (tokens rejoined in order, single spaces)
    val gen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', ',', '.', '-', '\n')))
      .map(_.mkString)
    val texts = samples(gen, 120) :+ "" :+ "   " :+ "one two three four five"
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps
      .removeRepeatedSpans(df, "doc_id", "text", n = 3, minDf = Int.MaxValue)
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = df.select($"doc_id", graft.ops.TextOps.normalize($"text"))
      .as[(Long, String)].collect().toMap
    texts.indices.foreach { i =>
      val (clean, removed) = got(i.toLong)
      assert(removed == 0L)
      assert(clean == want(i.toLong), s"doc $i reassembly diverged")
    }
  }

  test("duplicatedSpans: a fully cloned corpus yields whole-doc spans") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val n = 3
    val gen = Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg"))
        .map(_.mkString(" ")))
    val texts = samples(gen, 60).distinct // distinct: no accidental dups
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val cloned = docs ++ docs.map { case (id, t) => (id + 10000L, t) }
    val got = graft.ops.TextOps.duplicatedSpans(
        cloned.toDF("doc_id", "text"), "doc_id", "text", n = n, minSpan = n)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    cloned.foreach { case (id, t) =>
      val toks = graft.plans.TokenizeAlnum.tokensOf(t)
      if (toks.length >= n)
        // every position's gram has its clone: ONE span covering the doc
        assert(got(id) == Set((0L, toks.length.toLong)), s"doc $id")
      else assert(!got.contains(id), s"doc $id under gram size")
    }
  }

  test("gopherRepetition: fractions bounded, extremes hit exactly") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gen = Gen.chooseNum(1, 40).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("w1", "w2", "w3", "w4"))
        .map(_.mkString(" ")))
    val texts = samples(gen, 80) :+ "" :+ ("solo " * 30).trim
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = graft.ops.TextOps.gopherRepetition(df, "doc_id", "text",
        t => split(t, " "), topN = 2, dupN = 3)
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.length == texts.length)
    rows.foreach { case (id, nLines, dlf, dlcf, topf, dupf) =>
      assert(nLines >= 1, s"doc $id")
      Seq(dlf, dlcf, topf, dupf).foreach(f =>
        assert(f >= 0.0 && f <= 1.0, s"doc $id frac $f out of range"))
    }
    // "solo" x30: every line duplicated, every 3-gram duplicated
    val solo = rows.find(_._1 == texts.length - 1L).get
    assert(solo._3 > 0.9 && solo._6 == 1.0)
  }

  test("components equal a union-find reference on random graphs") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val gen = Gen.listOfN(12, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
      .map(_.filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    samples(gen, 6).foreach { edges =>
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical = min member of each union-find class
      val want = parent.keys.map { v =>
        val members = parent.keys.filter(u => find(u) == find(v))
        v -> members.min
      }.toMap
      val got = graft.ops.Dedup
        .components(edges.toDF("doc1", "doc2"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"edges=$edges")
    }
  }

  test("star-contraction components equal union-find on random graphs") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val gen = Gen.listOfN(12, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
      .map(_.filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    samples(gen, 6).foreach { edges =>
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map { v =>
        val members = parent.keys.filter(u => find(u) == find(v))
        v -> members.min
      }.toMap
      val got = graft.ops.Dedup
        .componentsStar(edges.toDF("doc1", "doc2"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"edges=$edges")
    }
  }

  test("bpe mergeOnce: no adjacent pair survives; concatenation invariant") {
    val sym = Gen.oneOf("a", "b", "c", "ab", "bc")
    val gen = Gen.zip(Gen.listOfN(12, sym), sym, sym)
    samples(gen, 300).foreach { case (syms, a, b) =>
      val merged = graft.ops.Bpe.mergeOnce(syms, a, b)
      // left-to-right greedy: no untouched adjacent (a, b) remains — any
      // survivor must come from a merged token re-creating the boundary
      merged.sliding(2).zipWithIndex.foreach { case (w, i) =>
        if (w == Seq(a, b))
          assert(i > 0 && merged(i - 1).endsWith(a),
            s"unmerged ($a,$b) in $merged from $syms")
      }
      assert(merged.mkString == syms.mkString) // content preserved
    }
  }

  test("grouped prefix sum: arbitrary data, groups, and layouts") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val gen = Gen.zip(
      Gen.listOfN(120, Gen.zip(Gen.choose(0, 6), Gen.choose(0L, 40L))),
      Gen.choose(1, 12)) // input partitions
    samples(gen, 8).foreach { case (rows, parts) =>
      // unique ids; group g0..g6 with heavy collisions; arbitrary values
      val data = rows.zipWithIndex.map { case ((g, v), i) =>
        (i.toLong, s"g$g", v) }
      val expected = data.groupBy(_._2).flatMap { case (_, grp) =>
        var acc = 0L
        grp.sortBy(_._1).map { case (id, _, v) =>
          val r = id -> acc; acc += v; r }
      }
      val got = graft.ops.Prefix.runningOffsetsBy(
          data.toDF("id", "g", "v").repartition(parts), "g", Seq("id"), "v")
        .select("id", "offset").as[(Long, Long)].collect().toMap
      assert(got === expected, s"parts=$parts")
    }
  }

  test("scd2 merge: deterministic under batch row order and layout") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import graft.write.MergeWriter
    val gen = Gen.zip(
      Gen.listOfN(30, Gen.zip(Gen.choose(1L, 8L), Gen.choose(0, 4))),
      Gen.choose(1, 8))
    samples(gen, 8).foreach { case (batchRows, parts) =>
      val target = MergeWriter.scd2Bootstrap(
        (1L to 5L).map(k => (k, s"v$k")).toDF("id", "v"), "t0")
      def merge(rows: Seq[(Long, Int)]) = MergeWriter.scd2Merge(target,
          rows.map { case (k, x) => (k, s"x$x") }.toDF("id", "v")
            .repartition(parts), Seq("id"), "t1")
        .select("id", "v", "valid_from", "valid_to", "is_current")
        .as[(Long, String, String, Option[String], Boolean)].collect().toSet
      // any permutation of the same multi-row batch merges identically —
      // the deterministic-dedup contract scd2Sink's replay convergence
      // rests on
      val a = merge(batchRows)
      val b = merge(scala.util.Random.shuffle(batchRows))
      assert(a === b)
    }
  }

  test("period limits are well-formed for any monthsBack") {
    val gen = Gen.zip(Gen.choose(-48, 0), Gen.choose(2000, 2030),
      Gen.choose(1, 12))
    samples(gen, 150).foreach { case (mb, y, m) =>
      val now = java.time.LocalDateTime.of(y, m, 15, 12, 0)
      val (lo, hi) = Incremental.limitsForFilter(mb, "aje_period", now)
      assert(lo <= hi && lo.length == 6 && hi.length == 6)
      val (olo, ohi) = Incremental.limitsForFilter(mb, "aje_date", now)
      assert(olo.toLong <= ohi.toLong)
      // upper is the last day of now's month
      assert(Incremental.fromOrdinal(ohi.toLong) ==
        now.toLocalDate.withDayOfMonth(now.toLocalDate.lengthOfMonth))
    }
  }

  test("canonicalUrl: idempotent and variant-insensitive on generated URLs") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))
      port <- Gen.oneOf("", ":443", ":80", ":8080")
      path <- Gen.oneOf("", "/", "/a", "/a/b", "/a/b/")
      params <- Gen.someOf(Seq("b=2", "a=1", "utm_source=x", "z=9"))
      frag <- Gen.oneOf("", "#top")
    } yield {
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      s"$scheme://$www$host.com$port$path$q$frag"
    }
    val urls = samples(gen, 200).distinct
    val out = urls.toDF("u")
      .select(col("u"),
        graft.ops.TextOps.canonicalUrl(col("u")).as("c1"))
      .select(col("u"), col("c1"),
        graft.ops.TextOps.canonicalUrl(col("c1")).as("c2"))
      .as[(String, String, String)].collect()
    out.foreach { case (u, c1, c2) =>
      // idempotence: canonical form is a fixed point
      assert(c1 == c2, s"not idempotent: $u -> $c1 -> $c2")
      // invariants: lowercase scheme+host, no fragment, no utm_, no
      // default port, no trailing slash on a non-root path
      assert(!c1.contains("#") && !c1.contains("utm_"), s"$u -> $c1")
      val hostPart = c1.drop(c1.indexOf("://") + 3).takeWhile(_ != '/')
        .takeWhile(_ != '?')
      // DEFAULT ports stripped for their own scheme only (https://h:80 is
      // a legitimate non-default port and must survive)
      if (c1.startsWith("https://"))
        assert(!hostPart.endsWith(":443"), s"$u -> $c1")
      if (c1.startsWith("http://"))
        assert(!hostPart.endsWith(":80"), s"$u -> $c1")
      assert(hostPart == hostPart.toLowerCase && !hostPart.startsWith("www."),
        s"$u -> $c1")
    }
    // messy/clean variants of the same logical URL converge
    val pairCheck = Seq(
      ("HTTPS://WWW.Site.com:443/x/?utm_a=1&b=2#f", "https://site.com/x?b=2"))
    pairCheck.foreach { case (messy, clean) =>
      val got = Seq(messy, clean).toDF("u")
        .select(graft.ops.TextOps.canonicalUrl(col("u"))).as[String]
        .collect().toSet
      assert(got.size == 1, s"did not converge: $got")
    }
  }

  test("unicode_normalize: idempotent per form; NFC/NFD round-trip stable") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.plans.GraftExpressions.unicode_normalize
    val gen = Gen.listOfN(6, Gen.oneOf(
      "a", "Z", "9", " ", "é", "é", "ü", "ü",
      "ﬁ", "Ａ", "ß")).map(_.mkString)
    val strs = samples(gen, 200).distinct
    val out = strs.toDF("s").select(col("s"),
        unicode_normalize(col("s")).as("nfc"),
        unicode_normalize(unicode_normalize(col("s"))).as("nfc2"),
        unicode_normalize(unicode_normalize(col("s"), "NFD"), "NFC")
          .as("nfd_nfc"))
      .as[(String, String, String, String)].collect()
    out.foreach { case (s, nfc, nfc2, nfdNfc) =>
      assert(nfc == nfc2, s"NFC not idempotent on ${s.codePoints.toArray.toSeq}")
      // composing after a full decomposition lands on the same NFC form
      assert(nfdNfc == nfc, s"NFD->NFC != NFC on ${s.codePoints.toArray.toSeq}")
    }
  }

  test("changedPartitions: permuted identical generations are all unchanged") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val gen = Gen.listOfN(60, for {
      p <- Gen.choose(0, 4)
      k <- Gen.choose(0L, 1000000L)
      v <- Gen.alphaStr.map(_.take(6))
    } yield (s"p$p", k, v)).map(_.distinct)
    samples(gen, 20).foreach { rows =>
      val base = rows.toDF("p", "k", "v")
      val permuted = scala.util.Random.shuffle(rows).toDF("p", "k", "v")
        .repartition(7)
      val st = graft.incr.Incremental.changedPartitions(base, permuted, "p")
        .select("status").distinct().as[String].collect().toSeq
      assert(st.isEmpty || st == Seq("unchanged"), st.toString)
    }
  }

  test("skyline query is sound and complete vs brute-force dominance") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val got = SparkEntry.queries("q_agg_skyline")(spark,
        "/root/testdata/sf0.001")
      .select("p_partkey", "p_size", "price_cents")
      .as[(Long, Int, Long)].collect().toSet
    val pts = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .selectExpr("p_partkey", "CAST(p_size AS INT) p_size",
        "CAST(floor(p_retailprice * 100) AS BIGINT) pc")
      .as[(Long, Int, Long)].collect()
    def dominated(s: Int, c: Long) = pts.exists { case (_, s2, c2) =>
      s2 >= s && c2 <= c && (s2 > s || c2 < c) }
    // sound: nothing returned is dominated
    assert(got.forall { case (_, s, c) => !dominated(s, c) })
    // complete: everything not returned is dominated
    assert(pts.forall { case (k, s, c) =>
      got.contains((k, s, c)) || dominated(s, c) })
  }

  test("netChanges is idempotent: re-netting the net images is identity") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val g = for {
      id <- Gen.choose(1L, 20L)
      seq <- Gen.choose(1L, 9L)
      op <- Gen.oneOf("I", "U", "D")
      v <- Gen.alphaStr.map(_.take(4))
    } yield (id, seq, op, v)
    val raw = samples(g, 200)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (id, seq)
    val log = raw.toDF("id", "seq", "op", "v")
    val net = Incremental.netChanges(log, Seq("id"), "seq", "op")
    val once = net.as[(Long, Long, String, String)].collect().sortBy(_._1)
    val twice = Incremental.netChanges(net, Seq("id"), "seq", "op")
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    assert(once.toSeq === twice.toSeq)
    assert(once.forall(_._3 != "D"))
  }

  test("bfs levels satisfy edge relaxation: no edge drops more than 1 hop") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val edgeGen = for {
      a <- Gen.choose(1L, 30L); b <- Gen.choose(1L, 30L) if a != b
    } yield (a, b)
    val fwd = samples(edgeGen, 120).distinct
    val e = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val lvl = graft.ops.Graph.bfsLevels(e, "src", "dst",
        Seq(1L).toDF("seed"), "seed", rounds = 6)
      .as[(Long, Long)].collect().toMap
    for ((u, v) <- fwd ++ fwd.map(_.swap)) {
      (lvl.get(u), lvl.get(v)) match {
        case (Some(lu), Some(lv)) => assert(lv <= lu + 1, s"($u,$v)")
        case (Some(lu), None) => assert(lu >= 5, s"$v unreached from $u")
        case _ => ()
      }
    }
    assert(lvl.get(1L).contains(0L))
  }
}
