package graft.operators

import graft.SparkSpec

/** doc_bpe_vocab / doc_bpe_tokenize: the relational BPE trainer must
  * learn the SAME merge sequence as an independent plain-Scala greedy
  * BPE (count-desc, marked-pair-asc ties, left-to-right
  * non-overlapping merge application), and the token counts must
  * match a plain tokenizer run under those merges. Also pins the
  * string-replace subtlety the relational encoding relies on: "a a a"
  * merges ONCE under left-to-right non-overlap, never twice.
  */
class BpeTokenizerSpec extends SparkSpec {

  private val M = BpeTokenizer.M
  private def mark(sym: String) = sym.split(" ").map(s => s"$M$s$M").mkString(" ")

  /** Independent greedy BPE over symbol LISTS (no string replaces). */
  private def refTrain(words: Map[String, Long], k: Int): Seq[(String, String)] = {
    var states: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector } { case (_, f) => f }(_ + _)
    val out = Vector.newBuilder[(String, String)]
    var i = 0
    var continue = true
    while (i < k && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- states; j <- 0 until syms.size - 1)
        counts((syms(j), syms(j + 1))) = counts.getOrElse((syms(j), syms(j + 1)), 0L) + f
      if (counts.isEmpty) continue = false
      else {
        // argmax by count desc, then marked-pair string asc — the
        // exact tie order both engines use
        val best = counts.toSeq.minBy { case ((a, b), f) => (-f, s"$M$a$M $M$b$M") }._1
        out += best
        states = states.groupMapReduce { case (syms, _) =>
          val r = Vector.newBuilder[String]
          var j = 0
          while (j < syms.size) {
            if (j < syms.size - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              r += best._1 + best._2; j += 2 // left-to-right non-overlap
            } else { r += syms(j); j += 1 }
          }
          r.result()
        } { case (_, f) => f }(_ + _)
        i += 1
      }
    }
    out.result()
  }

  private def refTokens(word: String, merges: Seq[(String, String)]): Int = {
    var syms = word.map(_.toString).toVector
    for ((a, b) <- merges) {
      val r = Vector.newBuilder[String]
      var j = 0
      while (j < syms.size) {
        if (j < syms.size - 1 && syms(j) == a && syms(j + 1) == b) { r += a + b; j += 2 }
        else { r += syms(j); j += 1 }
      }
      syms = r.result()
    }
    syms.size
  }

  private val corpus = Seq(
    "low low low low low", "lower lower newest newest",
    "newest newest newest newest", "widest widest widest",
    "a a a low lowest newest")

  test("relational trainer learns the reference greedy merge sequence") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val dict = BpeTokenizer.wordDict(docs)
    val got = BpeTokenizer.trainMerges(dict, k = 8)

    val wordFreq = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val want = refTrain(wordFreq, 8).map { case (a, b) => mark(s"$a $b") }
    assert(got == want)
  }

  test("token counts match the reference tokenizer; 'a a a' merges once") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val dict = BpeTokenizer.wordDict(docs)
    val merges = BpeTokenizer.trainMerges(dict, k = 8)
    val refMerges = merges.map { p =>
      val Array(a, b) = p.split(' '); (a.replace(M, ""), b.replace(M, ""))
    }
    val got = BpeTokenizer.tokenCounts(dict, merges)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    for ((w, n) <- got) assert(n == refTokens(w, refMerges), s"word $w")

    // the left-to-right non-overlap pin: under merge ("a","a"), "aaa"
    // tokenizes to 2 symbols (aa + a) — a replace that re-scanned its
    // own output, or matched overlapping, would give 1 or 3
    val aaa = Seq((0L, "aaa")).toDF("doc_id", "text")
    val n = BpeTokenizer.tokenCounts(
        BpeTokenizer.wordDict(aaa), Seq(mark("a a")))
      .collect().head.getInt(1)
    assert(n == 2)
  }

  test("fuzz: random corpora train the reference merge sequence (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(11, 42, 97)) {
      val rnd = new scala.util.Random(seed)
      val vocabLetters = "abcdef"
      def randWord() = (1 to (1 + rnd.nextInt(6)))
        .map(_ => vocabLetters(rnd.nextInt(vocabLetters.length))).mkString
      val words = Seq.fill(30)(randWord())
      val corpus = Seq.fill(40)(
        Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" "))
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val dict = BpeTokenizer.wordDict(docs)
      val got = BpeTokenizer.trainMerges(dict, k = 6)
      val wordFreq = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val want = refTrain(wordFreq, 6).map { case (a, b) => mark(s"$a $b") }
      assert(got == want, s"seed $seed diverged")
    }
  }

  test("driver-local trainer is bit-identical to the distributed loop") {
    import spark.implicits._
    // the fixture corpus PLUS a word with an embedded newline: the
    // regex-dot non-match fuses "\n" into the next symbol, and a
    // later merge can string-replace ACROSS that fused boundary — the
    // local trainer must reproduce exactly that, not a symbol-array
    // approximation
    val tricky = corpus :+ "ab\ncd ab\ncd cd cd cd ab ab"
    val docs = tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dict = BpeTokenizer.wordDict(docs)
    val dist = BpeTokenizer.trainMergesDistributed(
      graft.Caching.persistOnce(dict), 8)
    // default cap: vocab << 2^20 routes driver-side
    assert(BpeTokenizer.trainMerges(dict, k = 8) == dist)
    // cap 1 forces the distributed fallback through the public entry
    spark.conf.set("spark.graft.bpe.localTrainMaxVocab", "1")
    try assert(BpeTokenizer.trainMerges(dict, k = 8) == dist)
    finally spark.conf.unset("spark.graft.bpe.localTrainMaxVocab")
  }

  test("doc_pack_sequences_bpe: offsets are the contiguous token prefix sum") {
    val rows = Registry.byName("doc_pack_sequences_bpe")
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // doc_id-ordered, offsets dense: each start = previous start + n
    var expect = 0L
    for ((_, n, start, first, last) <- rows) {
      assert(start == expect, s"offset gap at start=$start expect=$expect")
      assert(first == start / 256 && last == (start + math.max(n, 1) - 1) / 256)
      expect += n
    }
    // and the packing really differs from the word-count twin: learned
    // subword merges compress, so total tokens < total chars but can
    // exceed whitespace words
    val words = Registry.byName("doc_pack_sequences")
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(1)).sum
    val toks = rows.map(_._2).sum
    assert(toks != words, "token packing must be a different budget than word packing")
  }

  test("registry entries run green at sf0.001 with stable shapes") {
    val vocab = Registry.byName("doc_bpe_vocab").run(spark, "/root/testdata/sf0.001").collect()
    assert(vocab.length == BpeTokenizer.Merges)
    assert(vocab.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
    val tok = Registry.byName("doc_bpe_tokenize").run(spark, "/root/testdata/sf0.001").collect()
    assert(tok.nonEmpty)
    // BPE can only compress: learned-vocab tokens never exceed chars,
    // never undercut words
    assert(tok.forall(r => r.getLong(1) >= r.getLong(2)))
  }
}
