package graft

import graft.operators.TextAnalysis

/** Round-13 additions: the WordPiece trainer (likelihood-scored merges)
  * and its greedy longest-match-first (MaxMatch) application. */
class Round13Spec extends SparkSpec {

  test("text_wordpiece_train: likelihood argmax diverges from BPE's count argmax") {
    import spark.implicits._
    // "ab" is the most FREQUENT pair but its symbols are equally frequent,
    // so its likelihood count(ab)/(c(a)c(b)) = 1/50; "xy" is rarer but
    // 1/10 — WordPiece must pick "x y" where BPE picks "a b"
    val docs = (Seq.fill(50)("ab") ++ Seq.fill(10)("xy"))
      .map(Tuple1(_)).toDF("text")
    val wp = TextAnalysis.wordpieceTrainOver(docs, 1).collect()
    assert(wp.length == 1)
    assert(wp(0).getAs[String]("pair") == "x y", wp(0).toString)
    assert(wp(0).getAs[Long]("pair_count") == 10L)
    // exact milli-ln score: lnq(10) - lnq(10) - lnq(10) = -2303
    assert(wp(0).getAs[Long]("score_milli") == -2303L)
    val bpe = TextAnalysis.bpeTrainOver(docs, 1).collect()
    assert(bpe(0).getAs[String]("pair") == "a b", bpe(0).toString)
  }

  test("text_wordpiece_train: merged symbol feeds the next round's denominator") {
    import spark.implicits._
    // after merging "x y" -> "xy", the symbol "xy" has count 10 and the
    // pair "xy z" scores lnq(10)-lnq(10)-lnq(10); the trainer must count
    // the FUSED symbol, not its characters
    val docs = (Seq.fill(50)("ab") ++ Seq.fill(10)("xyz"))
      .map(Tuple1(_)).toDF("text")
    val wp = TextAnalysis.wordpieceTrainOver(docs, 2).collect()
    assert(wp.map(_.getAs[String]("pair")).toSeq == Seq("x y", "xy z"),
      wp.mkString(";"))
    assert(wp(1).getAs[Long]("score_milli") == -2303L)
  }

  /** Plain-Scala mirror of the MaxMatch fold, truncating substr and all:
    * at 1-based pos, try lengths 6→2 against the merge products (substring
    * clamped at word end), else consume one char. */
  private def refMaxMatch(w: String, products: Set[String]): Long = {
    var pos = 1
    var cnt = 0L
    while (pos <= w.length) {
      val mlen = (6 to 2 by -1).find { l =>
        products.contains(w.substring(pos - 1, math.min(pos - 1 + l, w.length)))
      }.getOrElse(1)
      pos += mlen
      cnt += 1
    }
    cnt
  }

  test("text_wordpiece_apply: per-source counts match a plain-Scala MaxMatch") {
    import spark.implicits._
    val docs = Seq(
      ("web", "the theme then theory the the quick quick brown"),
      ("web", "thequick ck qui quince a b the"),
      ("book", "quick the anthem x yz the theme"),
      ("book", "zz the the the quince quip")).toDF("source", "text")
    val products = TextAnalysis
      .wordpieceTrainOver(docs.select($"text"), 5).collect()
      .map(_.getAs[String]("pair").replace(" ", "")).toSet
    assert(products.size == 5, products.toString)
    val got = TextAnalysis.wordpieceApplyOver(docs, 5).collect()
      .map(r => r.getString(0) -> r).toMap
    val toks = docs.collect().flatMap(r =>
      r.getString(1).split(" ").filter(_.nonEmpty).map(w => (r.getString(0), w)))
    for (src <- Seq("web", "book")) {
      val ws = toks.filter(_._1 == src).map(_._2)
      assert(got(src).getAs[Long]("n_tokens") == ws.length.toLong, src)
      assert(got(src).getAs[Long]("chars") == ws.map(_.length.toLong).sum, src)
      val pieces = ws.map(refMaxMatch(_, products)).sum
      assert(got(src).getAs[Long]("pieces_after") == pieces, s"$src: $pieces")
      assert(got(src).getAs[Long]("compression_bp") ==
        pieces * 10000L / ws.map(_.length.toLong).sum, src)
    }
  }

  test("text_wordpiece_apply: MaxMatch is greedy, not optimal — and that's pinned") {
    import spark.implicits._
    // products {ab, abc} on word "abcd": greedy takes "abc"+"d" (2 pieces);
    // on "abd": "ab"+"d" (2); on "abcabc": "abc"+"abc" (2). The word "aabc"
    // shows the longest-FIRST rule: "a"+"abc" (2), never "a a b c"
    val docs = Seq(
      ("s", "ababab ababab abab ababab abab abcabc abcabc abcd abd aabc"))
      .toDF("source", "text")
    val products = TextAnalysis
      .wordpieceTrainOver(docs.select($"text"), 2).collect()
      .map(_.getAs[String]("pair").replace(" ", "")).toSet
    val got = TextAnalysis.wordpieceApplyOver(docs, 2).collect()
    val ws = docs.collect().flatMap(_.getString(1).split(" "))
    val expect = ws.map(refMaxMatch(_, products)).sum
    assert(got(0).getAs[Long]("pieces_after") == expect,
      s"products=$products got=${got(0)}")
  }
}
