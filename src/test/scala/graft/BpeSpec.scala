package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** BPE merge training + greedy apply (C8c/C8d). The merge loop is
  * deterministic but not SQL-expressible (sequential argmax rounds), so
  * the driver check is rows-only and THIS spec is the correctness pin:
  * the textbook example, the plain-Scala apply twin, and the structural
  * invariants.
  */
class BpeSpec extends GraftSuite {

  test("bpeMerges reproduces the Sennrich textbook example") {
    // low×5, lower×2, newest×6, widest×3 — the BPE paper's worked corpus
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = TextAnalysis.bpeMerges(dict, 5)
    assert(merges == Seq(
      (1, "e", "s", 9L),      // newest(6) + widest(3)
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),      // low(5) + lower(2)
      (5, "lo", "w", 7L)), s"got $merges")
  }

  test("bpeMerges stops when no pair repeats (freq >= 2)") {
    val merges = TextAnalysis.bpeMerges(Seq(("ab", 1L), ("cd", 1L)), 10)
    assert(merges.isEmpty, s"singleton pairs must not merge: $merges")
    // one repeated word: merges until the word is a single symbol, then stop
    val one = TextAnalysis.bpeMerges(Seq(("ab", 3L)), 10)
    assert(one == Seq((1, "a", "b", 3L), (2, "ab", "</w>", 3L)), s"got $one")
  }

  /** Plain-Scala twin of the [[graft.functions.BpeCount]] kernel's greedy
    * lowest-rank-first apply.
    */
  private def applyRef(word: String, merges: Seq[(String, String)]): Int = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector :+ "</w>"
    var done = syms.length < 2
    while (!done) {
      val present = syms.sliding(2).flatMap(p => rank.get((p(0), p(1)))).toSeq
      if (present.isEmpty) done = true
      else {
        val (a, b) = merges(present.min)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        if (syms.length < 2) done = true
      }
    }
    syms.length
  }

  test("bpeTokenCount == plain-Scala greedy apply on the sf corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val dict = docs.flatMap(_._2.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, f) => (-f, w) }.take(10000)
    val merges = TextAnalysis.bpeMerges(dict, 30).map(m => (m._2, m._3))
    val got = TextAnalysis.bpeTokenCount(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (id, text) =>
      val words = text.split(" ").filter(_.nonEmpty)
      val expect = words.map(w => applyRef(w, merges).toLong).sum
      assert(got(id)._1 == words.length.toLong, s"doc $id word count")
      assert(got(id)._2 == expect, s"doc $id: got ${got(id)._2}, expect $expect")
    }
  }

  test("bpe symbol counts: bounded below by words, above by chars; merges shrink them") {
    val zero = TextAnalysis.bpeTokenCount(spark, sf, nMerges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    TextAnalysis.bpeTokenCount(spark, sf, nMerges = 30).collect().foreach { r =>
      val (id, nWords, nBpe) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nBpe >= nWords, s"doc $id: every word is >= 1 symbol")
      // 0 merges = chars + terminator per word; 30 merges can only shrink
      assert(nBpe <= zero(id), s"doc $id: merges must not grow the count")
    }
    assert(TextAnalysis.bpeTokenCount(spark, sf, nMerges = 30).collect()
      .map(_.getLong(2)).sum < zero.values.sum,
      "30 merges must compress the corpus somewhere")
  }

  test("bpeTrain emits ranked merges with non-increasing frequencies") {
    val rows = TextAnalysis.bpeTrain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    assert(rows.forall(_._4 >= 2), "no singleton merges")
    // greedy: each round's winning count never exceeds the previous round's
    // count of the SAME pair space — weaker but always-true invariant:
    // counts are positive and the first merge is the global max
    assert(rows.head._4 == rows.map(_._4).max)
  }
}
