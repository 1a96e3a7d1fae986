package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Functional contracts of the Quality operators (the DuckDB oracle covers
  * sf-corpus parity; these pin behavior the oracle can't see — non-default
  * parameters, empty input, per-stratum exactness).
  */
class QualitySpec extends GraftSuite {

  test("histogram counts sum to the corpus and cover the range gaplessly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    val h = Quality.histogram(spark, sf).collect().sortBy(_.getLong(0))
    assert(h.length == 16)
    assert(h.map(_.getLong(3)).sum == docs, "every doc lands in exactly one bucket")
    // buckets tile [min, max] with no gaps or overlaps
    h.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) == a.getLong(2) + 1, s"gap between buckets ${a.getLong(0)} and ${b.getLong(0)}")
    }
    assert(h.forall(r => r.getLong(1) <= r.getLong(2)))
  }

  test("histogram honors a non-default bucket count (not oracle-checked)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    val h = Quality.histogram(spark, sf, buckets = 7).collect()
    assert(h.length == 7)
    assert(h.map(_.getLong(3)).sum == docs)
  }

  test("histogram fails fast with a clear message on an empty table") {
    val empty = java.nio.file.Files.createTempDirectory("graft-empty").toString
    spark.read.parquet(s"$sf/documents.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$empty/documents.parquet")
    val e = intercept[IllegalArgumentException](Quality.histogram(spark, empty))
    assert(e.getMessage.contains("empty"))
  }

  test("stratifiedSample returns exactly k rows per stratum, deterministically") {
    val got = Quality.stratifiedSample(spark, sf, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySource = got.groupBy(_._1)
    val sources = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(bySource.keySet == sources)
    bySource.foreach { case (s, rows) =>
      assert(rows.length == 5, s"stratum $s must yield exactly k")
      assert(rows.map(_._2).sorted.toSeq == (1L to 5L), "ranks are 1..k")
    }
    // determinism: same call → same sample (hash-based, no RNG state)
    val again = Quality.stratifiedSample(spark, sf, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("repetition ppm fractions match a closed-form constructed doc") {
    import spark.implicits._
    // doc 0: "x y z" repeated 4 times (12 words): 3 uniq → dup_word 9/12;
    // 2-grams: 11 total, distinct = {xy, yz, zx} 3 → dup 8/11;
    // 3-grams: 10 total, distinct = {xyz, yzx, zxy} 3 → dup 7/10.
    // doc 1: all-distinct words → 0 everywhere.
    val docs = Seq(
      (0L, Seq.fill(4)("x y z").mkString(" ")),
      (1L, (0 until 30).map(i => s"w$i").mkString(" ")))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Quality.repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) == (12L, 9L * 1000000 / 12, 8L * 1000000 / 11, 7L * 1000000 / 10))
    assert(got(1L) == (30L, 0L, 0L, 0L))
  }

  test("compressionRatio orders repetitive < prose < random and is deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = Seq(
      (0L, Seq.fill(200)("boiler plate template row").mkString(" ")), // repetitive
      (1L, Seq.fill(150)(Seq("the", "merge", "batch", "pipeline", "quality",
        "data", "filter", "model").apply _).zipWithIndex
        .map { case (f, i) => f(i % 8) }.mkString(" ")), // small-vocab prose
      (2L, Seq.fill(800)(rnd.alphanumeric.take(6).mkString).mkString(" "))) // random
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft-deflate").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = Quality.compressionRatio(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val got = run()
    assert(got(0L) < got(1L) && got(1L) < got(2L),
      s"expected repetitive < prose < random, got $got")
    assert(got.values.forall(v => v > 0L && v < 2000000L), s"ratio bounds: $got")
    assert(run() == got, "deflate at a fixed level is deterministic")
  }

  test("sourceOverlap matrix matches closed-form shingle counts") {
    import spark.implicits._
    // src A doc: w0..w9 (8 shingles); src B doc: w5..w14 (8 shingles,
    // shares shingles starting at w5..w7 → 3 shared); src C: disjoint.
    val a = (0 until 10).map(i => s"w$i").mkString(" ")
    val b = (5 until 15).map(i => s"w$i").mkString(" ")
    val c = (0 until 10).map(i => s"z$i").mkString(" ")
    val docs = Seq((0L, a, "A"), (1L, b, "B"), (2L, c, "C"))
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft-ovl").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Quality.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "A") -> 8L, ("B", "B") -> 8L, ("C", "C") -> 8L,
      ("A", "B") -> 3L))
  }

  test("qualityFilter verdicts are consistent with their emitted features") {
    val rows = Quality.qualityFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, wl, st, mf) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(r.getBoolean(6) == (n >= 5 && n <= 10000))
      assert(r.getBoolean(7) == (wl >= 200 && wl <= 1200))
      assert(r.getBoolean(8) == (st >= 1))
      assert(r.getBoolean(9) == (mf * 5 <= n))
      assert(r.getBoolean(10) == (r.getBoolean(6) && r.getBoolean(7)
        && r.getBoolean(8) && r.getBoolean(9)))
    }
    // the gate actually discriminates on this corpus (some pass, some fail
    // would be ideal; at minimum the flags are not vacuously constant)
    assert(rows.map(_.getBoolean(10)).distinct.length >= 1)
  }

  test("lmScore: closed-form bigram MLE ppm, floor arithmetic, <2-token docs excluded") {
    import spark.implicits._
    // corpus: c(a,b)=3, c(b,a)=1, c(b,c)=1; bigram-left counts c1(a)=3,
    // c1(b)=2 → p_ppm(a,b)=10⁶, p_ppm(b,a)=p_ppm(b,c)=500000.
    val docs = Seq(
      (0L, "a b a b", "en", "web", 7L),  // tf(a,b)=2, tf(b,a)=1
      (1L, "a b c", "en", "web", 5L),    // tf(a,b)=1, tf(b,c)=1
      (2L, "x", "en", "web", 1L))        // no bigram — excluded
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.lmScore(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc0: (2·10⁶ + 1·5·10⁵) div 3 = 833333 (floor); doc1: (10⁶+5·10⁵) div 2
    assert(got == Map(0L -> ((3L, 833333L)), 1L -> ((2L, 750000L))), s"got $got")
  }

  test("lmScore scores common-pattern text above rare-continuation text") {
    // 20 docs of a fixed phrase + 1 doc that shares lefts but continues
    // uniquely: the shared doc's continuations are rare given their lefts.
    import spark.implicits._
    val docs = (0 until 20).map(i => (i.toLong, "the quick brown fox", "en", "web", 19L)) :+
      ((99L, "the slow brown owl", "en", "web", 18L))
    val dir = java.nio.file.Files.createTempDirectory("graft-lm2").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val s = graft.operators.TextAnalysis.lmScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(0L) > s(99L), s"common text must outscore rare continuations: $s")
  }

  test("textNormalize: case, whitespace runs and adjacent duplicates collapse (closed form)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The  the THE fox", "en", "web", 16L),
      (2L, "  spaced   out  ", "en", "web", 16L),
      (3L, "a a the", "en", "web", 7L),
      (4L, "solo", "en", "web", 4L),
      (5L, "a b a b", "en", "web", 7L)) // NON-adjacent repeats survive
    val dir = java.nio.file.Files.createTempDirectory("graft-norm").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.textNormalize(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("the fox", 2L, 2L)))
    assert(got(2L) == (("spaced out", 2L, 0L)))
    assert(got(3L) == (("a the", 2L, 1L)))
    assert(got(4L) == (("solo", 1L, 0L)))
    assert(got(5L) == (("a b a b", 4L, 0L)))
  }

  test("textNormalize plan is a zero-shuffle narrow scan (no Exchange, no Generate)") {
    val p = graft.operators.TextAnalysis.textNormalize(spark, sf)
      .queryExecution.executedPlan.toString
    // Tables.cpuFanOut's bounded RoundRobin input fan-out is the one
    // allowed Exchange (single-row-group artifact); no keyed shuffle
    assert(!p.replace("Exchange RoundRobinPartitioning", "").contains("Exchange"),
      s"normalize must not shuffle on a key:\n$p")
    assert(!p.contains("Generate"), s"normalize must not explode:\n$p")
  }
}
