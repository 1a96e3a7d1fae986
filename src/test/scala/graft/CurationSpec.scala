package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

class CurationSpec extends GraftSuite {

  test("connectedComponents labels a path graph and keeps components apart") {
    import spark.implicits._
    // component {1,2,3,4} as a path (diameter 3 — exercises multi-pass
    // propagation) and component {10, 11}; 20-21-22 as a triangle
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("d1", "d2")
    val got = Curation.connectedComponents(edges, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents of an empty edge set is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Curation.connectedComponents(empty, "d1", "d2").isEmpty)
  }

  test("dedupCluster covers every doc in a near-dup pair, labels are component minima") {
    val pairs = Dedup.minhashLsh(spark, sf).select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Curation.dedupCluster(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.keySet == inPairs, "every paired doc gets a cluster label")
    // each edge's endpoints share a label, and the label is a member ≤ both
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"endpoints $a,$b in same cluster")
      assert(clusters(a) <= math.min(a, b))
    }
    assert(clusters.values.toSet.subsetOf(clusters.keySet), "labels are member ids")
  }

  test("hashSplit is deterministic, total, and roughly 8/1/1") {
    val s1 = Curation.hashSplit(spark, sf).collect().map(r => (r.getLong(0), r.getString(2)))
    val s2 = Curation.hashSplit(spark, sf).collect().map(r => (r.getLong(0), r.getString(2)))
    assert(s1.toMap == s2.toMap, "stable across runs")
    val n = s1.length.toDouble
    val frac = s1.groupBy(_._2).view.mapValues(_.length / n).toMap
    assert(frac.keySet == Set("train", "val", "test"))
    assert(frac("train") > 0.6 && frac("train") < 0.95)
  }

  test("tfidf ranks a doc-distinctive term above corpus-wide terms") {
    val rows = Curation.tfidf(spark, sf).collect()
    assert(rows.nonEmpty)
    // rk is 1..3 per doc and scores are non-increasing within a doc
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getLong(3)).toSeq
      assert(scores == scores.sorted.reverse, "scores non-increasing in rank")
    }
  }

  test("salted supplier revenue equals the unsalted aggregation") {
    val salted = Curation.saltedSupplierRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val li = io.Tables.lineitem(spark, sf)
    val sup = io.Tables.supplier(spark, sf)
    // same exact-decimal accumulation as the operator (the salted and
    // plain shapes must agree bit-for-bit, not just to double noise)
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(expr("cast(l_extendedprice as decimal(12,2))"
          + " * (cast(1 as decimal(4,2)) - cast(l_discount as decimal(4,2)))"))
        .cast("decimal(18,2)").cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("dedupKeepBest keeps exactly the most-words member per cluster") {
    val rows = Curation.dedupKeepBest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty, "sf0.001 has near-dup clusters")
    // membership matches the cluster query exactly
    val clustered = Curation.dedupCluster(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(t => (t._1, t._2)).toSet == clustered)
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val keeps = members.filter(_._4)
      assert(keeps.length == 1, s"cluster $cid must keep exactly one doc")
      // the winner is max by (n_words, then smaller doc_id)
      val winner = members.minBy(t => (-t._3, t._1))
      assert(keeps.head._1 == winner._1,
        s"cluster $cid kept ${keeps.head} over $winner")
    }
  }

  test("vocabPerSource emits sorted comma-joined vocab consistent with n_vocab") {
    Curation.vocabPerSource(spark, sf).collect().foreach { r =>
      val words = r.getString(1).split(",").toSeq
      assert(words == words.sorted)
      assert(words.distinct.size == words.size)
      assert(r.getLong(2) == words.size.toLong)
    }
  }

  test("dsirWeight: closed-form smoothed bucket ratios; <2-token docs excluded") {
    import spark.implicits._
    // One bigram per doc; "a b" appears in 2 en + 1 fr docs, "c d" in 1 fr
    // doc. Buckets (4096) separate the two bigrams (deterministic hashes).
    //   bucket("a b"): c_raw=3, c_tgt=2 → (2+1)·10⁶ div (3+1) = 750000
    //   bucket("c d"): c_raw=1, c_tgt=0 → (0+1)·10⁶ div (1+1) = 500000
    val docs = Seq(
      (0L, "a b", "en", "web", 3L),
      (1L, "a b", "en", "web", 3L),
      (2L, "a b", "fr", "web", 3L),
      (3L, "c d", "fr", "web", 3L),
      (4L, "x", "en", "web", 1L)) // no bigram — excluded
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.dsirWeight(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      0L -> ((1L, 750000L)), 1L -> ((1L, 750000L)),
      2L -> ((1L, 750000L)), 3L -> ((1L, 500000L))), s"got $got")
  }

  test("dsirWeight separates target-language docs from the rest on the sf corpus") {
    import spark.implicits._
    val lang = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val w = Curation.dsirWeight(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
    assert(w.nonEmpty)
    def mean(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    val (en, other) = w.partition { case (id, _) => lang(id) == "en" }
    // the whole point of the weight: target-like text scores higher on average
    assert(mean(en.map(_._2).toSeq) > mean(other.map(_._2).toSeq),
      s"en mean ${mean(en.map(_._2).toSeq)} vs other ${mean(other.map(_._2).toSeq)}")
  }

  test("curatePipeline: rows == quality survivors; one keep-best per cluster; singletons keep") {
    val out = Curation.curatePipeline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val q = graft.operators.Quality.qualityFilter(spark, sf).collect()
      .filter(_.getAs[Boolean]("keep"))
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_words")).toMap
    assert(out.map(_._1).toSet == q.keySet, "exactly one row per surviving doc")
    out.foreach { case (id, _, nw, _) => assert(q(id) == nw, s"doc $id n_words") }
    out.groupBy(_._2).foreach { case (cid, m) =>
      val keeps = m.filter(_._4)
      assert(keeps.length == 1, s"cluster $cid keeps exactly one")
      val winner = m.minBy(t => (-t._3, t._1))
      assert(keeps.head._1 == winner._1, s"cluster $cid winner")
      // cluster label is the component minimum (or the doc itself for singletons)
      assert(cid == m.map(_._1).min, s"cluster $cid label")
    }
    // the pipeline actually rejects something AND actually clusters something
    assert(out.length < spark.read.parquet(s"$sf/documents.parquet").count())
    assert(out.exists(t => !t._4), "at least one near-dup loser dropped")
  }

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h >>> 4
  }

  test("dsirResample is exactly the hash-acceptance subset of dsirWeight") {
    val w = Curation.dsirWeight(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val accepted = Curation.dsirResample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = w.filter { case (id, _, ppm) =>
      hash60(s"dsir:$id") % 1000000L < ppm }.toSet
    assert(accepted == expect)
    // the resampler actually thins the corpus (weights are ratio-scaled,
    // so raw-typical docs sit near P(target)·10⁶ and lose some coin flips)
    assert(accepted.size < w.length, s"${accepted.size} of ${w.length}")
    assert(accepted.nonEmpty)
  }

  test("chunkOverlap tiles every doc: coverage, bounds and stride invariants") {
    import org.apache.spark.sql.functions._
    val chunkSize = 16; val stride = 12
    val chunks = Curation.chunkOverlap(spark, sf, chunkSize, stride).cache()
    assert(chunks.where(col("chunk_tokens") < 1 || col("chunk_tokens") > chunkSize).count() == 0)
    assert(chunks.where(col("start_tok") =!= col("chunk_idx") * stride).count() == 0)
    // the last chunk of every doc reaches exactly the doc's token count
    val cover = chunks.groupBy("doc_id")
      .agg(max(col("start_tok") + col("chunk_tokens")).as("covered"),
        count(lit(1)).as("n_chunks"))
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.TextHash.tokens(col("text"))).cast("long").as("n"))
      .where(col("n") > 0)
    assert(cover.join(docs, "doc_id").where(col("covered") =!= col("n")).count() == 0,
      "chunks must cover each doc exactly to its last token")
    assert(cover.join(docs, "doc_id", "full_outer")
      .where(col("n").isNull || col("covered").isNull).count() == 0,
      "every non-empty doc chunks; no phantom docs")
    chunks.unpersist()
  }

  test("shuffleOrder: contiguous permutation, run-deterministic, seed-independent") {
    val n = io.Tables.documents(spark, sf).count()
    val a = Curation.shuffleOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // pos is exactly 0..n-1 (contiguous, no gaps, no dups)
    assert(a.map(_._2).sorted.toSeq == (0L until n))
    // pure function of (seed, id): a second run is bit-identical
    val b = Curation.shuffleOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSet == b.toSet)
    // a different seed is an (overwhelmingly) different permutation of the
    // same ids
    val c = Curation.shuffleOrder(spark, sf, seed = "epoch1").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(c.map(_._1).sorted.toSeq == a.map(_._1).sorted.toSeq)
    assert(c.toSet != a.toSet, "new seed must reshuffle")
    // and NOT the identity order on doc_id (it actually shuffles)
    assert(a.sortBy(_._2).map(_._1).toSeq != a.map(_._1).sorted.toSeq)
  }
}
