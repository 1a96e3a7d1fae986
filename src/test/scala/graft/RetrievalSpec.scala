package graft

import org.apache.spark.sql.functions._

import graft.operators.{Events, Relational, Retrieval}

/** Behavioral checks for the retrieval block (C40/C41) and the SCD2 build —
  * cross-operator consistency and ordering invariants the oracle's hash
  * can't articulate when it fails.
  */
class RetrievalSpec extends GraftSuite {

  test("inverted index: cf agrees with q_wordcount and champion lists are bounded+ordered") {
    val idx = Retrieval.invertedIndex(spark, sf).cache()
    val wc = Relational.wordCount(spark, sf)
      .withColumnRenamed("word", "w").withColumnRenamed("cnt", "cnt")
    // corpus frequency must equal the independent wordcount aggregation
    val mismatched = idx.join(wc, idx("word") === wc("w"))
      .where(col("cf") =!= col("cnt")).count()
    assert(mismatched == 0, "cf must equal the wordcount of the same token")
    assert(idx.join(wc, idx("word") === wc("w"), "left_anti").count() == 0)
    val bad = idx.select(col("word"), col("df"), split(col("postings"), ",").as("ps"))
      .where(size(col("ps")) =!= least(col("df"), lit(8))).count()
    assert(bad == 0, "postings must hold min(df, champions) entries")
    // champion tf values are non-increasing along each postings list
    val tfs = idx.select(transform(split(col("postings"), ","),
      p => split(p, ":").getItem(1).cast("long")).as("tfs"))
    val unsorted = tfs.where(expr(
      "exists(sequence(0, size(tfs) - 2), i -> tfs[i] < tfs[i + 1])")).count()
    assert(unsorted == 0, "postings must be impact-ordered (tf desc)")
    idx.unpersist()
  }

  test("inverted index under Zipf skew: a stopword in EVERY doc never lands df rows on one task") {
    // 8000 docs, each containing the stopword "the"; 10 also carry a unique
    // word. The r10 window form shipped all 8000 "the" rows into ONE task's
    // window partition; the agg+group-limit form bounds every task well
    // below df (tf exchange ≈ df/P uniform, champion exchange ≤ 8×tasks).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skewdocs").toString
    (0L until 8000L).map(i => (i, if (i < 10) s"the w$i" else "the"))
      .toDF("doc_id", "text")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    @volatile var maxTaskRead = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null)
          maxTaskRead = math.max(maxTaskRead, m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // AQE coalescing merges the tiny test-sized shuffle partitions into one
    // task and would mask WHERE the hash placed the rows — disable it here
    // so the per-task metric reflects the real partitioning
    val coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val rows = try {
      val r = Retrieval.invertedIndex(spark, dir).collect()
      // listener events deliver async: poll until the metric is stable
      var last = -1L
      var spins = 0
      while (maxTaskRead != last && spins < 40) {
        last = maxTaskRead; spins += 1; Thread.sleep(250)
      }
      r
    } finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
      spark.sparkContext.removeSparkListener(listener)
    }
    val the = rows.find(_.getString(0) == "the").get
    assert(the.getLong(1) == 8000L && the.getLong(2) == 8000L, "df=cf=8000 for the stopword")
    assert(the.getString(3) == (0 until 8).map(i => s"$i:1").mkString(","),
      "champions = 8 lowest doc_ids at tf=1")
    val w5 = rows.find(_.getString(0) == "w5").get
    assert(w5.getLong(1) == 1L && w5.getLong(2) == 1L && w5.getString(3) == "5:1")
    // the bounded-behavior pin: no task ever reads even HALF the stopword's
    // df from a shuffle (the r10 form necessarily read all 8000 on one task)
    assert(maxTaskRead > 0, "listener saw no shuffle reads — metric plumbing broke")
    assert(maxTaskRead < 4000, s"a task read $maxTaskRead shuffle records — df-sized skew partition is back")
  }

  test("bm25: top-k is score-ordered and every hit contains a query term") {
    val terms = Seq("join", "scan", "window", "vector")
    val hits = Retrieval.bm25(spark, sf, terms, k = 20).collect()
    assert(hits.nonEmpty && hits.length <= 20)
    val scores = hits.map(_.getAs[Long]("score_ppm"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "score desc")
    assert(hits.forall(r => r.getAs[Long]("n_terms") >= 1 && r.getAs[Long]("n_terms") <= terms.length))
    assert(scores.forall(_ > 0), "ratio idf and saturation are positive")
    // every returned doc really contains at least one query term
    val ids = hits.map(_.getAs[Long]("doc_id")).toSeq
    val without = graft.io.Tables.documents(spark, sf)
      .where(col("doc_id").isin(ids: _*))
      .where(!terms.map(t => col("text").contains(t)).reduce(_ || _))
      .count()
    assert(without == 0, "a hit must contain a query term")
  }

  test("text knn: per-probe lists are jaccard-ordered and never include the probe") {
    val knn = Retrieval.textKnn(spark, sf).collect()
    assert(knn.nonEmpty)
    assert(knn.forall(r => r.getAs[Long]("probe_id") != r.getAs[Long]("doc_id")))
    assert(knn.forall { r =>
      val j = r.getAs[Double]("jac"); j >= 0.0 && j <= 1.0
    })
    knn.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rows) =>
      val byRk = rows.sortBy(_.getAs[Int]("rk"))
      assert(byRk.length <= 3)
      val jacs = byRk.map(_.getAs[Double]("jac"))
      assert(jacs.zip(jacs.tail).forall { case (a, b) => a >= b }, "jac desc by rk")
    }
  }

  test("rank fusion: rrf decomposes into the two head contributions") {
    val fused = Retrieval.rankFusion(spark, sf).collect()
    assert(fused.nonEmpty)
    def contrib(rk: Int): Long = if (rk == -1) 0L else 1000000L / (60 + rk)
    assert(fused.forall { r =>
      r.getAs[Long]("rrf_ppm") ==
        contrib(r.getAs[Int]("bm25_rk")) + contrib(r.getAs[Int]("ann_rk"))
    }, "rrf_ppm must be the exact sum of the per-system reciprocal ranks")
    // a row must come from at least one system, and fused_rk follows rrf desc
    assert(fused.forall(r => r.getAs[Int]("bm25_rk") != -1 || r.getAs[Int]("ann_rk") != -1))
    val byFused = fused.sortBy(_.getAs[Int]("fused_rk"))
    val scores = byFused.map(_.getAs[Long]("rrf_ppm"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "fused order")
  }

  test("scd2: intervals tile each user's changelog with one open version") {
    val dim = Events.scd2(spark, sf).cache()
    val events = graft.io.Tables.events(spark, sf)
    assert(dim.count() == events.count(), "one version per changelog row")
    val users = events.select(col("user_id")).distinct().count()
    assert(dim.where(col("is_current") === 1).count() == users,
      "exactly one open interval per user")
    assert(dim.where(col("is_current") === 1 && col("valid_to_ms") =!= -1L).count() == 0)
    // closed intervals: valid_from <= valid_to, and versions chain —
    // version v's valid_to equals version v+1's valid_from
    assert(dim.where(col("valid_to_ms") =!= -1L &&
      col("valid_from_ms") > col("valid_to_ms")).count() == 0)
    val next = dim.select(col("user_id"), (col("version") + 1).as("version"),
      col("valid_to_ms").as("next_from"))
    val broken = dim.join(next, Seq("user_id", "version"))
      .where(col("valid_from_ms") =!= col("next_from")).count()
    assert(broken == 0, "interval chain must tile without gaps")
    dim.unpersist()
  }
}
