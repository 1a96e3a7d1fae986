package graft

import org.apache.spark.sql.functions._

import graft.operators.{Contamination, Curation, Dedup, TextAnalysis}

/** Round-4 training-data hygiene block: every operator is cross-checked
  * against an independent in-spec recomputation (brute force in local
  * Scala), not just shape-checked.
  */
class PipelineSpec extends GraftSuite {

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h >>> 4
  }

  private def toks(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)

  private def docTexts(): Map[Long, String] =
    graft.io.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("oovRate ppm matches a closed-form constructed corpus") {
    import spark.implicits._
    // en vocab = {alpha beta gamma}; doc 1 (de): 2 of 4 tokens OOV;
    // doc 2 (en): 0 OOV by construction; doc 3: fully OOV
    val docs = Seq(
      (0L, "alpha beta gamma", "en"),
      (1L, "alpha delta beta epsilon", "de"),
      (2L, "beta beta alpha", "en"),
      (3L, "zeta eta", "fr"))
      .map { case (id, t, l) => (id, t, l, "web", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft-oov").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.oovRate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      0L -> ((3L, 0L, 0L)),
      1L -> ((4L, 2L, 500000L)),
      2L -> ((3L, 0L, 0L)),
      3L -> ((2L, 2L, 1000000L))))
  }

  test("decontaminate matches a brute-force n-gram recomputation") {
    val texts = docTexts()
    def grams(t: String, n: Int): Set[String] =
      toks(t).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    val bench = texts.filter(_._1 % 50 == 0).values.flatMap(grams(_, 8)).toSet
    val expected = texts.collect {
      case (id, t) if id % 50 != 0 && grams(t, 8).nonEmpty =>
        val g = grams(t, 8)
        id -> ((g.size.toLong, g.count(bench.contains).toLong))
    }
    val got = Contamination.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // the flag derives from the count
    Contamination.decontaminate(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) > 0))
    }
  }

  test("decontaminateSemantic matches a brute-force nearest-benchmark scan") {
    import graft.operators.Contamination
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
    def nrm(e: Array[Double]) = math.sqrt(e.map(x => x * x).sum)
    val bench = vecs.filter(v => v._1 % 50 == 0 && v._1 < 5000)
    val corpus = vecs.filter(v => v._1 % 50 != 0 || v._1 >= 5000)
    val expected = corpus.map { case (id, e) =>
      val n1 = nrm(e)
      // best = max 4dp cosine, ties to the smallest bench id (the
      // operator's struct-max and the oracle's rk=1 window)
      val scored = bench.map { case (bid, be) =>
        val dot = e.zip(be).map { case (a, b) => a * b }.sum
        val c4 = BigDecimal(dot / (n1 * nrm(be)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (c4, bid)
      }
      val best = scored.maxBy { case (c, bid) => (c, -bid) }
      id -> ((best._2, best._1, best._1 >= 0.25))
    }.toMap
    val got = Contamination.decontaminateSemantic(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got == expected)
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "threshold must split the corpus (non-vacuous both ways)")
    // the benchmark cap must not open a verdict hole: with a tiny cap,
    // %every vectors BEYOND it are ordinary corpus members and get
    // verdicts like everyone else (r17 review — the naive %-complement
    // left them in neither set, invisible to the mirrored oracle)
    val capped = Contamination.decontaminateSemantic(spark, sf, benchCap = 2)
      .collect().map(_.getLong(0)).toSet
    val benchIds = vecs.filter(v => v._1 % 50 == 0 && v._1 < 100).map(_._1).toSet
    assert(capped == vecs.map(_._1).toSet -- benchIds,
      "every non-benchmark vector gets a verdict, including %every ids past the cap")
    assert(vecs.exists(v => v._1 % 50 == 0 && v._1 >= 100),
      "fixture must contain a beyond-cap %every vector")
  }

  test("benchmarkExposure matches a brute-force per-item recomputation (both modalities)") {
    // the transpose of the two checks above: one row per benchmark ITEM
    // with its verbatim leak counts and nearest corpus cosine
    val texts = docTexts()
    def grams(t: String): Set[String] =
      toks(t).sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    def isBench(id: Long) = id % 50 == 0 && id < 5000
    val corpusGrams = texts.collect {
      case (id, t) if !isBench(id) => id -> grams(t)
    }.toMap
    val ngramExp = texts.keys.filter(isBench).map { item =>
      val g = grams(texts(item))
      val docs = corpusGrams.count { case (_, cg) => g.exists(cg.contains) }
      val leaked = g.count(x => corpusGrams.values.exists(_.contains(x)))
      item -> ((docs.toLong, leaked.toLong))
    }.toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
    def nrm(e: Array[Double]) = math.sqrt(e.map(x => x * x).sum)
    val corpus = vecs.filter(v => !isBench(v._1))
    val semExp = vecs.filter(v => isBench(v._1)).map { case (item, be) =>
      val bn = nrm(be)
      val best = corpus.map { case (vid, e) =>
        val dot = e.zip(be).map { case (a, b) => a * b }.sum
        val c4 = BigDecimal(dot / (nrm(e) * bn))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (c4, vid)
      }.maxBy { case (c, vid) => (c, -vid) }
      item -> ((best._2, best._1))
    }.toMap
    val got = Contamination.benchmarkExposure(spark, sf).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    }.toMap
    val expected = (ngramExp.keySet ++ semExp.keySet).map { item =>
      val (d, g) = ngramExp(item) // doc/vec id spaces are row-aligned here
      val (nv, c4) = semExp(item)
      item -> ((d, g, nv, c4, d > 0 || c4 >= 0.25))
    }.toMap
    assert(got == expected)
    assert(got.values.exists(_._5) && got.values.exists(v => v._1 > 0),
      "non-vacuous: the synthetic corpus plants verbatim leaks")
  }

  test("repeatedSpans matches brute-force span counting (per-position, cross-doc)") {
    val texts = docTexts()
    val occ = scala.collection.mutable.Map.empty[Long, (Set[Long], Long)]
    texts.foreach { case (id, t) =>
      toks(t).sliding(6).filter(_.length == 6).foreach { g =>
        val h = hash60(g.mkString(" "))
        val (docs, tot) = occ.getOrElse(h, (Set.empty[Long], 0L))
        occ(h) = (docs + id, tot + 1)
      }
    }
    val expected = occ.collect { case (h, (docs, tot)) if docs.size >= 2 =>
      h -> ((docs.size.toLong, tot, docs.min))
    }.toMap
    val got = Contamination.repeatedSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "corpus has repeated spans (non-vacuous)")
  }

  test("packSequences: offsets are exact running sums; chunk ids consistent") {
    val rows = Curation.packSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // recompute per shard: sort by doc_id, running sum of n_tokens
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      var run = 0L
      shardRows.sortBy(_._1).foreach { case (_, _, n, offset, sf_, sl, inSeq) =>
        assert(offset == run, "offset is the sum of preceding docs' tokens")
        assert(sf_ == offset / 512 && sl == (offset + n - 1) / 512 && inSeq == offset % 512)
        run += n
      }
    }
    // sharding is total and deterministic
    val total = rows.map(_._3).sum
    val expectedTotal = docTexts().values.map(t => toks(t).length.toLong).sum
    assert(total == expectedTotal, "every token packed exactly once")
    assert(rows.exists(r => r._6 > r._5), "some doc spans a sequence boundary")
  }

  test("trainingBatches: curate→split→shuffle→pack chain, exact and distributed") {
    import org.apache.spark.sql.functions.col
    val out = Curation.trainingBatches(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // membership = curated keepers ∩ train split with tokens
    val kept = Curation.curatePipeline(spark, sf).where(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val train = Curation.hashSplit(spark, sf).where(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == (kept intersect train), "stage gating composes")
    // pos is a contiguous 0..n-1 permutation in seeded-hash order, and the
    // global offsets are the exact running token sums in that order
    val byPos = out.sortBy(_._2)
    assert(byPos.map(_._2).toSeq == (0L until out.length).toSeq)
    var run = 0L
    byPos.foreach { case (_, _, n, offset, sf_, sl, inSeq) =>
      assert(offset == run, "global offset is the sum of preceding docs' tokens")
      assert(sf_ == offset / 512 && sl == (offset + n - 1) / 512 && inSeq == offset % 512)
      run += n
    }
    // the epoch order really is the C47 permutation restricted to survivors
    val order = Curation.shuffleOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
      .map(_._1).filter(out.map(_._1).toSet)
    assert(byPos.map(_._1).toSeq == order.toSeq, "pack order == shuffle order")
    // scale pin: the composition adds ZERO Window nodes beyond the curate
    // stage's own (all partition-keyed) — in particular no global
    // row_number over the epoch order. Pinned on the PRE-checkpoint
    // chain: the composed frame itself is a LogicalRDD behind the
    // localCheckpoint boundary (vacuously window-free), and the stamping
    // passes after the boundary are plain RDD maps by construction.
    def windows(df: org.apache.spark.sql.DataFrame) = {
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      (p, "(?m)^\\s*\\+?-? ?Window ".r.findAllIn(p).size)
    }
    val (sortedPlan, sortedW) = windows(Curation.trainingBatchesSorted(spark, sf))
    val (_, curateW) = windows(Curation.curatePipeline(spark, sf))
    assert(sortedW == curateW,
      s"composition must not add windows (curate=$curateW, composed=$sortedW):\n$sortedPlan")
    assert(sortedPlan.contains("Exchange"), "sanity: the pin sees the real chain")
  }

  test("domainMix membership is the exact per-doc hash rule") {
    val meta = graft.io.Tables.documents(spark, sf).select("doc_id", "source", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def rate(source: String, lang: String): Long = {
      val base = 1000000L / (1 + source.drop(3).toLong % 4)
      if (lang == "en") base else base / 2
    }
    val expected = meta.collect {
      case (id, src, lang) if BigInt(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"mix:$id".getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
            .take(15), 16).toLong % 1000000 < rate(src, lang) =>
        id -> rate(src, lang)
    }.toMap
    val mix = Curation.domainMix(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(mix == expected)
    assert(mix.nonEmpty && mix.size < meta.length, "a strict non-empty subset")
  }

  test("piiRedact counts follow the closed-form augmentation and redaction removes all PII") {
    val rows = TextAnalysis.piiRedact(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id % 3 + 2, "emails: id%3+1 repeats + 1 fixed")
      assert(r.getLong(2) == id % 2 + 1, "ips: id%2 repeats + 1 fixed")
      assert(r.getLong(3) == 1L, "one phone")
    }
    // independently rebuild one doc's augmented text and redact with Java
    // regex; md5 must agree with the plan's output
    val texts = docTexts()
    val id = 7L
    val aug = texts(id) +
      (" u" + id + "@ex.org") * (id % 3 + 1).toInt +
      " contact user" + id + "@mail.example.com from 10." + (id % 200) + ".0." + (id % 250) +
      (" 192.168.0." + (id % 254 + 1)) * (id % 2).toInt +
      " call 555-" + "%04d".format(id % 10000)
    val red = aug
      .replaceAll("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+", "<EMAIL>")
      .replaceAll("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>")
      .replaceAll("[0-9]{3}-[0-9]{4}", "<PHONE>")
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(red.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = rows.find(_.getLong(0) == id).get.getString(4)
    assert(got == md5hex, "redacted content identical to local Java-regex redaction")
    assert(!red.contains("@") && !red.matches(".*[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}.*"),
      "no PII survives redaction")
  }

  test("scalarQuant codes are bounded and reconstruct within half a bucket") {
    val (mins, maxs) = graft.operators.Quantize.ranges(spark, sf)
    val codes = graft.operators.Quantize.scalarQuant(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2))).toSeq
    assert(codes.forall { case (_, _, c) => c >= 0 && c <= 255 })
    val orig = graft.operators.Ann.normed(spark, sf).select("vec_id", "e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    codes.foreach { case (id, d, c) =>
      val w = (maxs(d) - mins(d)) / 255.0
      val recon = mins(d) + (c + 0.5) * w
      assert(math.abs(orig(id)(d) - recon) <= w / 2 + 1e-9,
        s"vec $id dim $d: code $c reconstructs outside its bucket")
    }
    // every (vec, dim) coded exactly once
    assert(codes.map(t => (t._1, t._2)).distinct.size == orig.size * 64)
  }

  test("scalarQuant encodes a constant dimension as code 0, not NaN-cast") {
    import spark.implicits._
    val v = Seq((1L, Seq(0.5, 1.0)), (2L, Seq(0.5, 3.0))).toDF("vec_id", "e")
    val got = graft.operators.Quantize
      .encode(v, Array(0.5, 1.0), Array(0.5, 3.0)) // dim 0 constant
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 0L, 0L), (2L, 0L, 0L), (1L, 1L, 0L), (2L, 1L, 255L)))
  }

  test("nbClassify fails fast when the model exceeds the row cap") {
    val e = intercept[IllegalArgumentException](
      graft.operators.TextAnalysis.nbClassify(spark, sf, maxModelRows = 10).collect())
    assert(e.getMessage.contains("min-df"), e.getMessage)
    // generous cap still classifies every non-empty doc
    val rows = graft.operators.TextAnalysis.nbClassify(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getString(1).nonEmpty))
  }

  test("encode saturates out-of-range query vectors at both ends") {
    import spark.implicits._
    // dim 0: x below trained min → 0 (not negative); dim 1: x above max → 255
    val v = Seq((1L, Seq(-5.0, 99.0))).toDF("vec_id", "e")
    val got = graft.operators.Quantize
      .encode(v, Array(0.0, 0.0), Array(1.0, 1.0))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 0L), (1L, 255L)))
  }

  test("semDedup agrees with brute-force within-cell greedy filtering") {
    val v = graft.operators.Ann.normed(spark, sf)
      .select(col("vec_id"), col("e"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    // same corpus-derived cluster count as the operator (~1000-vector cells)
    val nc = math.min(65536, math.max(16, v.length / 1000))
    val cen = v.filter(_._1 < nc).map(_._2)
    def cid(e: Array[Double]): Int = {
      def dot(a: Array[Double], b: Array[Double]) = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }
        s
      }
      (0 until nc).minBy(c => (dot(e, e) - 2 * dot(e, cen(c)) + cen(c).map(x => x * x).sum, c))
    }
    val byCell = v.groupBy { case (_, e, _) => cid(e) }
    val expected = byCell.flatMap { case (c, vs) =>
      val sorted = vs.sortBy(_._1)
      sorted.indices.map { j =>
        val (idJ, eJ, nJ) = sorted(j)
        val dropped = (0 until j).exists { i =>
          val (_, eI, nI) = sorted(i)
          var s = 0.0; var d = 0
          while (d < eJ.length) { s += eI(d) * eJ(d); d += 1 }
          BigDecimal(s / (nI * nJ)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.4
        }
        idJ -> ((c.toLong, !dropped))
      }
    }
    val got = Dedup.semDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == expected)
    assert(got.values.exists(!_._2), "some vector dropped (non-vacuous)")
    assert(got.values.count(!_._2) < got.size, "not everything dropped")
  }
}
