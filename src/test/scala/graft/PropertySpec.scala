package graft

import scala.util.Random

import graft.functions.TextHash

/** Property tests (seeded random trials) for the deterministic kernels —
  * pure-JVM mirrors of the codegen expressions, checked against their
  * mathematical contracts.
  */
class PropertySpec extends GraftSuite {

  private val rnd = new Random(42)

  private def jaccard(a: Set[Long], b: Set[Long]): Double =
    if ((a ++ b).isEmpty) 0.0 else (a & b).size.toDouble / (a ++ b).size

  private def minhashSig(hs: Set[Long]): Seq[Long] =
    (0 until TextHash.K).map { i =>
      hs.map(h => (h % TextHash.P * TextHash.permA(i) + TextHash.permB(i)) % TextHash.P).min
    }

  test("minhash signature agreement tracks jaccard similarity (200 trials)") {
    (1 to 200).foreach { _ =>
      val base = Set.fill(rnd.nextInt(50) + 5)(rnd.nextLong(TextHash.P))
      val b = base.take(rnd.nextInt(base.size + 1)) ++
        Set.fill(rnd.nextInt(30))(rnd.nextLong(TextHash.P))
      if (b.nonEmpty) {
        val agree = minhashSig(base).zip(minhashSig(b)).count { case (x, y) => x == y }
        val jac = jaccard(base, b)
        if (jac == 1.0) assert(agree == TextHash.K)
        if (jac == 0.0 && base.size + b.size > 20)
          assert(agree < TextHash.K, "disjoint large sets must not fully agree")
      }
    }
    // statistical: signature agreement rate approximates jaccard
    val a = Set.fill(200)(rnd.nextLong(TextHash.P))
    val half = a.take(100) ++ Set.fill(100)(rnd.nextLong(TextHash.P))
    val agree = minhashSig(a).zip(minhashSig(half)).count { case (x, y) => x == y }
    val jac = jaccard(a, half)
    assert(math.abs(agree.toDouble / TextHash.K - jac) < 0.35) // K=32 → coarse
  }

  test("permutation constants are valid and distinct") {
    (0 until TextHash.K).foreach { i =>
      assert(TextHash.permA(i) > 0 && TextHash.permA(i) < TextHash.P)
      assert(TextHash.permB(i) >= 0 && TextHash.permB(i) < TextHash.P)
    }
    assert((0 until TextHash.K).map(TextHash.permA).distinct.size == TextHash.K)
  }

  test("sorted-merge jaccard equals set jaccard (500 trials)") {
    (1 to 500).foreach { _ =>
      val a = Set.fill(rnd.nextInt(60))(rnd.nextLong(500))
      val b = Set.fill(rnd.nextInt(60))(rnd.nextLong(500))
      val sa = a.toArray.sorted; val sb = b.toArray.sorted
      var i = 0; var j = 0; var c = 0
      while (i < sa.length && j < sb.length) {
        if (sa(i) == sb(j)) { c += 1; i += 1; j += 1 }
        else if (sa(i) < sb(j)) i += 1 else j += 1
      }
      val union = sa.length + sb.length - c
      val merge = if (union == 0) 0.0 else c.toDouble / union
      assert(math.abs(merge - jaccard(a, b)) < 1e-12)
    }
  }

  test("PqEncode matches a plain-Scala argmin on random vectors (codegen path)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val M = 8; val K = 16; val D = 8
    val cen = Array.fill(M * K * D)(rnd.nextDouble() - 0.5)
    val cc = Array.tabulate(M * K) { mk =>
      (0 until D).map(d => cen(mk * D + d)).map(x => x * x).sum
    }
    def reference(e: Array[Double]): Seq[Int] =
      (0 until M).map { m =>
        val s = e.slice(m * D, (m + 1) * D)
        val ss = s.map(x => x * x).sum
        (0 until K).minBy { k =>
          var sc = 0.0
          var d = 0
          while (d < D) { sc += s(d) * cen((m * K + k) * D + d); d += 1 }
          ss - 2.0 * sc + cc(m * K + k)
        }
      }
    val vecs = Seq.fill(50)(Array.fill(M * D)(rnd.nextDouble() * 2 - 1))
    val got = vecs.map(v => (v.toSeq, 0)).toDF("e", "z")
      .select(col("e"),
        graft.functions.VectorExpressions.pqEncode(col("e"), cen, cc, M, K, D).as("codes"))
      .collect()
      .map(r => r.getSeq[Double](0) -> r.getSeq[Int](1))
    got.foreach { case (e, codes) =>
      assert(codes == reference(e.toArray), s"codes diverge for $e")
      assert(codes.forall(c => c >= 0 && c < K))
    }
  }

  test("PqDtab + AdcSum match the composed subSqDist/element_at forms bit-exactly") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    val M = 8; val K = 16; val D = 8
    val cen = IndexedSeq.fill(M, K)(Seq.fill(D)(rnd.nextDouble() * 2 - 1))
    val cenFlat = (for { m <- 0 until M; k <- 0 until K; d <- 0 until D }
      yield cen(m)(k)(d)).toArray
    val ccFlat = (for { m <- 0 until M; k <- 0 until K }
      yield cen(m)(k).map(x => x * x).sum).toArray
    // the composed query-side forms the kernels replaced, re-built verbatim
    def subSq(e: Column, m: Int, c: Seq[Double]): Column = {
      val sub = slice(e, m * D + 1, D)
      graft.functions.VectorExpressions.dot(sub, sub) -
        lit(2.0) * graft.functions.VectorExpressions.dot(sub, typedlit(c)) +
        lit(c.map(x => x * x).sum)
    }
    val composedDtab = array((0 until M).map { m =>
      array((0 until K).map { kk =>
        floor(subSq(col("e"), m, cen(m)(kk)) * lit(1000000.0)).cast("long")
      }: _*)
    }: _*)
    val composedAdc = (0 until M).map { m =>
      element_at(element_at(col("dtab"), m + 1), element_at(col("codes"), m + 1) + 1)
    }.reduce(_ + _)
    val vecs = Seq.fill(50)(Seq.fill(M * D)(rnd.nextDouble() * 2 - 1))
    val rows = vecs.toDF("e")
      .select(col("e"),
        composedDtab.as("dtab"),
        graft.functions.VectorExpressions.pqDtab(col("e"), cenFlat, ccFlat, M, K, D)
          .as("fused"),
        graft.functions.VectorExpressions.pqEncode(col("e"), cenFlat, ccFlat, M, K, D)
          .as("codes"))
      .select(col("dtab"), col("fused"), col("codes"),
        composedAdc.as("adc_composed"),
        graft.functions.VectorExpressions.adcSum(col("dtab"), col("codes"))
          .as("adc_fused"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Seq[Long]](0) == r.getSeq[Seq[Long]](1),
        "fused dtab diverges from the composed subSqDist forest")
      assert(r.getLong(3) == r.getLong(4),
        "fused ADC sum diverges from the element_at chain")
    }
    // interpreted path too (CodegenFallback contexts / filter pushdown)
    val lit0 = graft.functions.PqDtab(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vecs.head, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      cenFlat, ccFlat, M, K, D)
    val interp = lit0.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until M).forall { m =>
      interp.getArray(m).toLongArray.toSeq == rows.head.getSeq[Seq[Long]](0)(m)
    }, "PqDtab interpreted path diverges from codegen/composed")
  }

  test("NearestCells matches the composed array_sort probe list, ties included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val C = 16; val D = 64; val nprobe = 4
    val cents = IndexedSeq.fill(C)(Seq.fill(D)(rnd.nextDouble() * 2 - 1))
    val flat = cents.flatten.toArray
    val sumsq = cents.map(_.map(x => x * x).sum).toArray
    def sqDist(e: org.apache.spark.sql.Column, c: Seq[Double]) =
      graft.functions.VectorExpressions.dot(e, e) -
        lit(2.0) * graft.functions.VectorExpressions.dot(e, typedlit(c)) +
        lit(c.map(x => x * x).sum)
    val composed = slice(array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      struct(sqDist(col("e"), c).as("d"), lit(i).as("cid"))
    }: _*)), 1, nprobe)
    // random vectors PLUS the centroids themselves (exact-zero distances)
    // and one duplicated centroid pair (a forced distance tie)
    val vecs = Seq.fill(40)(Seq.fill(D)(rnd.nextDouble() * 2 - 1)) ++
      cents.take(4).map(_.toSeq)
    val rows = vecs.toDF("e")
      .select(
        transform(composed, p => p.getField("cid")).as("want"),
        graft.functions.VectorExpressions
          .nearestCells(col("e"), flat, sumsq, D, nprobe).as("got"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"probe list diverges: want=${r.getSeq[Int](0)} got=${r.getSeq[Int](1)}")
    }
    // forced tie: two identical centroids — the lower cid must probe first
    val flat2 = (cents.take(15) :+ cents(0)).flatten.toArray
    val sumsq2 = (cents.take(15) :+ cents(0)).map(_.map(x => x * x).sum).toArray
    val tied = Seq(cents(0).toSeq).toDF("e")
      .select(graft.functions.VectorExpressions
        .nearestCells(col("e"), flat2, sumsq2, D, nprobe).as("got"))
      .head().getSeq[Int](0)
    assert(tied.head == 0 && tied.contains(15),
      s"tie must order (d, cid) lexicographically: $tied")
  }

  test("LshTableBuckets + MultiProbeBuckets match the composed dot/array_sort forms, ties included") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    val nPlanes = 4; val nTables = 8; val dim = 64
    // the real operator constants, plus a doctored matrix forcing |dot|
    // ties (planes 1 and 3 of every table identical)
    val realPlanes = graft.operators.Ann.planesArray(nPlanes, nTables)
    val tiedPlanes = realPlanes.clone()
    (0 until nTables).foreach { t =>
      val src = (t * nPlanes + 1) * dim; val dst = (t * nPlanes + 3) * dim
      System.arraycopy(tiedPlanes, src, tiedPlanes, dst, dim)
    }
    // random vectors + the all-zero vector (every dot exactly 0.0: sign
    // test false, all margins tied) + one short (32-dim) vector
    val vecs = Seq.fill(40)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1)) ++
      Seq(Seq.fill(dim)(0.0), Seq.fill(32)(rnd.nextDouble() * 2 - 1))
    for (planes <- Seq(realPlanes, tiedPlanes)) {
      def planeLit(t: Int, j: Int): Column =
        typedlit(planes.slice((t * nPlanes + j) * dim, (t * nPlanes + j + 1) * dim).toSeq)
      // composed single-probe form (the old tableBucketStructs), verbatim
      val composedBuckets = array((0 until nTables).map { t =>
        (0 until nPlanes).map { j =>
          val dot = graft.functions.VectorExpressions.dot(col("e"), planeLit(t, j))
          when(dot > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
      }: _*)
      // composed multi-probe form (the old planeDotCols + multiProbeStructs),
      // verbatim: dots materialized as columns before the probe structs
      val dotCols = for { t <- 0 until nTables; j <- 0 until nPlanes } yield
        graft.functions.VectorExpressions.dot(col("e"), planeLit(t, j)).as(s"d_${t}_$j")
      val masks = typedlit((0 until nPlanes).map(j => 1L << j))
      val probeStructs = (0 until nTables).flatMap { t =>
        val dots = (0 until nPlanes).map(j => col(s"d_${t}_$j"))
        val base = dots.zipWithIndex
          .map { case (d, j) => when(d > 0, lit(1L << j)).otherwise(lit(0L)) }
          .reduce(_ + _)
        val sortedM = array_sort(array(dots.zipWithIndex.map { case (d, j) =>
          struct(abs(d).as("m"), lit(j).as("j"))
        }: _*))
        val m1 = element_at(masks, sortedM.getItem(0).getField("j") + 1)
        val m2 = element_at(masks, sortedM.getItem(1).getField("j") + 1)
        Seq(base, base.bitwiseXOR(m1), base.bitwiseXOR(m2),
          base.bitwiseXOR(m1).bitwiseXOR(m2))
          .map(bk => struct(lit(t).as("tbl"), bk.as("bucket")))
      }
      val rows = vecs.toDF("e")
        .select(col("e") +: dotCols: _*)
        .select(
          composedBuckets.as("want_b"),
          graft.functions.VectorExpressions
            .lshTableBuckets(col("e"), planes, nPlanes, nTables).as("got_b"),
          array(probeStructs: _*).as("want_p"),
          graft.functions.VectorExpressions
            .multiProbeBuckets(col("e"), planes, nPlanes, nTables).as("got_p"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          "fused table buckets diverge from the composed dot forest")
        val want = r.getSeq[org.apache.spark.sql.Row](2).map(p => (p.getInt(0), p.getLong(1)))
        val got = r.getSeq[org.apache.spark.sql.Row](3).map(p => (p.getInt(0), p.getLong(1)))
        assert(want == got,
          s"fused multi-probe list diverges: want=$want got=$got")
      }
    }
  }

  private def unionFindLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.groupBy(find).values
      .flatMap(g => { val m = g.min; g.map(_ -> m) }).toMap
  }

  test("connectedComponents (star + propagate) equal union-find on random graphs (12 trials)") {
    import spark.implicits._
    (1 to 12).foreach { _ =>
      val n = rnd.nextInt(20) + 2
      val edges = Seq.fill(rnd.nextInt(25) + 1)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val expected = unionFindLabels(edges)
        val star = operators.Curation
          .connectedComponentsStar(edges.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(star == expected, s"star diverges, edges=$edges")
        val prop = operators.Curation
          .connectedComponentsPropagate(edges.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(prop == expected, s"propagate diverges, edges=$edges")
        // hybrid dispatch (propagate → star fallback with shortcut edges)
        val hyb = operators.Curation
          .connectedComponents(edges.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(hyb == expected, s"hybrid diverges, edges=$edges")
      }
    }
  }

  test("connectedComponentsStar handles an adversarial path graph in O(log n) rounds") {
    import spark.implicits._
    // a 64-node path needs 63 propagation rounds but only ~log₂(64) star
    // rounds — the default maxIter=60 would NOT suffice for propagation,
    // so passing here is evidence the star contraction actually kicks in
    val path = (0L until 63L).map(i => (i, i + 1))
    val expected = path.flatMap(e => Seq(e._1, e._2)).distinct.map(_ -> 0L).toMap
    val got = operators.Curation
      .connectedComponentsStar(path.reverse.toDF("a", "b"), "a", "b", maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("connectedComponentsStar emits exactly one row per node even when maxIter exhausts") {
    import spark.implicits._
    // stop far short of the fixed point: the label edge set may still hold
    // several (u, label) rows per node — output must stay one-row-per-id
    val path = (0L until 63L).map(i => (i, i + 1))
    val rows = operators.Curation
      .connectedComponentsStar(path.toDF("a", "b"), "a", "b", maxIter = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length == 64, s"expected 64 rows, got ${rows.length}")
    assert(rows.map(_._1).distinct.length == 64)
    // labels are still valid component members (all one component here)
    assert(rows.forall { case (id, lbl) => lbl >= 0 && lbl <= id })
  }

  // --- round-6: the two newest codegen kernels, interpreted vs codegen vs
  // plain Scala. SortedIntersectCount has a hand-written doGenCode (the
  // repo's highest-risk surface — PLANS.md records two past silent
  // de-codegen/parity traps), so both evaluation paths are exercised
  // explicitly: direct Expression.eval (interpreted) and a DataFrame
  // select (whole-stage codegen).

  test("SortedJaccard kernel == built-in intersect/union composition (200 trials)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq((Seq(1L), Seq(1L)), (Seq.empty[Long], Seq(1L))) ++
      Seq.fill(200)((Seq.fill(rnd.nextInt(30))(rnd.nextLong(60)).distinct.sorted,
        Seq.fill(rnd.nextInt(30))(rnd.nextLong(60)).distinct.sorted))
    val rows = cases.toDF("a", "b")
      .select(graft.functions.VectorExpressions.sortedJaccard(col("a"), col("b")).as("k"),
        graft.functions.TextHash.jaccard(col("a"), col("b")).as("c"))
      .collect()
    rows.foreach { r =>
      val k = r.getDouble(0)
      val c = if (r.isNullAt(1)) Double.NaN else r.getDouble(1) // 0/0 → null vs kernel's defined 0
      assert(k == c || (c.isNaN && k == 0.0), s"kernel $k vs composed $c")
    }
  }

  test("SortedGramInts == sorted-distinct PackedGrams4 under the sign-bit bijection") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_distinct, array_sort, col}
    // random Latin-1-ish strings incl. >255 chars (clamped to the sentinel),
    // plus the boundary lengths 0..4
    val texts = Seq("", "a", "abc", "abcd", "aaaaaa") ++
      Seq.fill(120)(Seq.fill(rnd.nextInt(60))(
        (rnd.nextInt(300) + 1).toChar).mkString)
    val rows = texts.toDF("text")
      .select(
        graft.functions.VectorExpressions.sortedGramInts(col("text")).as("gi"),
        array_sort(array_distinct(
          graft.functions.VectorExpressions.packedGrams4(col("text")))).as("gl"))
      .collect()
    rows.foreach { r =>
      val gi = r.getSeq[Int](0)
      val gl = r.getSeq[Long](1)
      // same length (same distinct set), same order, exact bijection
      assert(gi == gl.map(v => (v ^ 0x80000000L).toInt),
        s"int grams diverge: $gi vs $gl")
    }
  }

  test("PqEncodeCell: interpreted == codegen == offset PqEncode (100 trials)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val (c, m, k, dsub) = (4, 2, 3, 4)
    val dim = m * dsub
    // per-cell codebook slabs laid out [((cid·M + m)·K + k)·Dsub + d]
    val cen = Array.fill(c * m * k * dsub)(rnd.nextDouble() - 0.5)
    val cc = (0 until c * m * k).map { i =>
      (0 until dsub).map(d => { val x = cen(i * dsub + d); x * x }).sum
    }.toArray
    val cases = Seq.fill(100)(
      (Seq.fill(dim)(rnd.nextDouble() - 0.5), rnd.nextInt(c)))
    // reference: plain PqEncode over the manually-selected slab
    def slab(cid: Int, arr: Array[Double], per: Int) =
      arr.slice(cid * per, (cid + 1) * per)
    val expected = cases.map { case (e, cid) =>
      val df = Seq(e).toDF("e").select(graft.functions.VectorExpressions
        .pqEncode(col("e"), slab(cid, cen, m * k * dsub), slab(cid, cc, m * k),
          m, k, dsub).as("codes"))
      df.collect().head.getSeq[Int](0).toSeq
    }
    // codegen path: non-literal columns through a DataFrame
    val got = cases.toDF("e", "cid")
      .select(col("e"), col("cid"), graft.functions.VectorExpressions
        .pqEncodeCell(col("e"), col("cid"), cen, cc, m, k, dsub).as("codes"))
      .collect().map(r => (r.getSeq[Double](0).toSeq, r.getSeq[Int](2).toSeq))
      .toMap
    cases.zip(expected).foreach { case ((e, _), exp) =>
      assert(got(e) == exp, s"codegen diverges from offset PqEncode on cid slab")
    }
    // interpreted path: direct eval on Literal children
    cases.zip(expected).foreach { case ((e, cid), exp) =>
      val lit = graft.functions.PqEncodeCell(
        Literal.create(e, ArrayType(DoubleType, containsNull = false)),
        Literal.create(cid, IntegerType), cen, cc, m, k, dsub)
      val out = lit.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      assert(out.toIntArray().toSeq == exp, s"interpreted diverges on cid=$cid")
    }
  }

  private def intersectInterpreted(a: Seq[Long], b: Seq[Long]): Long = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    graft.functions.SortedIntersectCount(
      Literal.create(a, ArrayType(LongType)),
      Literal.create(b, ArrayType(LongType))).eval(null).asInstanceOf[Long]
  }

  test("SortedIntersectCount: interpreted == codegen == set intersection (300 trials)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq((Seq.empty[Long], Seq.empty[Long]),
        (Seq.empty[Long], Seq(1L, 2L)), (Seq(5L), Seq(5L))) ++
      Seq.fill(300)((Seq.fill(rnd.nextInt(40))(rnd.nextLong(200)).distinct.sorted,
        Seq.fill(rnd.nextInt(40))(rnd.nextLong(200)).distinct.sorted))
    val expected = cases.map { case (a, b) => (a.toSet & b.toSet).size.toLong }
    // codegen path (DataFrame select over non-literal columns)
    val got = cases.toDF("a", "b")
      .select(graft.functions.VectorExpressions
        .sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
    // interpreted path (direct eval on Literal children)
    cases.zip(expected).foreach { case ((a, b), e) =>
      assert(intersectInterpreted(a, b) == e, s"interpreted diverges on ($a, $b)")
    }
  }

  test("SortedIntersectCount on sorted multisets counts min-multiplicity matches") {
    // contract when duplicates survive (callers sort-distinct, but the
    // kernel's merge walk has defined multiset semantics — pin them)
    def ref(a: Seq[Long], b: Seq[Long]): Long =
      (a.toSet ++ b.toSet).toSeq
        .map(v => math.min(a.count(_ == v), b.count(_ == v)).toLong).sum
    (1 to 100).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextLong(10)).sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextLong(10)).sorted
      assert(intersectInterpreted(a, b) == ref(a, b), s"multiset diverges on ($a, $b)")
    }
  }

  test("MaxTokenFreq matches a plain-Scala max-frequency (200 trials, non-ASCII)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val alphabet = Vector("the", "a", "naïve", "日本語", "café", "x", "", "zz")
    val cases = Seq(Seq.empty[String], Seq("solo"), Seq("d", "d", "d")) ++
      Seq.fill(200)(Seq.fill(rnd.nextInt(50))(alphabet(rnd.nextInt(alphabet.size))))
    val expected = cases.map(ts =>
      if (ts.isEmpty) 0L else ts.groupBy(identity).values.map(_.size).max.toLong)
    val got = cases.toDF("toks")
      .select(graft.functions.VectorExpressions.maxTokenFreq(col("toks")).as("f"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("rolling hash: prefix property and range") {
    (1 to 100).foreach { _ =>
      val s = Random.alphanumeric.take(rnd.nextInt(80) + 1).mkString.toLowerCase
      val h = s.foldLeft(7L)((acc, c) => (acc * 31 + c.toLong) % TextHash.P)
      assert(h >= 0 && h < TextHash.P)
      // appending a char changes the hash deterministically
      val h2 = (h * 31 + 'x'.toLong) % TextHash.P
      val direct = (s + "x").foldLeft(7L)((acc, c) => (acc * 31 + c.toLong) % TextHash.P)
      assert(h2 == direct)
    }
  }

  test("NearestCell == NearestCid + the winner's distance, bit-exact (100 vectors)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val C = 16; val D = 8
    val cen = Array.fill(C * D)(rnd.nextDouble() - 0.5)
    val sumsq = Array.tabulate(C)(c =>
      (0 until D).map(d => cen(c * D + d)).map(x => x * x).sum)
    val vecs = Seq.fill(100)(Seq.fill(D)(rnd.nextDouble() * 2 - 1))
    val got = vecs.map(v => (v, 0)).toDF("e", "z")
      .select(
        graft.functions.VectorExpressions.nearestCid(col("e"), cen, sumsq, D).as("cid"),
        graft.functions.VectorExpressions.nearestCell(col("e"), cen, sumsq, D).as("nc"),
        col("e"))
      .select(col("cid"), col("nc.cid"), col("nc.dist"), col("e"))
      .collect()
    got.foreach { r =>
      val e = r.getSeq[Double](3).toArray
      val ee = e.map(x => x * x).sum
      val dists = (0 until C).map { c =>
        var dc = 0.0; var d = 0
        while (d < D) { dc += e(d) * cen(c * D + d); d += 1 }
        ee - 2.0 * dc + sumsq(c)
      }
      var best = Double.PositiveInfinity; var bestC = 0
      for (c <- 0 until C) if (dists(c) < best) { best = dists(c); bestC = c }
      assert(r.getInt(0) == r.getInt(1), "cell kernel must agree with the cid kernel")
      assert(r.getInt(0) == bestC)
      assert(r.getDouble(2) == best, "distance must be bit-identical to the reference order")
    }
  }

  /** Plain-Scala twin of [[operators.TextAnalysis.lmScore]]: bigram MLE in
    * integer ppm, per-occurrence floor mean (all counts positive, so Scala
    * `/` is the same floor division as Spark's `div`).
    */
  private def lmRef(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val occ = docs.flatMap { case (id, text) =>
      val t = text.split(" ").filter(_.nonEmpty).toSeq
      if (t.size < 2) Seq.empty
      else t.sliding(2).map(p => (id, p(0), p(1))).toSeq
    }
    val c12 = occ.groupBy(o => (o._2, o._3)).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    occ.groupBy(_._1).map { case (id, os) =>
      val ps = os.map(o => c12((o._2, o._3)) * 1000000L / c1(o._2))
      id -> ((os.size.toLong, ps.sum / os.size))
    }
  }

  test("lmScore equals the plain-Scala bigram-MLE reference on random corpora (5 trials)") {
    import spark.implicits._
    val vocab = Array("a", "b", "c", "d", "e")
    (1 to 5).foreach { _ =>
      val docs = (0 until (rnd.nextInt(10) + 3)).map { i =>
        val n = rnd.nextInt(8) // 0..7 tokens: includes <2-token docs
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-lmprop").toString
      docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = operators.TextAnalysis.lmScore(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == lmRef(docs), s"lmScore diverges on $docs")
    }
  }

  /** Plain-Scala twin of [[operators.Curation.dsirWeight]]: hashed-bigram
    * bucket counts, add-1-smoothed target/raw ratio ppm, per-occurrence
    * floor mean. Uses the same md5-prefix hash60 as the kernel.
    */
  private def dsirRef(docs: Seq[(Long, String, String)], buckets: Long): Map[Long, (Long, Long)] = {
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h >>> 4
    }
    val occ = docs.flatMap { case (id, text, lang) =>
      val t = text.split(" ").filter(_.nonEmpty).toSeq
      if (t.size < 2) Seq.empty
      else t.sliding(2).map(p => (id, lang, hash60(p(0) + " " + p(1)) % buckets)).toSeq
    }
    val model = occ.groupBy(_._3).map { case (b, os) =>
      b -> ((os.count(_._2 == "en") + 1L) * 1000000L / (os.size + 1L))
    }
    occ.groupBy(_._1).map { case (id, os) =>
      id -> ((os.size.toLong, os.map(o => model(o._3)).sum / os.size))
    }
  }

  test("dsirWeight equals the plain-Scala hashed-ratio reference on random corpora (5 trials)") {
    import spark.implicits._
    val vocab = Array("a", "b", "c", "d", "e")
    val langs = Array("en", "fr", "de")
    (1 to 5).foreach { _ =>
      val docs = (0 until (rnd.nextInt(10) + 3)).map { i =>
        val n = rnd.nextInt(8)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "),
          langs(rnd.nextInt(langs.length)))
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-dsirprop").toString
      docs.map { case (id, t, l) => (id, t, l, "web", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = operators.Curation.dsirWeight(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == dsirRef(docs, 4096L), s"dsirWeight diverges on $docs")
    }
  }

  test("entityResolve at maxDist=0 degenerates to exact-name min-id resolution") {
    val got = operators.Fuzzy.entityResolve(spark, sf, maxDist = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_name", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val minByName = parts.groupBy(t => (t._2, t._3))
      .map { case (key, rows) => key -> rows.map(_._1).min }
    got.foreach { case (k, canon, dist) =>
      val (_, nm, b) = parts.find(_._1 == k).get
      val m = minByName((nm, b))
      if (k > m) assert(canon == m && dist == 0, s"$k should resolve to $m")
      else assert(canon == k && dist == -1, s"cluster min $k resolves to itself")
    }
  }

  test("kAnonymize: level-0 membership shrinks as k grows; the >=k property holds at every k") {
    // NOTE the full ladder position is NOT monotone in k — a suppressed
    // record can resurface at level 1 under a larger k because the coarse
    // census counts RESIDUE rows and the residue grows with k. What is
    // invariant: fine-band release (cnt1 >= k) is monotone, the row
    // partition is exact, and every released group covers >= k records.
    def run(k: Int) = operators.Privacy.kAnonymize(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    val byK = Seq(2, 5, 20).map(k => k -> run(k)).toMap
    val keySets = byK.view.mapValues(_.map(_._1).toSet).toMap
    assert(keySets(2) == keySets(5) && keySets(5) == keySets(20))
    def level0(k: Int) = byK(k).filter(_._6 == 0).map(_._1).toSet
    assert(level0(20).subsetOf(level0(5)) && level0(5).subsetOf(level0(2)))
    byK.foreach { case (k, rows) =>
      rows.filter(_._6 < 2).groupBy(t => (t._2, t._3, t._4, t._5)).foreach {
        case (g, rs) => assert(rs.length >= k, s"k=$k group $g has ${rs.length}")
      }
    }
  }

  test("mergeUpsert partitions users exactly: output ∪ tombstoned = all active users") {
    import org.apache.spark.sql.functions._
    val ev = graft.io.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val mid = (ev.map(_._4).min + ev.map(_._4).max) / 2
    val tombstoned = ev.filter(_._4 >= mid).groupBy(_._1)
      .filter { case (_, rows) => rows.maxBy(r => (r._4, r._3))._2 == "error" }
      .keySet
    val out = operators.Events.mergeUpsert(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(out.intersect(tombstoned).isEmpty, "tombstoned users must vanish")
    assert(out ++ tombstoned == ev.map(_._1).toSet, "every user accounted for")
  }

  /** Plain-Scala mirror of [[graft.functions.InterleaveBits.eval]] — the
    * z-code contract checked against its mathematical properties rather
    * than the expression's own arithmetic.
    */
  private def zRef(codes: Seq[Long], bits: Int): Long = {
    val k = codes.length
    var z = 0L
    for (j <- 0 until k; i <- 0 until bits)
      z |= ((((codes(j) & 0xffffL) >> (16 - bits)) >> i) & 1L) << (i * k + (k - 1 - j))
    z
  }

  test("InterleaveBits: per-dim monotone with others fixed, sign-safe, k=2 == Interleave16 (300 trials)") {
    import org.apache.spark.sql.functions.col
    import graft.functions.VectorExpressions
    for (_ <- 1 to 300) {
      val k = 2 + rnd.nextInt(3)
      val bits = math.min(16, 63 / k)
      val codes = Seq.fill(k)(rnd.nextLong(65536))
      val z = zRef(codes, bits)
      // never touches the sign bit — a negative code would invert the
      // range-partition order and scatter the curve
      assert(z >= 0L, s"sign-safe: $codes -> $z")
      // raising ONE dimension's (post-shift) code with the others fixed
      // never lowers the z-code: per-dim order is what footer min/max
      // skipping relies on
      val j = rnd.nextInt(k)
      val bumped = codes.updated(j, math.min(65535L, codes(j) + (1L << (16 - bits))))
      assert(zRef(bumped, bits) >= z, s"monotone in dim $j: $codes")
      // dim 0 outranks lower dims at equal shift — the documented bit layout
      if (k == 2)
        assert(zRef(Seq(codes.head, 0L), 16) >= zRef(Seq(0L, codes.head), 16))
    }
    // the Catalyst expression agrees with the mirror (interpreted eval)
    import spark.implicits._
    val rows = Seq.fill(64)((rnd.nextLong(65536), rnd.nextLong(65536), rnd.nextLong(65536)))
    val got = rows.toDF("a", "b", "c")
      .select(VectorExpressions.interleaveBits(Seq(col("a"), col("b"), col("c")), 16).as("z"))
      .as[Long].collect()
    rows.zip(got).foreach { case ((a, b, c), z) =>
      assert(z == zRef(Seq(a, b, c), 16), s"expr vs mirror at ($a,$b,$c)")
    }
  }
}
