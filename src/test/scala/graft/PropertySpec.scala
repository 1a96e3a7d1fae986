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
}
