package graft

/** Dev probe (Test scope, not shipped): time the ngramJaccard in-group
  * pair kernels in isolation — one synthetic group shaped like an sf10
  * cross-band block (n docs, ~165 grams each from a 985-gram universe) —
  * to separate kernel cost from Spark-side shuffle/deser/utilization.
  * Run: sbt "Test/runMain graft.BitsetKernelProbe [nDocs]"
  */
object BitsetKernelProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 3650
    val uni = 985
    val avg = 165
    val rnd = new java.util.Random(7)
    val docs = Array.tabulate(n) { i =>
      val s = scala.collection.mutable.SortedSet.empty[Int]
      while (s.size < avg) s += rnd.nextInt(uni)
      (i % 16, i.toLong, s.toArray)
    }
    val t = 0.35
    val tEmit = t - 1e-6
    def cminOf(sumLen: Int): Int =
      math.ceil(tEmit * sumLen / (1.0 + tEmit) - 1e-9).toInt
    def jacAtLeast(a: Array[Int], b: Array[Int], cmin: Int): Double = {
      var x = 0; var y = 0; var c = 0
      while (x < a.length && y < b.length) {
        if (a(x) == b(y)) { c += 1; x += 1; y += 1 }
        else {
          if (a(x) < b(y)) x += 1 else y += 1
          val rem = math.min(a.length - x, b.length - y)
          if (c + rem < cmin) return -1.0
        }
      }
      val union = a.length + b.length - c
      if (union == 0) 0.0 else c.toDouble / union
    }
    val pairs = n.toLong * (n - 1) / 2
    for (round <- 1 to 3) {
      // walk kernel
      var t0 = System.nanoTime()
      var emitted = 0L
      var i = 0
      while (i < n - 1) {
        val gi = docs(i)._3
        var j = i + 1
        while (j < n) {
          val jc = jacAtLeast(gi, docs(j)._3, cminOf(gi.length + docs(j)._3.length))
          if (jc >= tEmit) emitted += 1
          j += 1
        }
        i += 1
      }
      val walkNs = (System.nanoTime() - t0).toDouble / pairs
      // bitset kernel
      t0 = System.nanoTime()
      val stride = (uni + 63) >>> 6
      val bits = new Array[Long](n * stride)
      i = 0
      while (i < n) {
        val gs = docs(i)._3; val off = i * stride; var k2 = 0
        while (k2 < gs.length) {
          bits(off + (gs(k2) >>> 6)) |= 1L << (gs(k2) & 63); k2 += 1
        }
        i += 1
      }
      var emitted2 = 0L
      i = 0
      while (i < n - 1) {
        val ni = docs(i)._3.length; val oi = i * stride
        var j = i + 1
        while (j < n) {
          val oj = j * stride
          var w = 0; var c = 0
          while (w < stride) {
            c += java.lang.Long.bitCount(bits(oi + w) & bits(oj + w)); w += 1
          }
          val union = ni + docs(j)._3.length - c
          if (union > 0 && c.toDouble / union >= tEmit) emitted2 += 1
          j += 1
        }
        i += 1
      }
      val bitNs = (System.nanoTime() - t0).toDouble / pairs
      println(f"[kernel] round $round n=$n pairs=$pairs walk=${walkNs}%.1f ns/pair bitset=${bitNs}%.1f ns/pair (emitted $emitted/$emitted2)")
    }
  }
}
