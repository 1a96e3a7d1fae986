package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** Dev probe for the r20 WhitespaceTokens kernel: times the composed
  * `filter(split(text, " "), _ =!= "")` HOF pair against the fused byte
  * scan over the SAME data in ONE JVM, variants INTERLEAVED round-robin
  * (best-of-N each) so ambient host swings can't masquerade as a
  * difference — the cross-binary sf1 A/B windows of this box swing ±60 %
  * on plan-identical queries. Two shapes per variant: the bare narrow
  * scan (token array materialized to noop) and the explode+count shape
  * most consumers reduce to.
  * Run: sbt "Test/runMain graft.TokensProbe [sfDir] [reps]".
  */
object TokensProbe {
  import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
  import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

  /** The REJECTED fused tokenizer, kept here (test scope only) so the
    * rejection evidence stays reproducible: maximal runs of non-0x20
    * bytes, byte-identical to the HOF pair (0x20 never occurs inside a
    * UTF-8 multibyte sequence).
    */
  case class WhitespaceTokens(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override protected def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      val n = bytes.length
      val out = new scala.collection.mutable.ArrayBuffer[Any](8)
      var i = 0
      while (i < n) {
        while (i < n && bytes(i) == ' ') i += 1
        val start = i
        while (i < n && bytes(i) != ' ') i += 1
        if (i > start)
          out += org.apache.spark.unsafe.types.UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, start, i))
      }
      new GenericArrayData(out.toArray)
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.io.Tables.documents(spark, dir).select(col("text"))
    def hof(c: Column): Column = filter(split(c, " "), t => t =!= lit(""))
    def ker(c: Column): Column =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        WhitespaceTokens(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

    val variants: Seq[(String, () => Unit)] = Seq(
      "scan_hof" -> (() => docs.select(hof(col("text")).as("toks"))
        .write.format("noop").mode("overwrite").save()),
      "scan_kernel" -> (() => docs.select(ker(col("text")).as("toks"))
        .write.format("noop").mode("overwrite").save()),
      "explode_hof" -> (() => docs.select(explode(hof(col("text"))).as("w"))
        .groupBy(col("w")).count()
        .write.format("noop").mode("overwrite").save()),
      "explode_kernel" -> (() => docs.select(explode(ker(col("text"))).as("w"))
        .groupBy(col("w")).count()
        .write.format("noop").mode("overwrite").save()))

    val best = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    for (r <- 1 to reps; (name, fn) <- variants) {
      val t0 = System.nanoTime()
      fn()
      val s = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best(name), s)
      println(f"[tokensprobe] rep $r $name%-15s $s%.3f s")
    }
    println(variants.map { case (n, _) => f""""$n":${best(n)}%.3f""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
