package graft.functions

import graft.SparkSpec
import graft.functions.VectorExpressions.{doubleDot, longDot}
import org.apache.spark.sql.functions._

/** Value-identity guard for the native dot-product expressions: the DuckDB
  * hash gate depends on [[LongArrayDot]]/[[DoubleArrayDot]] producing
  * EXACTLY the numbers the element_at chains / HOF folds they replaced
  * produced. Any future edit to compute() that reorders additions or
  * changes widening breaks q32/q35/q39/q50/q81/q82's hashes — this spec
  * catches it before the gate does, on adversarial inputs (values whose
  * addition order matters in fp, long values near the bound). */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  test("LongArrayDot == unrolled element_at integer chain (exact, order-free)") {
    val rnd = new scala.util.Random(7)
    // values up to the 2^24 scoring grid, mixed signs
    val rows = Seq.fill(200)((
      Seq.fill(dim)(rnd.nextLong() % (1L << 24)),
      Seq.fill(dim)(rnd.nextLong() % (1L << 24))))
    val df = rows.toDF("a", "b")
    val chain = (1 to dim).map(i => element_at(col("a"), i) * element_at(col("b"), i))
      .reduce(_ + _)
    val diff = df.select(longDot(col("a"), col("b")).as("nat"), chain.as("old"))
      .filter(col("nat") =!= col("old")).count()
    assert(diff === 0L)
  }

  test("DoubleArrayDot == element_at cast-chain AND HOF fold, bit-for-bit") {
    val rnd = new scala.util.Random(11)
    // adversarial magnitudes: catastrophic-cancellation-prone mixes where
    // any reassociation changes the double result
    val rows = Seq.fill(200)((
      Seq.fill(dim)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(8)).toFloat).map(_.toFloat),
      Seq.fill(dim)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(8)).toFloat).map(_.toFloat)))
    val df = rows.toDF("a", "b")
    val chain = (1 to dim).map(i =>
      element_at(col("a"), i).cast("double") * element_at(col("b"), i).cast("double"))
      .reduce(_ + _)
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, t) => acc + t)
    // compare RAW BITS — 0.0 == -0.0 and NaN semantics must not hide drift
    val out = df.select(
      doubleDot(col("a"), col("b")).as("nat"), chain.as("old"), hof.as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "native vs chain")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), "native vs HOF")
    }
  }

  test("double arrays and mixed float/double sides work; nulls propagate") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(0.5, 0.25))),
      (None, Some(Seq(1.0, 1.0)))).toDF("f", "d")
    val out = df.select(doubleDot(col("f"), col("d")).as("v")).collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(1).isNullAt(0), "null array → null result")
    // long nulls too
    val lf = Seq((Some(Seq(2L, 3L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(lf.select(longDot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("type checking rejects mismatched inputs loudly") {
    val df = Seq((Seq(1L, 2L), Seq(1.0, 2.0))).toDF("l", "d")
    intercept[Exception](df.select(longDot(col("l"), col("d"))).collect())
    intercept[Exception](df.select(doubleDot(col("l"), col("l"))).collect())
  }
}
