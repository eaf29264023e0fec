package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test for [[BucketedOps.vacuumChangelog]]'s contract: for ANY
  * changelog script (inserts, before/after update pairs, deletes with
  * re-inserts) and ANY horizon,
  *
  *  - materializing the vacuumed changelog equals materializing the full
  *    one (the final state is untouched);
  *  - time travel to any offset ≥ horizon is also unchanged (the vacuumed
  *    log filtered to `op_offset <= o` materializes identically);
  *  - the only pre-horizon rows that survive are `op='r'` snapshot rows
  *    (history older than the horizon is really gone).
  *
  * The script generator maintains the live-state invariant a real CDC
  * stream has (updates/deletes only on live keys, delete carries the
  * before image, update emits -U then +U at one offset) — the same
  * envelope conventions the q23–q26 fixtures use. */
class VacuumChangelogPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("price", DoubleType),
    StructField("st", StringType), StructField("op", StringType),
    StructField("op_offset", LongType), StructField("row_kind", StringType)))

  private case class Ev(k: Long, price: Double, st: String, op: String,
      off: Long, rk: String)

  private val genScript: Gen[List[Ev]] = {
    def step(live: Map[Long, (Double, String)], off: Long, left: Int,
        acc: List[Ev]): Gen[List[Ev]] =
      if (left == 0) Gen.const(acc.reverse)
      else for {
        k <- Gen.chooseNum(0L, 12L)
        p <- Gen.chooseNum(1, 999).map(_ / 10.0)
        st <- Gen.oneOf("A", "B")
        kind <- Gen.chooseNum(0, 9)
        r <- live.get(k) match {
          case None =>
            step(live + (k -> (p, st)), off + 1, left - 1,
              Ev(k, p, st, "c", off, "+I") :: acc)
          case Some((bp, bst)) if kind < 3 => // delete, before image rides
            step(live - k, off + 1, left - 1,
              Ev(k, bp, bst, "d", off, "+I") :: acc)
          case Some((bp, bst)) => // update: -U before + +U after, one offset
            step(live + (k -> (p, st)), off + 1, left - 1,
              Ev(k, p, st, "u", off, "+U") :: Ev(k, bp, bst, "u", off, "-U") :: acc)
        }
      } yield r
    Gen.chooseNum(0, 60).flatMap(n => step(Map.empty, 0L, n, Nil))
  }

  test("vacuum replay-equivalence: final state and in-horizon time travel unchanged") {
    val prop = Prop.forAll(genScript.flatMap(s =>
        Gen.chooseNum(0L, s.map(_.off).maxOption.getOrElse(0L) + 1L).map(s -> _))) {
      case (script, horizon) =>
        val df = spark.createDataFrame(java.util.Arrays.asList(script.map(e =>
          Row(e.k, e.price, e.st, e.op, e.off, e.rk)): _*), schema)
        val view = "vac_cl_" + java.util.UUID.randomUUID.toString.replace("-", "")
        df.createOrReplaceTempView(view)
        try {
          val vac = BucketedOps.vacuumChangelog(
            spark, view, "k", Seq("price", "st"), horizon)
          def mat(d: org.apache.spark.sql.DataFrame): Set[(Long, Double, String)] =
            ChangelogOps.materializeExact(d, Seq("k"))
              .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
          val full = mat(df)
          val gotV = mat(vac)
          val probe = horizon + 2
          val ttFull = mat(df.filter(col("op_offset") <= probe))
          val ttVac = mat(vac.filter(col("op_offset") <= probe))
          val preOk =
            vac.filter(col("op_offset") < horizon && col("op") =!= "r").count() == 0L
          Prop(gotV == full && ttVac == ttFull && preOk) :|
            s"h=$horizon full=$full vac=$gotV ttF=$ttFull ttV=$ttVac script=$script"
        } finally spark.catalog.dropTempView(view)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
