package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: for ANY base snapshot and ANY random mutation script
  * (deletes, inserts, per-column updates incl. null↔value flips), the
  * diff's classification is exactly the set-theoretic truth:
  *
  *   removed = keys(old) − keys(new)
  *   added   = keys(new) − keys(old)
  *   changed = keys in both whose rows differ — with `changed_cols`
  *             naming EXACTLY the differing columns in schema order
  *   nothing else is emitted (delta-only completeness: every key absent
  *   from the diff is bit-identical in both snapshots).
  *
  * This is the diff-patch soundness a dataset-versioning consumer relies
  * on: applying {delete removed, insert added, replace changed} to `old`
  * reconstructs `new` — the classification above is equivalent to that
  * round-trip, checked directly on the driver against the generated
  * truth. */
class SnapshotDiffPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("price", DoubleType),
    StructField("st", StringType)))

  private type Snap = Map[Long, (Option[Double], Option[String])]

  private def toDf(s: Snap) = spark.createDataFrame(
    java.util.Arrays.asList(s.toSeq.map { case (k, (p, st)) =>
      Row(k, p.map(Double.box).orNull, st.orNull)
    }: _*), schema)

  private val genBase: Gen[Snap] = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 60L)
      p <- Gen.option(Gen.chooseNum(1, 9999).map(_ / 100.0))
      st <- Gen.option(Gen.oneOf("A", "B", "C"))
    } yield k -> (p, st))
  } yield rows.toMap

  /** A mutation script over the base: per key, keep / delete / mutate;
    * plus fresh inserts at unused keys. */
  private def genNew(base: Snap): Gen[Snap] = for {
    kept <- Gen.sequence[List[Option[(Long, (Option[Double], Option[String]))]],
        Option[(Long, (Option[Double], Option[String]))]](
      base.toList.map { case (k, (p, st)) =>
        Gen.frequency(
          4 -> Gen.const(Some(k -> (p, st))), // unchanged
          1 -> Gen.const(None), // deleted
          3 -> (for { // mutated (may regenerate the same value — fine)
            p2 <- Gen.option(Gen.chooseNum(1, 9999).map(_ / 100.0))
            st2 <- Gen.option(Gen.oneOf("A", "B", "C"))
          } yield Some(k -> (p2, st2))))
      })
    nIns <- Gen.chooseNum(0, 10)
    inserts <- Gen.listOfN(nIns, for {
      k <- Gen.chooseNum(100L, 160L) // disjoint from base keys
      p <- Gen.option(Gen.chooseNum(1, 9999).map(_ / 100.0))
      st <- Gen.option(Gen.oneOf("A", "B", "C"))
    } yield k -> (p, st))
  } yield (kept.flatten ++ inserts).toMap

  test("diff classification equals the set-theoretic truth for random mutation scripts") {
    val prop = Prop.forAll(genBase.flatMap(b => genNew(b).map(b -> _))) {
      case (oldS, newS) =>
        val got = SnapshotDiff.diff(toDf(oldS), toDf(newS), Seq("k"))
          .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
        val removed = oldS.keySet.diff(newS.keySet)
        val added = newS.keySet.diff(oldS.keySet)
        val changed = (oldS.keySet & newS.keySet).filter(k => oldS(k) != newS(k))
        val expect =
          removed.map(_ -> ("removed", "")).toMap ++
          added.map(_ -> ("added", "")).toMap ++
          changed.map { k =>
            val cols = Seq(
              if (oldS(k)._1 != newS(k)._1) Some("price") else None,
              if (oldS(k)._2 != newS(k)._2) Some("st") else None).flatten
            k -> ("changed", cols.mkString(","))
          }.toMap
        Prop(got == expect) :| s"got=$got expect=$expect old=$oldS new=$newS"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
