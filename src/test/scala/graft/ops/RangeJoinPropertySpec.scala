package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** RangeJoin vs the naive model: a filtered cross join expressing the
  * same containment predicate directly. Random keys/times/bounds with
  * nulls and duplicate/overlapping intervals; fixed seed so a failure
  * reproduces. The implementation's equi-join-with-range-condition and
  * broadcast-nested-loop shapes must both agree with the model. */
class RangeJoinPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sampleN[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      val (v, next) = (g.pureApply(params, s), s.next)
      (next, Some(v))
    }.drop(1).take(n).flatMap(_._2).toSeq
  }

  private val keyGen: Gen[Option[String]] =
    Gen.frequency(9 -> Gen.oneOf("a", "b", "c").map(Some(_)), 1 -> Gen.const(None))
  private val tGen: Gen[Option[Int]] =
    Gen.frequency(9 -> Gen.chooseNum(0, 30).map(Some(_)), 1 -> Gen.const(None))

  test("keyed inner/left range join equals the filtered cross-join model") {
    val leftRows = sampleN(Gen.zip(keyGen, tGen), 120, seed = 11L)
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    val rightRows = sampleN(Gen.zip(keyGen, tGen, tGen), 60, seed = 23L)
      .zipWithIndex.map { case ((k, s, e), i) =>
        // mix genuinely ordered intervals with degenerate/reversed ones
        (1000L + i, k, s, e.map(v => v + (i % 7) - 2))
      }
    val left = leftRows.toDF("lid", "k", "t")
    val right = rightRows.toDF("rid", "k", "s", "e")

    val got = RangeJoin(left, right, on = "t", start = "s", end = "e",
      by = Seq("k"))
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    // independent model: plain filtered cross product (tiny data)
    val expected = (for {
      (lid, lk, lt) <- leftRows
      (rid, rk, rs, re) <- rightRows
      if lk.isDefined && lk == rk
      if lt.isDefined && rs.isDefined && re.isDefined
      if lt.get >= rs.get && lt.get <= re.get
    } yield (lid, rid)).sorted
    assert(got === expected)

    // left join: every left row appears; unmatched carry null rid
    val gotLeft = RangeJoin(left, right, "t", "s", "e", Seq("k"), joinType = "left")
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq
    val matchedL = expected.map(_._1).toSet
    val expectedLeft = (expected ++
      leftRows.map(_._1).filterNot(matchedL).map(l => (l, -1L))).sorted
    assert(gotLeft === expectedLeft)
  }

  test("keyless broadcast range join equals the model too") {
    val leftRows = sampleN(tGen, 80, seed = 31L)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val rightRows = sampleN(Gen.zip(tGen, tGen), 25, seed = 41L)
      .zipWithIndex.map { case ((s, e), i) => (1000L + i, s, e) }
    val got = RangeJoin(leftRows.toDF("lid", "t"), rightRows.toDF("rid", "s", "e"),
      "t", "s", "e")
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = (for {
      (lid, lt) <- leftRows
      (rid, rs, re) <- rightRows
      if lt.isDefined && rs.isDefined && re.isDefined
      if lt.get >= rs.get && lt.get <= re.get
    } yield (lid, rid)).sorted
    assert(got === expected)
  }
}
