package graft.ops

import graft.SparkTestBase
import graft.ops.AggregateOp.AggSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property test for batch session windows (AggregateOp.windowed with a
 * session_window column) against an independent gap-island model — in
 * particular the boundary rule: Spark MERGES a session whose next event
 * lands EXACTLY at the previous end (delta == gap); only delta > gap
 * opens a new session. This spec's first draft assumed the opposite
 * (end-exclusive, delta >= gap splits) and FAILED — which is the point:
 * real event data never lands on the boundary microsecond, so the
 * CORRECTNESS gate cannot distinguish `<` from `<=` in the oracles'
 * island rule; the generator here draws deltas from {under, exactly-at,
 * just-over} the gap to pin it, and the oracles follow this spec.
 *
 * Times are whole seconds so the component's string-cast window bounds
 * ("yyyy-MM-dd HH:mm:ss", no fraction to trim) compare exactly against
 * the model's formatter output.
 */
class SessionWindowPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sampleN[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      val (v, next) = (g.pureApply(params, s), s.next)
      (next, Some(v))
    }.drop(1).take(n).flatMap(_._2).toSeq
  }

  private val GapSec = 600L // "10 minutes"

  /** Per (user, event): a delta to the user's previous event, clustered
    * around the gap boundary. */
  private val rowGen: Gen[(String, Long, Long)] = for {
    user <- Gen.oneOf("u1", "u2", "u3", "u4")
    delta <- Gen.oneOf(30L, 599L, 600L, 601L, 45L) // under / at / over the gap
    v <- Gen.chooseNum(-50L, 50L)
  } yield (user, delta, v)

  test("session windows equal the gap-island model INCLUDING the exact-gap boundary") {
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val drawn = sampleN(rowGen, 400, seed = 43L)
    // cumulative deltas per user → absolute event seconds
    val events: Seq[(String, Long, Long)] = drawn.groupBy(_._1).toSeq.flatMap {
      case (user, rows) =>
        var t = 0L
        rows.map { case (_, delta, v) => t += delta; (user, t, v) }
    }
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val df = events
      .map { case (u, sec, v) => (u, fmt.format(base.plusSeconds(sec)), v) }
      .toDF("user", "ts", "v")

    val got = AggregateOp.windowed(df, "ts",
      AggregateOp.windowColumn("ts", None, None, Some("10 minutes"), "spec"),
      Seq("user"), Seq(AggSpec("v", "sum", "sv"), AggSpec("*", "count", "nv")))
      .collect()
      .map(r => (r.getString(2), r.getString(0), r.getString(1),
        r.getLong(3), r.getLong(4)))
      .toSet

    // independent model: islands split only where delta > gap (an event
    // exactly at the previous session's end MERGES into it)
    val model = events.groupBy(_._1).toSeq.flatMap { case (user, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val islands = sorted.foldLeft(Vector.empty[Vector[(Long, Long)]]) {
        case (acc, (t, v)) =>
          if (acc.nonEmpty && t - acc.last.last._1 <= GapSec)
            acc.init :+ (acc.last :+ ((t, v)))
          else acc :+ Vector((t, v))
      }
      islands.map { isl =>
        (user,
          fmt.format(base.plusSeconds(isl.head._1)),
          fmt.format(base.plusSeconds(isl.last._1 + GapSec)),
          isl.map(_._2).sum, isl.size.toLong)
      }
    }.toSet

    assert(got === model,
      s"spark-only: ${(got -- model).take(3)}; model-only: ${(model -- got).take(3)}")
    // the boundary case actually occurred (generator sanity, not vacuous)
    assert(drawn.exists(_._2 == 600L))
  }

  test("minimal boundary case: an event exactly at the session end merges") {
    // two events 600 s apart with a 600 s gap: end-inclusive merge → ONE
    // session [t0, t1 + gap); the end-exclusive reading would give two
    val df = Seq(("u", "2024-01-01 00:00:00", 1L),
      ("u", "2024-01-01 00:10:00", 2L)).toDF("user", "ts", "v")
    val got = AggregateOp.windowed(df, "ts",
      AggregateOp.windowColumn("ts", None, None, Some("10 minutes"), "spec"),
      Seq("user"), Seq(AggSpec("v", "sum", "sv")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(got.toSeq === Seq(("2024-01-01 00:00:00", "2024-01-01 00:20:00", 3L)))
  }
}
