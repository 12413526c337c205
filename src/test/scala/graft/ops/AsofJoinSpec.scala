package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asof join picks the latest right row at or before each left time") {
    val left = Seq(
      (1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L),
      (4L, "u2", 15L), (5L, "u3", 100L))
      .toDF("id", "user", "t")
    val right = Seq(
      ("u1", 10L, "a"), ("u1", 18L, "b"), // t=10 matches id=1 inclusively
      ("u2", 16L, "c"))                   // after id=4 → no match
      .toDF("user", "t", "tag")
    val out = AsofJoin(left, right, on = "t", by = Seq("user"))
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(1), Option(r.getString(3)).orNull))
    // id→expected: 1→a (equal instant), 2→b (latest ≤ 20), 3→null (none
    // before t=5), 4→null (right is later), 5→null (no right rows for u3)
    assert(out.toSeq === Seq((1L, "a"), (2L, "b"), (3L, null), (4L, null), (5L, null)))
  }

  test("asof join suffixes clashing right columns and keeps left intact") {
    val left = Seq((1L, "u1", 10L, 1.5)).toDF("id", "user", "t", "value")
    val right = Seq(("u1", 8L, 9.9)).toDF("user", "t", "value")
    val out = AsofJoin(left, right, on = "t", by = Seq("user"), suffix = "_p")
    assert(out.columns.sorted.toSeq === Seq("id", "t", "user", "value", "value_p"))
    val row = out.head()
    assert(row.getAs[Double]("value") === 1.5)
    assert(row.getAs[Double]("value_p") === 9.9)
  }

  test("a match's genuinely-null value stays null (rows carry atomically)") {
    // right t=8 is the true match and has p=null: a per-column
    // last(ignoreNulls) would resurrect t=5's p=1.0 while taking t=8's
    // tag — fields from two different right rows stitched together
    val left = Seq((1L, "u1", 10L)).toDF("id", "user", "t")
    val right = Seq(
      ("u1", 5L, Some(1.0), "a"),
      ("u1", 8L, None, "b"))
      .toDF("user", "t", "p", "tag")
    val row = AsofJoin(left, right, on = "t", by = Seq("user")).head()
    assert(row.getAs[String]("tag") === "b")
    assert(row.isNullAt(row.fieldIndex("p")), "t=5's p must not be resurrected")
  }

  test("null by-keys match nothing (SQL equality, like the ASOF JOIN oracle)") {
    val left = Seq((1L, null.asInstanceOf[String], 10L), (2L, "u1", 10L))
      .toDF("id", "user", "t")
    val right = Seq((null.asInstanceOf[String], 5L, "x"), ("u1", 5L, "y"))
      .toDF("user", "t", "tag")
    val out = AsofJoin(left, right, on = "t", by = Seq("user"))
      .orderBy(col("id")).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("tag")),
      "null-keyed left row must not match the null-keyed right row")
    assert(out(1).getAs[String]("tag") === "y")
  }

  test("null event times match nothing (SQL ASOF: l.t >= r.t never true for null)") {
    // right has a null-time row that asc-nulls-first ordering would hand
    // to every early left row if it weren't filtered; left has a
    // null-time row that must come back unmatched.
    val left = Seq((1L, "u1", Some(3L)), (2L, "u1", None))
      .toDF("id", "user", "t")
    val right = Seq(("u1", None, "ghost"), ("u1", Some(5L), "late"))
      .toDF("user", "t", "tag")
    val out = AsofJoin(left, right, on = "t", by = Seq("user"))
      .orderBy(col("id")).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("tag")),
      "left t=3 precedes every real right time — must not match the null-time row")
    assert(out(1).isNullAt(out(1).fieldIndex("tag")),
      "null-time left row must match nothing")
  }

  test("right columns colliding after suffixing are rejected loudly") {
    val left = Seq((1L, "u1", 10L, 1.0)).toDF("id", "user", "t", "value")
    val right = Seq(("u1", 5L, 2.0, 3.0)).toDF("user", "t", "value", "value_r")
    val e = intercept[IllegalArgumentException] {
      AsofJoin(left, right, on = "t", by = Seq("user"))
    }
    assert(e.getMessage.contains("collide with each other"))
  }

  test("reserved internal column names are rejected loudly") {
    val left = Seq((1L, "u1", 10L, 0)).toDF("id", "user", "t", "__rv")
    val right = Seq(("u1", 5L, "x")).toDF("user", "t", "tag")
    val e = intercept[IllegalArgumentException] {
      AsofJoin(left, right, on = "t", by = Seq("user"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("a right side with nothing to carry is rejected loudly") {
    val left = Seq((1L, "u1", 10L)).toDF("id", "user", "t")
    val right = Seq(("u1", 5L)).toDF("user", "t")
    intercept[IllegalArgumentException] {
      AsofJoin(left, right, on = "t", by = Seq("user"))
    }
  }

  test("asof join matches a naive per-row model on 300 random rows") {
    // model: for each left row, linear-scan the right side — O(n^2) but
    // unambiguous. Random keys/times WITH collisions across groups; right
    // times are made unique per (key, t) upfront (the operator's
    // documented precondition).
    val rnd = new scala.util.Random(0x45F01)
    val leftRows = Seq.fill(300)((rnd.nextInt(100000).toLong,
      s"k${rnd.nextInt(7)}", rnd.nextInt(50).toLong))
    val rightRaw = Seq.fill(200)((s"k${rnd.nextInt(9)}",
      rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
    val rightRows = rightRaw.groupBy(r => (r._1, r._2))
      .map(_._2.head).toSeq // unique per (key, t)
    val left = leftRows.toDF("id", "k", "t")
    val right = rightRows.toDF("k", "t", "rv")
    val got = AsofJoin(left, right, on = "t", by = Seq("k"))
      .select(col("id"), col("k"), col("t"), col("rv"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    val model = leftRows.map { case (id, k, t) =>
      val best = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      (id, k, t, best)
    }.toSet
    assert(got === model)

    // forward direction against the mirrored model (earliest r.t >= l.t)
    val gotF = AsofJoin(left, right, on = "t", by = Seq("k"),
      direction = "forward")
      .select(col("id"), col("k"), col("t"), col("rv"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    val modelF = leftRows.map { case (id, k, t) =>
      val best = rightRows.filter(r => r._1 == k && r._2 >= t)
        .sortBy(_._2).headOption.map(_._3)
      (id, k, t, best)
    }.toSet
    assert(gotF === modelF)

    // nearest: closer of the two, ties to backward
    val gotN = AsofJoin(left, right, on = "t", by = Seq("k"),
      direction = "nearest")
      .select(col("id"), col("k"), col("t"), col("rv"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    val modelN = leftRows.map { case (id, k, t) =>
      val b = rightRows.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
      val f = rightRows.filter(r => r._1 == k && r._2 >= t).sortBy(_._2).headOption
      val best = (b, f) match {
        case (Some(bb), Some(ff)) =>
          if (ff._2 - t < t - bb._2) Some(ff._3) else Some(bb._3)
        case (bb, ff) => bb.orElse(ff).map(_._3)
      }
      (id, k, t, best)
    }.toSet
    assert(gotN === modelN)
  }

  test("enrichStatic broadcasts the right side: zero exchange on the left") {
    val left = Seq((1L, "u1", 10L)).toDF("id", "user", "t")
    val right = Seq(("u1", 5L, "x")).toDF("user", "t", "tag")
    val out = AsofJoin.enrichStatic(left, right, on = "t", by = Seq("user"))
    val plan = out.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(plan).nonEmpty,
      s"right side must broadcast:\n$plan")
    // the only Exchange allowed is the broadcast one (right side + its
    // interval window prep); the LEFT side must not shuffle
    assert(!plan.contains("Exchange hashpartitioning") ||
      "Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      s"left side must not hash-shuffle:\n$plan")
  }

  test("nearest direction plans ONE exchange (two sorts share the shuffle)") {
    val left = Seq((1L, "u1", 10L)).toDF("id", "user", "t")
    val right = Seq(("u1", 5L, "x")).toDF("user", "t", "tag")
    val out = AsofJoin(left, right, on = "t", by = Seq("user"),
      direction = "nearest")
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"nearest must not shuffle twice:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 2,
      s"expected both direction windows:\n$plan")
  }

  test("tolerance bounds the match distance in both directions") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 200L)).toDF("id", "user", "t")
    val right = Seq(("u1", 95L, "near"), ("u1", 120L, "mid")).toDF("user", "t", "tag")
    // backward: id=1 matches t=95 (distance 5 <= 10); id=2's nearest
    // prior is t=120 (distance 80) — nulled, NOT replaced by t=95
    val back = AsofJoin(left, right, on = "t", by = Seq("user"),
      tolerance = Some("10")).orderBy(col("id")).collect()
      .map(r => Option(r.getString(3)).orNull)
    assert(back.toSeq === Seq("near", null))
    // forward: id=1's next is t=120 (distance 20 > 10) → null;
    // with tolerance 25 it matches
    val fwd = AsofJoin(left, right, on = "t", by = Seq("user"),
      direction = "forward", tolerance = Some("25"))
      .orderBy(col("id")).collect().map(r => Option(r.getString(3)).orNull)
    assert(fwd.toSeq === Seq("mid", null))
    // interval tolerance over timestamps
    val lts = Seq((1L, "u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "user", "t")
    val rts = Seq(("u", java.sql.Timestamp.valueOf("2024-01-01 08:30:00"), 7.5))
      .toDF("user", "t", "v")
    def tsMatch(tol: String): Boolean = {
      val r = AsofJoin(lts, rts, on = "t", by = Seq("user"),
        tolerance = Some(tol)).head()
      !r.isNullAt(r.fieldIndex("v"))
    }
    assert(tsMatch("INTERVAL '2' HOUR"))
    assert(!tsMatch("INTERVAL '1' HOUR"))
  }

  test("forward direction: earliest right row at or after, nulls match nothing") {
    val left = Seq((1L, "u1", 10L), (2L, "u1", 21L), (3L, "u2", 5L),
      (4L, "u1", Long.MinValue)) // sentinel exercised below via null row
      .toDF("id", "user", "t")
    val right = Seq(("u1", 10L, "now"), ("u1", 18L, "soon"), ("u2", 4L, "past"))
      .toDF("user", "t", "tag")
    val out = AsofJoin(left, right, on = "t", by = Seq("user"),
      direction = "forward").orderBy(col("id")).collect()
      .map(r => (r.getLong(1), Option(r.getString(3)).orNull))
    // 1→now (equal instant inclusive), 2→null (nothing after 21),
    // 3→null (u2's only right row is earlier), 4→now (earliest overall)
    assert(out.toSeq === Seq((1L, "now"), (2L, null), (3L, null), (4L, "now")))
    // null-time left and right rows still match nothing under desc order
    val leftN = Seq((1L, "u1", None), (2L, "u1", Some(50L)))
      .toDF("id", "user", "t")
    val rightN = Seq(("u1", None, "ghost"), ("u1", Some(60L), "after"))
      .toDF("user", "t", "tag")
    val outN = AsofJoin(leftN, rightN, on = "t", by = Seq("user"),
      direction = "forward").orderBy(col("id")).collect()
    assert(outN(0).isNullAt(outN(0).fieldIndex("tag")),
      "null-time left row must match nothing")
    assert(outN(1).getAs[String]("tag") === "after",
      "and must not be handed the null-time right row")
  }

  test("asof_join component runs from JSON config (window and broadcast strategies)") {
    val lin = tmpDir("asof_l"); val rin = tmpDir("asof_r")
    Seq((1L, "u1", 10L), (2L, "u1", 20L)).toDF("id", "user", "t")
      .write.mode("overwrite").parquet(lin)
    Seq(("u1", 15L, "x")).toDF("user", "t", "tag")
      .write.mode("overwrite").parquet(rin)
    for (strategy <- Seq("window", "broadcast")) {
    val out = tmpDir(s"asof_out_$strategy")
    val lSchema =
      """{ "fields": [
        |  { "name": "id", "data_type": "integer" },
        |  { "name": "user", "data_type": "string" },
        |  { "name": "t", "data_type": "integer" } ] }""".stripMargin
    val rSchema =
      """{ "fields": [
        |  { "name": "user", "data_type": "string" },
        |  { "name": "t", "data_type": "integer" },
        |  { "name": "tag", "data_type": "string" } ] }""".stripMargin
    val oSchema =
      """{ "fields": [
        |  { "name": "id", "data_type": "integer" },
        |  { "name": "user", "data_type": "string" },
        |  { "name": "t", "data_type": "integer" },
        |  { "name": "tag", "data_type": "string", "nullable": true } ] }""".stripMargin
    val json =
      s"""{ "name": "t", "components": [
         |  { "name": "rl", "comp_type": "read_parquet", "filepath": "$lin",
         |    "routes": { "out": [ { "to": "aj", "in_port": "left" } ] },
         |    "out_port_schemas": { "out": $lSchema } },
         |  { "name": "rr", "comp_type": "read_parquet", "filepath": "$rin",
         |    "routes": { "out": [ { "to": "aj", "in_port": "right" } ] },
         |    "out_port_schemas": { "out": $rSchema } },
         |  { "name": "aj", "comp_type": "asof_join", "on": "t", "by": ["user"],
         |    "strategy": "$strategy",
         |    "in_port_schemas": { "left": $lSchema, "right": $rSchema },
         |    "routes": { "out": [ { "to": "w", "in_port": "in" } ] },
         |    "out_port_schemas": { "out": $oSchema } },
         |  { "name": "w", "comp_type": "write_parquet", "filepath": "$out",
         |    "in_port_schemas": { "in": $oSchema } } ] }""".stripMargin
    val built = graft.graph.JobGraph.build(spark, graft.config.JobConfig.parse(json))
    built.runSinks(); built.close()
    val got = spark.read.parquet(out).orderBy(col("id"))
      .collect().map(r => (r.getAs[Long]("id"), Option(r.getAs[String]("tag")).orNull))
    assert(got.toSeq === Seq((1L, null), (2L, "x")),
      s"strategy=$strategy") // 15 ≤ 20 only
    }
  }

  private def tmpDir(name: String): String = {
    val p = java.nio.file.Paths.get("target", "test-tmp", "asof", name).toAbsolutePath
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }

  // ----------------------------------------------------------- properties

  /** Naive per-left-row model of every direction × tolerance, written
    * from the scaladoc semantics (null key/time matches nothing; right
    * nulls dropped; tolerance filters EACH direction's carry before
    * nearest picks the closer, tie to backward). */
  private def asofModel(
      leftRows: Seq[(Long, Option[String], Option[Long])],
      rightRows: Seq[(Option[String], Option[Long], Long)],
      direction: String, tol: Option[Long]
  ): Set[(Long, Option[String], Option[Long], Option[Long])] = {
    val valid = rightRows.collect { case (Some(k), Some(t), v) => (k, t, v) }
    leftRows.map { case (id, lk, lt) =>
      val cands = (lk, lt) match {
        case (Some(k), Some(_)) => valid.filter(_._1 == k)
        case _ => Seq.empty
      }
      val t = lt.getOrElse(0L)
      def within(d: Long) = tol.forall(d <= _)
      val b = cands.filter(_._2 <= t).sortBy(_._2).lastOption
        .filter(r => within(t - r._2))
      val f = cands.filter(_._2 >= t).sortBy(_._2).headOption
        .filter(r => within(r._2 - t))
      val best = direction match {
        case "backward" => b
        case "forward"  => f
        case "nearest"  => (b, f) match {
          case (Some(bb), Some(ff)) =>
            if (ff._2 - t < t - bb._2) Some(ff) else Some(bb) // tie → backward
          case _ => b.orElse(f)
        }
      }
      (id, lk, lt, best.map(_._3))
    }.toSet
  }

  test("property: every direction × tolerance matches the model on random null mixes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sampleN[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
        (s.next, Some(g.pureApply(Gen.Parameters.default, s)))
      }.drop(1).take(n).flatMap(_._2).toSeq
    val keyGen: Gen[Option[String]] = Gen.frequency(
      8 -> Gen.choose(0, 4).map(i => Some(s"k$i")), 1 -> Gen.const(None))
    val timeGen: Gen[Option[Long]] = Gen.frequency(
      9 -> Gen.choose(0L, 60L).map(Some(_)), 1 -> Gen.const(None))
    for (seed <- Seq(0xA50F1L, 0xBEEF2L)) {
      val leftRows = sampleN(Gen.zip(keyGen, timeGen), 250, seed)
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rightRows = sampleN(Gen.zip(keyGen, timeGen, Gen.choose(0L, 999L)),
        150, seed + 1)
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique per (key, t)
      val left = leftRows.toDF("id", "k", "t")
      val right = rightRows.toDF("k", "t", "rv")
      for {
        direction <- Seq("backward", "forward", "nearest")
        tol <- Seq(None, Some(7L))
      } {
        val got = AsofJoin(left, right, on = "t", by = Seq("k"),
          direction = direction, tolerance = tol.map(_.toString))
          .select(col("id"), col("k"), col("t"), col("rv"))
          .collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getString(1)),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))
          .toSet
        val want = asofModel(leftRows, rightRows, direction, tol)
        assert(got === want,
          s"direction=$direction tolerance=$tol seed=$seed diverged from the model")
        // the static-right enrichment form (streaming twin) must agree
        // with the same model on the same batch inputs
        val gotE = AsofJoin.enrichStatic(left, right, on = "t", by = Seq("k"),
          direction = direction, tolerance = tol.map(_.toString))
          .select(col("id"), col("k"), col("t"), col("rv"))
          .collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getString(1)),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))
          .toSet
        assert(gotE === want,
          s"enrichStatic direction=$direction tolerance=$tol seed=$seed diverged")
      }
    }
  }
}
