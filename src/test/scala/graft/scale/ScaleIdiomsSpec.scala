package graft.scale

import graft.SparkTestBase
import graft.ops.AggregateOp
import graft.ops.AggregateOp.AggSpec
import org.apache.spark.sql.functions._

/** Pins the at-scale idioms: salted aggregation correctness and
  * bucketed-table co-located (shuffle-free) joins. */
class ScaleIdiomsSpec extends SparkTestBase {
  import spark.implicits._

  // TIMING NOTE (r20 gate-wall audit): this test tops the COVERAGE.md
  // slow-test table (~9-13 s) ONLY because this suite happens to run
  // first in the forked test JVM, so the first `spark` touch pays the
  // one-time SparkSession + first-job codegen warmup (~8 s). The body
  // itself is sub-second warm (the plan-shape twin below runs in ~60 ms)
  // — shrinking the 10k-row fixture would not move the number, and the
  // constant lands on whichever suite runs first if this one changes.
  test("saltedAggregate equals direct aggregation on skewed data") {
    // 90% of rows on one key — the shape salting exists for
    val skewed = spark.range(10000).select(
      when(col("id") % 10 === 0, concat(lit("k"), col("id") % 7))
        .otherwise(lit("hot")).as("g"),
      (col("id") % 97).cast("double").as("v"))
    val aggs = Seq(AggSpec("*", "count", "n"), AggSpec("v", "sum", "s"),
      AggSpec("v", "min", "mn"), AggSpec("v", "max", "mx"))
    val direct = AggregateOp(skewed, Seq("g"), aggs)
      .orderBy(col("g")).collect().map(_.toSeq)
    val salted = Skew.saltedAggregate(skewed, Seq("g"), aggs, saltFactor = 8)
      .orderBy(col("g")).collect().map(_.toSeq)
    assert(salted.toSeq === direct.toSeq)
  }

  test("batch session windows: partial agg, ONE exchange, MergingSessions") {
    // the scale-correct session plan: map-side partial aggregation of
    // tentative sessions, one shuffle on the group keys, then Spark's
    // dedicated MergingSessions operator + final aggregate — NOT a
    // row-level shuffle-then-sort-then-walk
    val df = spark.range(5000).select(
      concat(lit("u"), col("id") % 50).as("user"),
      timestamp_seconds(lit(1704067200L) + col("id") * 97 % 86400).as("ts"),
      (col("id") % 13).as("v"))
    val out = AggregateOp.windowed(df, "ts",
      AggregateOp.windowColumn("ts", None, None, Some("15 minutes"), "spec"),
      Seq("user"), Seq(AggSpec("v", "sum", "sv")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("MergingSessions"),
      s"expected the MergingSessions operator:\n$plan")
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"session agg must shuffle exactly once:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial AND final aggregate nodes:\n$plan")
  }

  test("saltedAggregate compiles to the two-phase shape: salt exchange, then key exchange") {
    // exactly two shuffles: phase 1 partials land on (keys, __salt) so the
    // hot key spreads over saltFactor reducers; phase 2 merges the tiny
    // keys x saltFactor partial set on the keys alone
    val skewed = spark.range(10000).select(lit("hot").as("g"),
      (col("id") % 97).cast("double").as("v"))
    val out = Skew.saltedAggregate(skewed, Seq("g"),
      Seq(AggSpec("v", "sum", "s")), saltFactor = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2,
      s"expected exactly two exchanges (salted partial, key merge):\n$plan")
    assert("hashpartitioning\\([^)]*__salt".r.findAllIn(plan).size === 1,
      s"phase-1 exchange must partition on the salt:\n$plan")
    // 2 phases x (partial + final) hash aggregates
    assert("HashAggregate".r.findAllIn(plan).size === 4,
      s"expected partial+final aggregates in both phases:\n$plan")
  }

  test("saltedAggregate rejects non-decomposable ops") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedAggregate(df, Seq("g"), Seq(AggSpec("v", "median", "m")))
    }
  }

  test("saltedAggregate refuses a user __salt column instead of silently replacing it") {
    val df = Seq(("a", 1.0, 7)).toDF("g", "v", "__salt")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedAggregate(df, Seq("g"), Seq(AggSpec("v", "sum", "s")))
    }
    assert(e.getMessage.contains("__salt"))
  }

  test("chained dimension joins broadcast both small sides (no shuffle exchange)") {
    // the q_job_join3 shape: fact ⋈ dim ⋈ dim through the SAME joinMode
    // fold the declarative job dispatches to — both dimension sides must
    // come in as broadcasts and the fact side must never shuffle
    import graft.ops.SchemaMappingOp
    import graft.ops.SchemaMappingOp.JoinStep
    val fact = spark.range(20000).select(col("id").as("fk"),
      (col("id") % 100).as("d1k"), (col("id") % 7).as("v"))
    val dim1 = spark.range(100).select(col("id").as("d1id"),
      concat(lit("n"), col("id")).as("d1name"), (col("id") % 10).as("d2k"))
    val dim2 = spark.range(10).select(col("id").as("d2id"),
      concat(lit("m"), col("id")).as("d2name"))
    val joined = SchemaMappingOp.joinMode(
      Map("fact" -> fact, "dim1" -> dim1, "dim2" -> dim2),
      Seq(JoinStep("fact", "dim1", Seq("d1k"), Seq("d1id"), "inner", "fd"),
        JoinStep("fd", "dim2", Seq("d2k"), Seq("d2id"), "inner", "out")))("out")
    assert(joined.count() === 20000) // keys constructed total
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension joins should broadcast:\n$plan")
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"fact side must not shuffle through a chained dim join:\n$plan")
  }

  test("knnJoin pre-reduces top-k per partition before the shuffle (WindowGroupLimit)") {
    // The scored set is |corpus| x |queries| rows; the rank<=k filter over
    // row_number lets Catalyst insert WindowGroupLimit BELOW the window's
    // Exchange (InferWindowGroupLimit), so each task forwards at most
    // queries*k rows instead of its whole scored slice — the difference
    // between a bounded and an O(n*q) shuffle at 100 TB. Pinned here so a
    // refactor to an uninferable ranking shape can't silently lose it.
    import org.apache.spark.sql.functions._
    val corpus = spark.range(5000).select(col("id").as("vec_id"),
      array((0 until 8).map(i => (rand(i) * 2 - 1).cast("float")): _*).as("embedding"))
    val queries = corpus.filter(col("vec_id") < 4)
    val out = Similarity.knnJoin(corpus, queries, "embedding", "vec_id", "vec_id", 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must compile to a WindowGroupLimit pre-reduction:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"queries side must broadcast (corpus never shuffles to score):\n$plan")
    // partial (pre-shuffle) + final (post-shuffle) instances
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"expected partial AND final WindowGroupLimit nodes:\n$plan")
    assert(out.count() === 20) // 4 queries x k=5
  }

  test("hashSplit ports are narrow filters: zero Exchange in every split plan") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id")
    graft.ops.RelationalOps.hashSplit(df, "id",
      Seq(("train", 0.8), ("rest", 0.2))).foreach { case (name, split) =>
      val plan = split.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"hash_split '$name' must not shuffle:\n$plan")
    }
  }

  test("hashSample is a narrow filter: zero Exchange, stratified or not") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "lang")
    Seq(
      graft.ops.RelationalOps.hashSample(df, "id", 0.3, seed = "s"),
      graft.ops.RelationalOps.hashSample(df, "id", 0.3, seed = "s",
        strataCol = Some("lang"), strataFractions = Seq(("en", 0.1)))
    ).foreach { sampled =>
      val plan = sampled.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"sample must not shuffle:\n$plan")
    }
  }

  test("partition_by sinks prune partitions on readback (PartitionFilters)") {
    // The 100 TB value of a partitioned sink IS the pruning: a reader
    // filtering on the partition column must scan only its directories.
    // q_job_partitioned pins result correctness; this pins the plan.
    val out = java.nio.file.Files.createTempDirectory("graft_prune")
      .resolve("orders_part").toString
    val in = java.nio.file.Files.createTempDirectory("graft_prune_in")
      .resolve("orders_in").toString
    spark.range(3000).select(col("id").as("o_orderkey"),
      when(col("id") % 3 === 0, "F").when(col("id") % 3 === 1, "O")
        .otherwise("P").as("o_orderstatus"),
      (col("id") % 97).cast("double").as("o_totalprice"))
      .write.mode("overwrite").parquet(in)
    val schema =
      """{ "fields": [
        |  { "name": "o_orderkey", "data_type": "integer" },
        |  { "name": "o_orderstatus", "data_type": "string" },
        |  { "name": "o_totalprice", "data_type": "float" } ] }""".stripMargin
    val json =
      s"""{ "name": "t", "components": [
         |  { "name": "r", "comp_type": "read_parquet", "filepath": "$in",
         |    "routes": { "out": [ { "to": "w", "in_port": "in" } ] },
         |    "out_port_schemas": { "out": $schema } },
         |  { "name": "w", "comp_type": "write_parquet", "filepath": "$out",
         |    "partition_by": ["o_orderstatus"],
         |    "in_port_schemas": { "in": $schema } } ] }""".stripMargin
    val built = graft.graph.JobGraph.build(spark,
      graft.config.JobConfig.parse(json))
    built.runSinks(); built.close()

    val filtered = spark.read.parquet(out)
      .filter(col("o_orderstatus") === "F")
    val formatted = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PartitionFilters") &&
      formatted.contains("o_orderstatus"),
      s"scan must carry a PartitionFilter on o_orderstatus:\n$formatted")
    // The stronger check: execute and read the scan's own metrics —
    // exactly ONE of the three o_orderstatus directories was read.
    // (inputFiles can't pin this: it reports the pre-pruning listing;
    // count() would execute a DIFFERENT QueryExecution — collect() runs
    // this DataFrame's own plan so its scan metrics populate.)
    assert(filtered.collect().length === 1000)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val executed = filtered.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val scan = executed.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail(s"no FileSourceScanExec in:\n$executed"))
    assert(scan.metrics("numPartitions").value === 1,
      s"expected 1 of 3 partition directories read, metrics: ${scan.metrics}")
  }

  test("sort_by sinks write disjoint key ranges and keep pushdown (data skipping)") {
    // The 100 TB value of the sorted layout: each output file owns a
    // disjoint range of the sort key, so parquet min/max stats let a
    // key-filtered reader skip whole files. The disjointness IS the
    // skipping guarantee — pin it file by file.
    val out = java.nio.file.Files.createTempDirectory("graft_sorted")
      .resolve("events_sorted").toString
    val in = java.nio.file.Files.createTempDirectory("graft_sorted_in")
      .resolve("events_in").toString
    // adversarial input layout: hash-scattered, nothing pre-sorted
    spark.range(4000).select(col("id").as("v"),
      (col("id") % 7).as("noise")).repartition(8, col("noise"))
      .write.mode("overwrite").parquet(in)
    val schema =
      """{ "fields": [
        |  { "name": "v", "data_type": "integer" },
        |  { "name": "noise", "data_type": "integer" } ] }""".stripMargin
    val json =
      s"""{ "name": "t", "components": [
         |  { "name": "r", "comp_type": "read_parquet", "filepath": "$in",
         |    "routes": { "out": [ { "to": "w", "in_port": "in" } ] },
         |    "out_port_schemas": { "out": $schema } },
         |  { "name": "w", "comp_type": "write_parquet", "filepath": "$out",
         |    "sort_by": ["v"], "files": 4,
         |    "in_port_schemas": { "in": $schema } } ] }""".stripMargin
    val built = graft.graph.JobGraph.build(spark,
      graft.config.JobConfig.parse(json))
    built.runSinks(); built.close()

    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(perFile.length === 4, s"expected 4 range files, got ${perFile.length}")
    assert(perFile.map(_._3).sum === 4000L)
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1,
        s"file ranges overlap: [${a._1},${a._2}] vs [${b._1},${b._2}]")
      case _ => ()
    }
    // a key filter still reaches the scan as a pushed predicate
    val filtered = spark.read.parquet(out).filter(col("v") >= 3900)
    val formatted = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters") && formatted.contains("v"),
      s"v >= 3900 must reach PushedFilters:\n$formatted")
    assert(filtered.count() === 100)
    // config guards: files without sort_by, sort_by with coalesce
    intercept[IllegalArgumentException] {
      graft.graph.JobGraph.build(spark, graft.config.JobConfig.parse(
        json.replace(""""sort_by": ["v"], "files": 4""",
          """"files": 4"""))).runSinks()
    }
    intercept[IllegalArgumentException] {
      graft.graph.JobGraph.build(spark, graft.config.JobConfig.parse(
        json.replace(""""files": 4""", """"coalesce": 2"""))).runSinks()
    }
  }

  test("bucketed tables join without an exchange (co-located join)") {
    // a fresh JVM's in-memory catalog doesn't know tables left on disk by
    // a previous run: drop via catalog AND remove the stale locations
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    val wh = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Seq("b_left", "b_right").foreach { t =>
      val dir = wh.resolve(t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("lv"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("b_left")
    spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("rv"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("b_right")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_left").join(spark.table("b_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle, but plan has an Exchange:\n$plan")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("declarative write_bucketed + read_table: the join itself is exchange-free") {
    import org.apache.spark.sql.functions.col
    val bDir = "target/test-tmp/bucketed-decl"
    val lSchema =
      """{ "fields": [
        |  { "name": "k", "data_type": "integer" },
        |  { "name": "lv", "data_type": "integer" } ] }""".stripMargin
    val rSchema =
      """{ "fields": [
        |  { "name": "k", "data_type": "integer" },
        |  { "name": "rv", "data_type": "integer" } ] }""".stripMargin
    val lIn = s"$bDir/l_in"
    val rIn = s"$bDir/r_in"
    spark.range(500).select(col("id").as("k"), (col("id") * 2).as("lv"))
      .write.mode("overwrite").parquet(lIn)
    spark.range(500).select(col("id").as("k"), (col("id") * 3).as("rv"))
      .write.mode("overwrite").parquet(rIn)
    val stage =
      s"""{ "name": "bstage", "components": [
         |  { "name": "rl", "comp_type": "read_parquet", "filepath": "$lIn",
         |    "routes": { "out": [ { "to": "wl", "in_port": "in" } ] },
         |    "out_port_schemas": { "out": $lSchema } },
         |  { "name": "rr", "comp_type": "read_parquet", "filepath": "$rIn",
         |    "routes": { "out": [ { "to": "wr", "in_port": "in" } ] },
         |    "out_port_schemas": { "out": $rSchema } },
         |  { "name": "wl", "comp_type": "write_bucketed", "table": "bdecl_l",
         |    "filepath": "$bDir/l", "buckets": 4, "bucket_by": ["k"],
         |    "sort_by": ["k"], "in_port_schemas": { "in": $lSchema } },
         |  { "name": "wr", "comp_type": "write_bucketed", "table": "bdecl_r",
         |    "filepath": "$bDir/r", "buckets": 4, "bucket_by": ["k"],
         |    "sort_by": ["k"], "in_port_schemas": { "in": $rSchema } } ] }""".stripMargin
    val built = graft.graph.JobGraph.build(spark,
      graft.config.JobConfig.parse(stage))
    built.runSinks(); built.close()
    val jSchema =
      """{ "fields": [
        |  { "name": "k", "data_type": "integer" },
        |  { "name": "lv", "data_type": "integer" },
        |  { "name": "rv", "data_type": "integer" } ] }""".stripMargin
    val joinJob =
      s"""{ "name": "bjoin", "components": [
         |  { "name": "tl", "comp_type": "read_table", "table": "bdecl_l",
         |    "routes": { "out": [ { "to": "j", "in_port": "l" } ] },
         |    "out_port_schemas": { "out": $lSchema } },
         |  { "name": "tr", "comp_type": "read_table", "table": "bdecl_r",
         |    "routes": { "out": [ { "to": "j", "in_port": "r" } ] },
         |    "out_port_schemas": { "out": $rSchema } },
         |  { "name": "j", "comp_type": "sql",
         |    "query": "SELECT l.k, l.lv, r.rv FROM j_l l JOIN j_r r ON l.k = r.k",
         |    "in_port_schemas": { "l": $lSchema, "r": $rSchema },
         |    "routes": { "out": [ { "to": "w", "in_port": "in" } ] },
         |    "out_port_schemas": { "out": $jSchema } },
         |  { "name": "w", "comp_type": "write_parquet",
         |    "filepath": "$bDir/out", "in_port_schemas": { "in": $jSchema } } ] }""".stripMargin
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = graft.graph.JobGraph.build(spark,
        graft.config.JobConfig.parse(joinJob))
      val frame = joined.frames(("j", "out"))
      val plan = frame.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"aligned bucketed declarative join must not shuffle:\n$plan")
      assert(frame.count() === 500)
      joined.runSinks() // exercise the routed sink too (500 rows land)
      assert(spark.read.parquet(s"$bDir/out").count() === 500)
      joined.close()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
