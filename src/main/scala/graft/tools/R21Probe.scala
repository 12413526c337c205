package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only phase timings for the r21 optimization round's remaining
  * expensive gates (q_json_roundtrip, q_job_profile): which phase of
  * each query owns the wall. Bench-identical session confs; phases are
  * timed over `iters` reps with cache clears between, medians printed.
  * Run ALONE like the other timing probes. */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      times(name) = times.getOrElse(name, Vector.empty) :+ (System.nanoTime() - t0) / 1e9
      r
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)

    val tmp = new java.io.File("target/tmp").getAbsolutePath

    (1 to iters).foreach { _ =>
      // ---- q_json_roundtrip phases
      val out = s"$tmp/probe_json_roundtrip"
      val src = graft.SparkEntry.table(spark, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      t("json.write_gz") { graft.io.JsonIO.write(src, out, gzip = true) }
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      t("json.read_lenient+agg") {
        graft.io.JsonIO.readNdjsonLenient(spark, out, schema)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"))
          .count()
      }
      val out2 = s"$tmp/probe_json_roundtrip_nogz"
      t("json.write_nogz") { graft.io.JsonIO.write(src, out2, gzip = false) }
      t("json.read_nogz") {
        graft.io.JsonIO.readNdjsonLenient(spark, out2, schema)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n")).count()
      }
      spark.catalog.clearCache()

      // ---- q_job_profile phases
      val stage = s"$tmp/probe_prof_in"
      val pout = s"$tmp/probe_prof_out"
      t("prof.stage_write") {
        graft.SparkEntry.table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderstatus"), col("o_orderpriority"))
          .write.mode("overwrite").parquet(stage)
      }
      val in = t("prof.read_stage") { graft.io.ParquetIO.read(spark, stage) }
      val prof = t("prof.plan") {
        graft.scale.Profile.profile(in, Seq("o_orderkey", "o_custkey",
          "o_totalprice", "o_orderstatus", "o_orderpriority"))
      }
      t("prof.agg_write") { prof.write.mode("overwrite").parquet(pout) }
      t("prof.readback") { spark.read.parquet(pout).orderBy(col("col_name")).count() }
      t("prof.agg_noop") {
        graft.scale.Profile.profile(in, Seq("o_orderkey", "o_custkey",
          "o_totalprice", "o_orderstatus", "o_orderpriority"))
          .write.format("noop").mode("overwrite").save()
      }
      t("prof.agg_approx_noop") {
        graft.scale.Profile.profile(in, Seq("o_orderkey", "o_custkey",
          "o_totalprice", "o_orderstatus", "o_orderpriority"), approx = true)
          .write.format("noop").mode("overwrite").save()
      }
      t("prof.distinct_only_noop") {
        in.agg(count_distinct(col("o_orderkey")), count_distinct(col("o_custkey")),
          count_distinct(col("o_totalprice")), count_distinct(col("o_orderstatus")),
          count_distinct(col("o_orderpriority")))
          .write.format("noop").mode("overwrite").save()
      }
      t("prof.one_distinct_noop") {
        in.agg(count_distinct(col("o_orderkey")))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()

      // ---- json read variants
      val outWide = s"$tmp/probe_json_wide"
      t("json.write_gz_wide") {
        graft.io.JsonIO.write(src.repartition(32), outWide, gzip = true)
      }
      val schema2 = StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      t("json.read_lenient_wide") {
        graft.io.JsonIO.readNdjsonLenient(spark, outWide, schema2)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n")).count()
      }
      t("json.read_strict_wide") {
        spark.read.schema(schema2).json(outWide)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n")).count()
      }
      spark.catalog.clearCache()

      // ---- q_job_csv_filter staging-parallelism variants
      val csvIn = s"$tmp/probe_csv_in"
      val csvInW = s"$tmp/probe_csv_in_wide"
      val csvOut = s"$tmp/probe_csv_out"
      val li = graft.SparkEntry.table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
      t("csv.stage_write") { graft.io.CsvIO.write(li, csvIn, sep = ",") }
      t("csv.stage_write_wide") {
        graft.io.CsvIO.write(li.repartition(32), csvInW, sep = ",")
      }
      def csvJob(in: String): Unit = {
        val df = graft.io.CsvIO.read(spark, in, sep = ",")
          .select(col("l_orderkey").cast("double").cast("int").as("l_orderkey"),
            col("l_linenumber").cast("double").cast("int").as("l_linenumber"),
            col("l_quantity").cast("double").cast("int").as("l_quantity"),
            col("l_returnflag"))
          .filter(col("l_quantity") <= 20 && !(col("l_returnflag") === "A"))
        graft.io.CsvIO.write(df, csvOut, sep = ",")
      }
      t("csv.job_narrow_stage") { csvJob(csvIn) }
      t("csv.job_wide_stage") { csvJob(csvInW) }
      spark.catalog.clearCache()

      // ---- pii_redact single-task vs widened (documents = 1 scan partition)
      val docs = graft.SparkEntry.table(spark, dir, "documents")
      def seeded(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"), col("lang"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" contact u"), col("doc_id").cast("string"),
            lit("@example.com or 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-1234 at 10.0."), (col("doc_id") % 256).cast("string"), lit(".1")))
          .otherwise(col("text")).as("text"))
      def piiAgg(d: org.apache.spark.sql.DataFrame) =
        graft.scale.TextAnalysis.redactPiiWithCounts(d, "text")
          .filter(col("n_emails") > 0)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"),
            sum(col("n_emails")).as("se"), max(col("text")).as("mt"))
      t("pii.narrow_noop") {
        piiAgg(seeded(docs)).write.format("noop").mode("overwrite").save()
      }
      t("pii.wide_noop") {
        piiAgg(seeded(docs).repartition(32)).write.format("noop").mode("overwrite").save()
      }
      // gopher kernel, same question
      t("gopher.narrow_noop") {
        graft.scale.TextAnalysis.gopherFilter(docs, "text")
          .write.format("noop").mode("overwrite").save()
      }
      t("gopher.wide_noop") {
        graft.scale.TextAnalysis.gopherFilter(docs.repartition(32), "text")
          .write.format("noop").mode("overwrite").save()
      }

      // ---- readback inference constant on a 5-row job output
      val sch = spark.read.parquet(pout).schema
      t("rb.infer") { spark.read.parquet(pout) }
      t("rb.with_schema") { spark.read.schema(sch).parquet(pout) }
      t("rb.infer+count") { spark.read.parquet(pout).orderBy(col("col_name")).count() }
      t("rb.schema+count") { spark.read.schema(sch).parquet(pout).orderBy(col("col_name")).count() }
    }

    times.foreach { case (k, v) =>
      println(f"phase $k%-24s med=${med(v)}%6.3f s  " +
        v.map(x => f"$x%.2f").mkString(" "))
    }
    spark.stop()
  }
}
