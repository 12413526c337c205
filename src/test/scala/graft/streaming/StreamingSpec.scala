package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkTestBase {
  import Streaming._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def events = Seq(
    Event(1L, ts(5), 100L, "click", 1.0),
    Event(2L, ts(10), 100L, "click", 2.0),
    Event(3L, ts(20), 200L, "view", 4.0),
    Event(4L, ts(61), 100L, "click", 8.0)) // next hour window

  test("windowedCounts on a MemoryStream matches the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = startToMemory(
      windowedCounts(input.toDF(), watermarkDur = "10 minutes"), "win_test",
      OutputMode.Complete())
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_test")
        .orderBy(col("window_start"), col("event_type"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val batch = windowedCounts(events.toDF())
        .orderBy(col("window_start"), col("event_type"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(streamed.toSeq === batch.toSeq)
      assert(streamed.map(_._3).sum === 4L)
    } finally q.stop()
  }

  test("runningUserAggs keeps per-key state across triggers") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = runningUserAggs(input.toDS()).writeStream
      .format("memory").queryName("user_aggs").outputMode(OutputMode.Update()).start()
    try {
      input.addData(events.take(3): _*)
      q.processAllAvailable()
      input.addData(events.drop(3): _*) // second trigger updates user 100
      q.processAllAvailable()
      val byUser = spark.table("user_aggs")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n"), max(col("total_value")).as("v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(byUser(100L) === ((3L, 11.0))) // state carried: 2 then +1
      assert(byUser(200L) === ((1L, 4.0)))
    } finally q.stop()
  }

  test("eventStream reads the driver parquet as a stream (schema from batch)") {
    // the on-disk ts representation has changed across driver rounds
    // (nanos-INT64 → native TIMESTAMP(µs) NTZ); eventStream must surface
    // canonical TimestampType either way
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = eventStream(spark, "/root/testdata/sf0.001/events.parquet")
    assert(df.isStreaming)
    assert(df.schema.fieldNames.contains("event_type"))
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("windowedCounts over the REAL events.parquet (native timestamp) matches batch") {
    // stream↔batch parity on the driver's actual file, so the streaming
    // path cannot silently diverge from the current timestamp contract.
    // Byte-identical copy into a directory: file-source streams need one.
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    val dirP = java.nio.file.Files.createTempDirectory("real_events")
    dirP.toFile.deleteOnExit()
    java.nio.file.Files.copy(src, dirP.resolve("events.parquet"))
    val dir = dirP.toString
    val q = startToMemory(windowedCounts(eventStream(spark, dir)),
      "real_evt_win", OutputMode.Complete())
    try {
      q.processAllAvailable()
      def slurp(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getTimestamp(0).toString, r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      val streamed = slurp(spark.table("real_evt_win"))
      val batch = slurp(windowedCounts( // watermark is a no-op on batch
        graft.util.EventTime.normalize(spark.read.parquet(dir), "ts")))
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (k, (n, sv)) =>
        val (bn, bsv) = batch(k)
        assert(n === bn, s"n_events diverged for $k")
        // double sum: stream/batch partial order may differ in the last bits
        assert(math.abs(sv - bsv) < 1e-6, s"sum_value diverged for $k: $sv vs $bsv")
      }
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  private def docs = Seq(
    Doc(1L, ts(1), "The quick brown fox"),
    Doc(2L, ts(2), "  the QUICK brown fox "), // normalized duplicate of 1
    Doc(3L, ts(3), "Something else entirely"),
    Doc(4L, ts(4), "the quick brown fox"))    // duplicate again, later trigger

  test("streamingExactDedup emits one row per normalized key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = streamingExactDedup(input.toDF(), "text", "30 minutes")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.take(3): _*)
      q.processAllAvailable()
      input.addData(docs.drop(3): _*)
      q.processAllAvailable()
      val ids = spark.table("sdedup").collect().map(_.getAs[Long]("doc_id")).sorted
      assert(ids.toSeq === Seq(1L, 3L)) // 2 and 4 deduped across triggers
    } finally q.stop()
  }

  test("streamingFirstSeen matches the batch survivor rule across triggers") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = streamingFirstSeen(input.toDS())
      .writeStream.format("memory").queryName("sfirst")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs(1), docs(2)) // duplicate key arrives FIRST as id 2
      q.processAllAvailable()
      input.addData(docs(0), docs(3))
      q.processAllAvailable()
      val ids = spark.table("sfirst").collect().map(_.getAs[Long]("doc_id")).sorted
      // within trigger 1, id 2 is the min for its key; later 1 and 4 are dropped
      assert(ids.toSeq === Seq(2L, 3L))
    } finally q.stop()
  }

  test("streamingFirstSeen keeps null-text and blank-text keys separate, like batch exact") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // Degenerate corpus: two null-text docs, a space-only doc, and a
    // doc of non-space whitespace. Batch exact() keys null text as SQL
    // NULL, "   " as "" (spaces trim away), and "\t \n" as " " (trim
    // strips 0x20 ONLY, so the run collapses to a single space — the
    // pinned quirk): THREE window groups, three survivors. The
    // streaming twin must replicate all three distinctions — the old
    // twin merged null into "" (no sentinel) AND "\t \n" into ""
    // (Java trim strips every char <= U+0020).
    val degenerate = Seq(
      Doc(10L, ts(1), null),
      Doc(11L, ts(2), "   "),
      Doc(12L, ts(3), null),
      Doc(13L, ts(4), "\t \n"))
    val batchSurvivors = graft.scale.Dedup
      .exact(degenerate.toDF(), "text", "doc_id")
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(batchSurvivors.toSeq === Seq(10L, 11L, 13L))
    val input = MemoryStream[Doc]
    val q = streamingFirstSeen(input.toDS())
      .writeStream.format("memory").queryName("sfirst_degenerate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(degenerate.take(2): _*)
      q.processAllAvailable()
      input.addData(degenerate.drop(2): _*)
      q.processAllAvailable()
      val ids = spark.table("sfirst_degenerate").collect()
        .map(_.getAs[Long]("doc_id")).sorted
      assert(ids.toSeq === batchSurvivors.toSeq) // null and blank: one survivor EACH
    } finally q.stop()
  }

  // ------------------------------------------------- state-format versioning

  private def fsTmp(name: String): String = {
    val d = java.nio.file.Paths.get("target", "test-tmp", "streaming",
      s"$name-${System.nanoTime()}")
    java.nio.file.Files.createDirectories(d)
    d.toString
  }

  /** One AvailableNow pass of `q` writing parquet to out with the given
    * checkpoint; returns after the query terminates (or throws). */
  private def runOnce(q: org.apache.spark.sql.Dataset[Doc],
                      ckpt: String, out: String): Unit = {
    val sq = q.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try sq.awaitTermination() finally if (sq.isActive) sq.stop()
  }

  test("streamingFirstSeen state survives a query RESTART: v2 checkpoint resumes and dedups") {
    import spark.implicits._
    val in = fsTmp("fs_restart_in"); val ckpt = fsTmp("fs_restart_ckpt")
    val out = fsTmp("fs_restart_out")
    def stream = spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .parquet(in).as[Doc]
    Seq(Doc(1L, ts(1), "The quick brown fox"), Doc(3L, ts(2), "Something else"))
      .toDS().coalesce(1).write.mode("append").parquet(in)
    runOnce(streamingFirstSeen(stream), ckpt, out)
    // second PROCESS (not trigger): duplicates of 1 plus one new doc
    Seq(Doc(4L, ts(3), "the quick brown fox"), Doc(5L, ts(4), "brand new text"))
      .toDS().coalesce(1).write.mode("append").parquet(in)
    runOnce(streamingFirstSeen(stream), ckpt, out)
    val ids = spark.read.parquet(out).collect().map(_.getAs[Long]("doc_id")).sorted
    // 4 deduped by state RESTORED from the checkpoint, not in-memory state
    assert(ids.toSeq === Seq(1L, 3L, 5L))
  }

  test("a v1-format checkpoint fails the resumed query loudly instead of silently re-emitting") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val in = fsTmp("fs_v1_in"); val ckpt = fsTmp("fs_v1_ckpt")
    val out = fsTmp("fs_v1_out")
    def stream = spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .parquet(in).as[Doc]
    // the v1 implementation, replicated byte-for-byte in state terms:
    // raw exactKey strings with null -> "" (no sentinel prefix) and a
    // BOOLEAN state value — what pre-fix checkpoints actually contain
    def v1FirstSeen(docs: org.apache.spark.sql.Dataset[Doc]) = docs
      .groupByKey(d => if (d.text == null) ""
        else graft.functions.CollapseWs.normalizeString(d.text))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: String, batch: Iterator[Doc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(batch.minBy(_.doc_id)) }
      }
    Seq(Doc(1L, ts(1), "The quick brown fox"), Doc(3L, ts(2), "Something else"))
      .toDS().coalesce(1).write.mode("append").parquet(in)
    runOnce(v1FirstSeen(stream), ckpt, out)
    assert(spark.read.parquet(out).count() === 2) // v1 checkpoint now populated
    // resuming the CURRENT operator on that checkpoint must abort at the
    // first stateful batch (Boolean vs Int state schema), not run to
    // completion silently missing every persisted key
    Seq(Doc(4L, ts(3), "the quick brown fox")) // dup v1 would re-emit silently
      .toDS().coalesce(1).write.mode("append").parquet(in)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(streamingFirstSeen(stream), ckpt, out)
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => String.valueOf(x.getMessage)).toSeq
    val msgs = chain(e).mkString(" | ").toLowerCase
    assert(msgs.contains("state") && (msgs.contains("schema") || msgs.contains("compatible")),
      s"expected a state-schema incompatibility, got: $msgs")
    // and nothing was appended by the aborted run
    assert(spark.read.parquet(out).count() === 2)
  }
}
