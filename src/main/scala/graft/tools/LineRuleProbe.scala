package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table

/** Dev-only: paired measurement of gopherRules' five line/symbol
  * counts — the composed five-scan form (regexp_replace '#' strip,
  * regexp_count ellipsis, split-\n line count, two (?dm) multiline
  * regexp_counts) vs the single-pass GopherLineStats kernel, plus each
  * composed scan alone so the bill is attributable. Run:
  *   sbt "runMain graft.tools.LineRuleProbe /root/testdata/sf0.1 10 10 10"
  */
object LineRuleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(1, 10, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-38s sum=$n%-12d $dt%.2f s")
      dt
    }
    val tcol = col("text")
    val nHash = length(tcol) - length(regexp_replace(tcol, "#", ""))
    val nEll = regexp_count(tcol, lit("(\\.\\.\\.|\\u2026)"))
    val nLines = size(split(tcol, "\n"))
    val nBullet = regexp_count(tcol, lit("(?dm)^[ \\t]*[-*\\u2022\\u2023\\u25AA]"))
    val nEllEnd = regexp_count(tcol, lit("(?dm)(\\.\\.\\.|\\u2026)[ \\t]*$"))
    for (fac <- factors) {
      println(s"--- factor ${fac}x ---")
      val docs = CurationProbe.replicateDocs(table(spark, dir, "documents"), fac)
        .repartition(32).persist()
      docs.count()
      t(s"five scans composed ${fac}x") {
        docs.select((nHash + nEll + nLines + nBullet + nEllEnd).as("s"))
          .agg(sum(col("s"))).head().getLong(0)
      }
      t(s"GopherLineStats kernel ${fac}x") {
        val st = graft.functions.GopherLineStats.stats(tcol)
        docs.select((st.getField("n_hash") + st.getField("n_ell") +
            st.getField("n_lines") + st.getField("n_bullet") +
            st.getField("n_ell_end")).as("s"))
          .agg(sum(col("s"))).head().getLong(0)
      }
      t(s"  nHash regexp_replace alone ${fac}x") {
        docs.select(nHash.as("s")).agg(sum(col("s"))).head().getLong(0)
      }
      t(s"  nEll regexp_count alone ${fac}x") {
        docs.select(nEll.as("s")).agg(sum(col("s"))).head().getLong(0)
      }
      t(s"  nLines split alone ${fac}x") {
        docs.select(nLines.as("s")).agg(sum(col("s"))).head().getLong(0)
      }
      t(s"  nBullet (?dm) alone ${fac}x") {
        docs.select(nBullet.as("s")).agg(sum(col("s"))).head().getLong(0)
      }
      t(s"  nEllEnd (?dm) alone ${fac}x") {
        docs.select(nEllEnd.as("s")).agg(sum(col("s"))).head().getLong(0)
      }
      t(s"  length-only floor ${fac}x") {
        docs.select(length(tcol).cast("long").as("s"))
          .agg(sum(col("s"))).head().getLong(0)
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
