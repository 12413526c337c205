package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.scale.Similarity

/** Dev-only scratch: empirical HOF planeSums edge-case semantics. */
object HofProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dim = 4; val planes = 3
    val vNull: Seq[java.lang.Float] =
      Seq(1.0f, null, 1.0f, 1.0f).map(x => x.asInstanceOf[java.lang.Float])
    val df = Seq(
      (1, Seq[java.lang.Float](1.0f, 1.0f, 1.0f, 1.0f)),
      (2, Seq[java.lang.Float](1.0f, 1.0f)),          // short
      (3, Seq[java.lang.Float](1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f)), // long
      (4, Seq.empty[java.lang.Float]),                // empty
      (5, null.asInstanceOf[Seq[java.lang.Float]]),   // null
      (6, vNull),                                     // null element
      (7, Seq[java.lang.Float](1.0f, 1.0f, 1.0f, null.asInstanceOf[java.lang.Float])) // null LAST
    ).toDF("id", "v")
    df.select(col("id"), Similarity.planeSumsHof(col("v"), dim, planes).as("h"))
      .orderBy(col("id"))
      .collect().foreach(r => println(s"id=${r.getInt(0)} h=${if (r.isNullAt(1)) "NULL" else r.getSeq[Any](1)}"))
    // simhashBlocks HOF edge cases: null text, empty text, blank text
    val tdf = Seq((1, "hello world of text"), (2, ""), (3, "   "),
      (4, null.asInstanceOf[String])).toDF("id", "text")
    tdf.select(col("id"), graft.scale.Dedup.simhashBlocksHof(col("text")).as("b"))
      .orderBy(col("id"))
      .collect().foreach(r => println(s"sid=${r.getInt(0)} b=${if (r.isNullAt(1)) "NULL" else r.getSeq[Any](1)}"))
    spark.stop()
  }
}
