package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.table
import graft.scale._

/** Dev-only: scaling + recall evidence for the IVF approximate-search
  * path (`KMeans.train` → `indexBucketed` → `searchBucketed`), the stage
  * family ScaleProbe covers for the dedup operators.
  *
  * Measures, at `factor`x the sf0.1 embeddings corpus (isometric
  * replicas via ScaleProbe.replicateEmb):
  *  - k-means training wall time at the sqrt-n cell rule;
  *  - one-off bucketed-index build time (the amortized cost);
  *  - per-query `searchBucketed` wall time and recall@10 vs exact
  *    brute-force, swept over nprobe — the curve the nprobe default is
  *    derived from;
  *  - the in-plan `ivfTopK` (no prebuilt index) for reference, which
  *    re-assigns the corpus per query and is expected to cost ~brute
  *    force: the probe exists to show WHERE the IVF payoff lives (the
  *    bucketed layout), not to flatter the unindexed path.
  *
  * Usage: runMain graft.tools.IvfProbe [sfDir] [factor] [queries]
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val nQueries = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val emb1 = table(spark, dir, "embeddings")
    val corpus = ScaleProbe.replicateEmb(emb1, factor).repartition(32).persist()
    val n = corpus.count()
    val kcells = Similarity.ivfCellsFor(n)
    println(s"corpus n=$n kcells=$kcells (sqrt-n rule) queries=$nQueries")

    // probe queries: the base replica's first vectors, collected once
    // (driver-side is fine in a dev probe; the engine path never collects)
    val queries = emb1.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    val (centroids, tTrain) = timed {
      val c = KMeans.train(corpus, "embedding", kcells, iters = 3)
      c.count(); c
    }
    println(f"kmeans train (k=$kcells, 3 iters): $tTrain%.1f s")

    val idx = s"/tmp/ivfprobe_idx_$factor"
    val (_, tIndex) = timed(KMeans.indexBucketed(
      corpus, "embedding", "vec_id", centroids, idx))
    println(f"indexBucketed (one-off): $tIndex%.1f s")

    // exact truth per query — brute force with the same rounding as the
    // probe path so boundary ties compare equal
    def q(vec: Seq[Float]) = array(vec.map(v => lit(v)): _*)
    val truth: Map[Long, Set[Long]] = queries.map { case (qid, vec) =>
      qid -> corpus
        .select(col("vec_id"), round(Similarity.cosine(col("embedding"), q(vec)), 6).as("c"))
        .orderBy(col("c").desc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    val (_, tBrute) = timed {
      val (qid, vec) = queries.head
      corpus.select(col("vec_id"), round(Similarity.cosine(col("embedding"), q(vec)), 6).as("c"))
        .orderBy(col("c").desc, col("vec_id").asc).limit(10).collect()
    }
    println(f"brute-force per query: $tBrute%.2f s")

    for (nprobe <- Seq(1, 2, 4, 8, 16, 32).filter(_ <= kcells)) {
      var tot = 0.0; var hit = 0
      queries.foreach { case (qid, vec) =>
        val (ids, dt) = timed {
          KMeans.searchBucketed(spark, idx, "embedding", "vec_id",
            centroids, vec, k = 10, nprobe = nprobe)
            .collect().map(_.getLong(0)).toSet
        }
        tot += dt; hit += ids.intersect(truth(qid)).size
      }
      val recall = hit.toDouble / (10 * queries.length)
      println(f"searchBucketed nprobe=$nprobe%-3d recall@10=$recall%.3f  " +
        f"per-query=${tot / queries.length}%.2f s")
    }

    // batch probe (searchBucketedMany): amortization of the per-probe
    // floor across query-batch sizes — the line that justifies batching
    for (nq <- Seq(1, 8, 64, 256)) {
      import spark.implicits._
      val qdf = emb1.filter(col("vec_id") < nq)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val ((rows, hit), tMany) = timed {
        val got = KMeans.searchBucketedMany(spark, idx, "embedding", "vec_id",
          centroids, qdf, "query_id", "qvec", k = 10, nprobe = 2)
          .collect()
        val byQ = got.groupBy(_.getLong(0))
        val h = byQ.collect { case (qid, rs) if truth.contains(qid) =>
          rs.map(_.getLong(2)).toSet.intersect(truth(qid)).size }.sum
        (got.length, h)
      }
      OpCaches.drain()
      val checked = math.min(nq, queries.length)
      println(f"searchBucketedMany nq=$nq%-4d rows=$rows%-6d " +
        f"recall@10(first $checked)=${hit.toDouble / (10 * checked)}%.3f " +
        f"total=$tMany%.2f s per-query=${tMany / nq}%.3f s")
    }

    // unindexed in-plan path, one setting, for the comparison line
    val (ids0, tPlan) = timed {
      val (qid, vec) = queries.head
      import spark.implicits._
      val qdf = Seq(Tuple1(vec)).toDF("qvec")
      Similarity.ivfTopK(corpus, "embedding", "vec_id", centroids, qdf,
        k = 10, nprobe = Similarity.ivfNprobeDefault(kcells))
        .collect().map(_.getLong(0)).toSet
    }
    println(f"in-plan ivfTopK (no index, default nprobe): $tPlan%.2f s per query")
    spark.stop()
  }
}
