package graft.scale

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = Paths.get("target", "test-tmp", "kmeans", name)
    Files.createDirectories(p.getParent)
    p.toString
  }

  /** Three well-separated clusters on coordinate axes of dim 8. */
  private def fixture() = {
    val base = Seq(0, 1, 2).flatMap { c =>
      (0 until 20).map { i =>
        val v = Array.fill(8)(0.05f * ((i + c) % 3))
        v(c * 2) = 10f + (i % 5) * 0.1f // dominant axis per cluster
        (s"doc-$c-$i", c, v.toSeq)
      }
    }
    base.toDF("id", "true_cluster", "embedding")
  }

  test("train recovers separable clusters; empty cells keep their centroid") {
    val df = fixture()
    val centroids = KMeans.train(df, "embedding", k = 3, iters = 4)
    assert(centroids.count() === 3)
    // assignment must be pure within true clusters: every true cluster
    // maps to exactly one learned cell and no cell is shared
    val assigned = Similarity.assignCells(df, "embedding", "id", centroids)
    val purity = assigned.groupBy(col("true_cluster"))
      .agg(countDistinct(col("cell")).as("n_cells")).collect()
    assert(purity.forall(_.getLong(1) === 1L))
    assert(assigned.select(countDistinct(col("cell"))).head.getLong(0) === 3L)
    // determinism: same data, same centroids
    val again = KMeans.train(df, "embedding", k = 3, iters = 4)
    assert(centroids.orderBy(col("cell")).collect().toSeq ===
      again.orderBy(col("cell")).collect().toSeq)
    centroids.unpersist(); again.unpersist()
  }

  test("bucketed index prunes partitions: a probe scans only nprobe cells") {
    val df = fixture()
    val centroids = KMeans.train(df, "embedding", k = 3, iters = 3)
    val idx = tmp("ivf_idx")
    KMeans.indexBucketed(df, "embedding", "id", centroids, idx)
    // index layout: one directory per cell
    val cellDirs = Files.list(Paths.get(idx)).iterator()
    val dirs = scala.collection.mutable.ArrayBuffer[String]()
    while (cellDirs.hasNext) {
      val n = cellDirs.next().getFileName.toString
      if (n.startsWith("cell=")) dirs += n
    }
    assert(dirs.sorted.toSeq === Seq("cell=0", "cell=1", "cell=2"))

    // a query near cluster 0's axis: top-k comes back from that cluster
    val q = Array.fill(8)(0f); q(0) = 1f
    val hits = KMeans.searchBucketed(spark, idx, "embedding", "id",
      centroids, q.toSeq, k = 5, nprobe = 1)
    val rows = hits.collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getString(0).startsWith("doc-0-")))
    // pruning is STATIC (isin over the driver-resolved probe cells) and
    // provable from the executed scan's own metrics: exactly 1 of the 3
    // cell directories was read
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val executed = hits.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val scan = executed.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail(s"no FileSourceScanExec in:\n$executed"))
    assert(scan.metrics("numPartitions").value === 1,
      s"expected 1 of 3 cell directories read, metrics: ${scan.metrics}")
    centroids.unpersist()
  }

  test("batch probe: per-query cells, one pruned scan, top-k per query") {
    val df = fixture()
    val centroids = KMeans.train(df, "embedding", k = 3, iters = 3)
    val idx = tmp("ivf_idx_many")
    KMeans.indexBucketed(df, "embedding", "id", centroids, idx)
    // one query near each cluster's axis; nprobe=1 → every query's hits
    // must come from its own cluster only
    val queries = Seq(0, 1, 2).map { c =>
      val v = Array.fill(8)(0f); v(c * 2) = 1f
      (s"q$c", v.toSeq)
    }.toDF("query_id", "qvec")
    val hits = KMeans.searchBucketedMany(spark, idx, "embedding", "id",
      centroids, queries, "query_id", "qvec", k = 4, nprobe = 1)
    val rows = hits.collect()
    assert(rows.length === 12, s"4 hits per query, got ${rows.length}")
    rows.foreach { r =>
      val (qid, id, rank) = (r.getString(0), r.getString(2), r.getInt(1))
      assert(id.startsWith(s"doc-${qid.drop(1)}-"),
        s"query $qid rank $rank hit $id from a foreign cluster")
    }
    // the union of probed cells is all 3 here, but only 3 directories
    // exist — pin that the scan carries the static isin filter (the
    // plan-time pruning contract), not a full unfiltered read path
    assert(hits.queryExecution.executedPlan.toString.contains("cell"),
      "scan must filter on the probed cells")
    OpCaches.drain()
    centroids.unpersist()
  }
}
