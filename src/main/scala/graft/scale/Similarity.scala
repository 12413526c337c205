package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (Array[Float]).
 *
 * Tiers, by scale:
 *  - bruteForceTopK: exact cosine top-k against one query vector — a single
 *    codegen'd projection (zip_with + aggregate for the dot product) plus a
 *    top-k sort. Correctness baseline; O(n·d), embarrassingly parallel.
 *  - knnJoin: exact k-NN for every row of a (small, broadcastable) query set —
 *    broadcast the queries, one narrow pass over the corpus, per-query
 *    window top-k. No shuffle of the corpus.
 *  - ivfTopK: IVF-style approximate search — kmeans-lite centroids chosen as
 *    deterministic sample rows, every vector assigned to its nearest
 *    centroid (one pass), then the query probes only `nprobe` nearest cells.
 *    At 100 TB the assignment is written bucketed-by-cell so a query touches
 *    a small fraction of the data.
 *  - lshCosineBuckets: random-hyperplane LSH signatures (sign of dot with
 *    deterministic pseudo-random planes) for bucketed candidate retrieval.
 */
object Similarity {

  /** Dot product of two float-array columns (double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /**
   * Exact top-k by cosine against one literal query vector.
   * The query is folded into the expression tree as an array literal —
   * no join, no broadcast, just a scan + TakeOrderedAndProject.
   */
  def bruteForceTopK(corpus: DataFrame, vecCol: String, idCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    corpus.select(col(idCol), round(cosine(col(vecCol), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Exact k-NN join: for each query row, the k nearest corpus rows.
   * Queries must be broadcast-small; the corpus is streamed once.
   */
  def knnJoin(corpus: DataFrame, queries: DataFrame, vecCol: String,
              corpusId: String, queryId: String, k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(queryId).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q))
      .select(col("query_id"), col("corpus_id"),
        round(cosine(col("cvec"), col("qvec")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Deterministic pseudo-random hyperplanes: plane p, dim i weight =
   * a centered hash in [-0.5, 0.5] from xxhash64(p, i). Reproducible across
   * runs/clusters without shipping model state.
   */
  private def planeWeight(p: Int, i: Column): Column =
    (pmod(xxhash64(lit(p), i), lit(1000000)).cast("double") / 1000000.0) - 0.5

  /** Sign-of-projection LSH signature with `nPlanes` bits, as a long. */
  def lshCosineSignature(vec: Column, nPlanes: Int = 16): Column = {
    val proj = (0 until nPlanes).map { p =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeWeight(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(s > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    proj.reduce((a, b) => a.bitwiseOR(b))
  }

  /**
   * IVF-style approximate top-k: assign every corpus vector to its nearest
   * of `centroids` (collected once, broadcast as literals), probe only the
   * cells nearest to the query. `centroidRows` are (cellId, vector) pairs —
   * pick them deterministically (e.g. every n-th row) or from a prior
   * clustering job.
   */
  def assignCells(corpus: DataFrame, vecCol: String,
                  centroids: Seq[(Int, Seq[Float])]): DataFrame = {
    val scored = centroids.map { case (cid, cv) =>
      struct(cosine(col(vecCol), array(cv.map(lit(_)): _*)).as("sim"),
        lit(cid).as("cell"))
    }
    corpus.withColumn("cell", greatest(scored: _*).getField("cell"))
  }

  def ivfTopK(corpus: DataFrame, vecCol: String, idCol: String,
              centroids: Seq[(Int, Seq[Float])], query: Seq[Float],
              k: Int, nprobe: Int = 2): DataFrame = {
    val q = array(query.map(lit(_)): _*)
    val probeCells = centroids
      .map { case (cid, cv) =>
        val dotp = cv.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum
        val na = math.sqrt(cv.map(v => v.toDouble * v.toDouble).sum)
        val nb = math.sqrt(query.map(v => v.toDouble * v.toDouble).sum)
        (cid, if (na * nb == 0) 0.0 else dotp / (na * nb))
      }
      .sortBy(-_._2).take(nprobe).map(_._1)
    assignCells(corpus, vecCol, centroids)
      .filter(col("cell").isin(probeCells: _*))
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
