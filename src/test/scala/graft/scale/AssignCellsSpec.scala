package graft.scale

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Per-row parity of the r21 BestCell-kernel `assignCells` against the
 * cross-join + groupBy + max(struct(sim, cell)) form it replaced
 * (`assignCellsGrouped`, kept as the semantic reference) — including
 * every degenerate case the struct-max ordering decides: null vectors,
 * null elements, NaN, zero norms (d == 0 → sim = 0.0 even when the dot
 * would be null), length mismatches, and exact ties resolving to the
 * larger cell. Plus the plan-shape claim the rewrite exists for: the
 * new assignment is exchange-free over the corpus.
 */
class AssignCellsSpec extends SparkTestBase {
  import spark.implicits._

  private def centroids3 = Seq(
    (0, Seq(1f, 0f, 0f, 0f)),
    (1, Seq(0f, 1f, 0f, 0f)),
    (2, Seq(0f, 0f, 1f, 0f))).toDF("cell", "cvec")

  test("separable vectors: kernel and grouped forms assign identically") {
    val corpus = Seq(
      (10L, Seq(0.9f, 0.1f, 0f, 0f)),
      (11L, Seq(0f, 2f, 0.1f, 0f)),
      (12L, Seq(0.2f, 0f, 5f, 0f)),
      (13L, Seq(0.5f, 0.5f, 0.5f, 0.5f))).toDF("id", "v")
    val kernel = Similarity.assignCells(corpus, "v", "id", centroids3)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val grouped = Similarity.assignCellsGrouped(corpus, "v", "id", centroids3)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kernel === grouped)
    assert(kernel === Map(10L -> 0, 11L -> 1, 12L -> 2, 13L -> 2))
  }

  test("degenerate rows decide exactly like max(struct(sim, cell))") {
    // null vector, null element, NaN element, zero vector, wrong length —
    // each makes every (or some) sim null/NaN/0.0; the winner must match
    // the grouped form's struct-max on every row
    val corpus = Seq(
      (20L, Option(Seq(Option(1f), Option(2f), Option(0f), Option(0f)))),
      (21L, None),                                              // null vec
      (22L, Option(Seq(Option(1f), None, Option(0f), Option(0f)))), // null elem
      (23L, Option(Seq(Option(Float.NaN), Option(1f), Option(0f), Option(0f)))),
      (24L, Option(Seq(Option(0f), Option(0f), Option(0f), Option(0f)))), // zero
      (25L, Option(Seq(Option(1f), Option(1f))))                // wrong length
    ).toDF("id", "v")
    val kernel = Similarity.assignCells(corpus, "v", "id", centroids3)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    val grouped = Similarity.assignCellsGrouped(corpus, "v", "id", centroids3)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(kernel === grouped)
    // all-null sims fall back to the LARGEST cell id — the struct-max rule
    assert(kernel(21L) === 2)
    assert(kernel(22L) === 2)
    assert(kernel(25L) === 2)
  }

  test("zero-norm centroid and exact ties resolve to the larger cell") {
    val cents = Seq(
      (0, Seq(0f, 0f)),   // zero centroid: d == 0 → sim = 0.0
      (3, Seq(1f, 1f)),
      (7, Seq(1f, 1f))    // duplicate of cell 3: exact tie → 7 wins
    ).toDF("cell", "cvec")
    val corpus = Seq((1L, Seq(2f, 2f)), (2L, Seq(-1f, -1f))).toDF("id", "v")
    val kernel = Similarity.assignCells(corpus, "v", "id", cents)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val grouped = Similarity.assignCellsGrouped(corpus, "v", "id", cents)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kernel === grouped)
    assert(kernel(1L) === 7, "exact cosine tie must take the larger cell")
    assert(kernel(2L) === 0, "negative cosines lose to the zero-norm centroid's 0.0")
  }

  test("empty centroid table assigns nothing (cross-join parity)") {
    val cents = Seq.empty[(Int, Seq[Float])].toDF("cell", "cvec")
    val corpus = Seq((1L, Seq(1f, 0f))).toDF("id", "v")
    assert(Similarity.assignCells(corpus, "v", "id", cents).count() === 0)
    assert(Similarity.assignCellsGrouped(corpus, "v", "id", cents).count() === 0)
  }

  test("cell dtype follows the centroid table; corpus columns ride through") {
    val centsLong = Seq((5L, Seq(1f, 0f))).toDF("cell", "cvec")
    val corpus = Seq((1L, "a", Seq(1f, 0f))).toDF("id", "tag", "v")
    val out = Similarity.assignCells(corpus, "v", "id", centsLong)
    assert(out.schema("cell").dataType === org.apache.spark.sql.types.LongType)
    assert(out.columns.toSet === Set("id", "tag", "v", "cell"))
    assert(out.select("id", "tag", "cell").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq === Seq((1L, "a", 5L)))
  }

  test("packed-row ceiling: at the boundary assigns, one element over raises") {
    // cells × dim = 3 × 4 = 12 elements. Ceiling 12 passes; 11 raises
    // loudly (the r22 guard on the single-row broadcast's size).
    val corpus = Seq((1L, Seq(1f, 0f, 0f, 0f))).toDF("id", "v")
    assert(Similarity.assignCells(corpus, "v", centroids3, maxPackedElems = 12L)
      .count() === 1)
    val e = intercept[Exception] {
      Similarity.assignCells(corpus, "v", centroids3, maxPackedElems = 11L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packed centroid row")),
      s"expected the packed-row ceiling error, got: $e")
  }

  test("a pre-existing 'cell' column is rejected instead of clobbered") {
    val corpus = Seq((1L, 9, Seq(1f, 0f, 0f, 0f))).toDF("id", "cell", "v")
    val e = intercept[IllegalArgumentException] {
      Similarity.assignCells(corpus, "v", "id", centroids3)
    }
    assert(e.getMessage.contains("'cell' column"))
  }

  test("the assignment is exchange-free over the corpus") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val corpus = Seq((1L, Seq(1f, 0f, 0f, 0f))).toDF("id", "v")
    val df = Similarity.assignCells(corpus, "v", "id", centroids3)
    df.count() // finalize the adaptive plan
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    // the one permitted exchange is the CENTROID packing (a
    // SinglePartition gather of k rows into the broadcast array); the
    // corpus side must stay exchange-free — no hash partitioning anywhere
    val shuffles = executed.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.forall(s =>
      s.outputPartitioning.numPartitions == 1 &&
        s.toString.contains("collect_list")),
      s"assignCells must not shuffle the corpus, found: $shuffles")
  }
}
