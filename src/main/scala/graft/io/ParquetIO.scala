package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.util.concurrent.ConcurrentHashMap

/**
 * Parquet reads with a JVM-wide inferred-schema cache.
 *
 * `spark.read.parquet(path)` re-runs footer-based schema inference on
 * every call — measured at 60–90 ms of driver-side constant per read at
 * sf0.1 (tools/JobPhaseProbe: a read with an explicit schema is ~7 ms,
 * inferred ~70 ms), which is most of a declarative job's build cost and
 * recurring overhead for a job-per-minute control plane re-reading the
 * same inputs. The cache keys the inferred StructType on the path's
 * recursive file listing (name:length:mtime per file), so ANY file
 * change — overwrite, append, new partition directory — changes the
 * fingerprint and re-infers; a stale schema is never replayed over
 * changed data. The listing itself is one filesystem LIST (the scan
 * relists anyway) and is capped: paths with more than `MaxFingerprint`
 * files skip the cache entirely — at that size the query's runtime
 * dwarfs inference and an unbounded LIST would cost more than it saves.
 *
 * The schema is whatever inference yields under the session's active
 * confs (e.g. `spark.sql.legacy.parquet.nanosAsLong`); callers that
 * toggle such confs between reads of the SAME path should bypass the
 * cache (not a pattern this codebase has).
 */
object ParquetIO {

  private val MaxFingerprint = 1024

  /** path -> (listing fingerprint, inferred schema) */
  private val schemaCache = new ConcurrentHashMap[String, (String, StructType)]()

  def read(spark: SparkSession, path: String): DataFrame =
    fingerprint(spark, path) match {
      case None => spark.read.parquet(path)
      case Some(fp) =>
        val hit = schemaCache.get(path)
        val schema =
          if (hit != null && hit._1 == fp) hit._2
          else {
            val s = spark.read.parquet(path).schema
            schemaCache.put(path, (fp, s))
            s
          }
        spark.read.schema(schema).parquet(path)
    }

  /** Recursive listing digest, or None when the path is unlistable
    * (nonexistent — let spark.read produce its own error) or too large
    * to fingerprint cheaply. */
  private def fingerprint(spark: SparkSession, pathStr: String): Option[String] =
    try {
      val p = new org.apache.hadoop.fs.Path(pathStr)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val it = fs.listFiles(p, true)
      val sb = new StringBuilder
      var n = 0
      while (it.hasNext && n <= MaxFingerprint) {
        val f = it.next()
        sb.append(f.getPath.toUri.getPath).append(':')
          .append(f.getLen).append(':')
          .append(f.getModificationTime).append(';')
        n += 1
      }
      if (n > MaxFingerprint) None else Some(sb.toString)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Test seam: forget everything (e.g. between suites sharing a tmp dir). */
  private[graft] def clearCache(): Unit = schemaCache.clear()
}
