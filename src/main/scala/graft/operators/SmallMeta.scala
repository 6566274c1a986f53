package graft.operators

import org.apache.spark.sql.{Row, SparkSession}

/** Driver-side cache for 1-row persisted meta/params parquet frames
  * (MinHash index meta, winnowing params, BM25 meta). Every read was a
  * full `spark.read.parquet(...).head()` — one Spark job per call — and
  * the history-probe operators re-read their pinned parameters on every
  * batch at serving scale. Keyed by the dir's file listing
  * (name:length:mtime), so an external rewrite (another JVM's append/
  * rebuild) invalidates the entry — the
  * [[graft.operators.StatsSketch]] metaCache discipline, shared.
  * Metadata only, never query results.
  */
private[graft] object SmallMeta {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Row)]()

  private def fingerprint(spark: SparkSession, dir: String): Option[String] =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      Some(fs.listStatus(p).filter(_.isFile)
        .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
        .sorted.mkString("|"))
    } catch { case _: java.io.FileNotFoundException => None }

  /** First row of the parquet frame at `dir`, cached until the dir's
    * files change. A missing dir raises the same AnalysisException an
    * uncached read always has.
    */
  def headRow(spark: SparkSession, dir: String): Row =
    fingerprint(spark, dir) match {
      case None => spark.read.parquet(dir).head() // missing: original error
      case Some(fp) =>
        val hit = cache.get(dir)
        if (hit != null && hit._1 == fp) hit._2
        else {
          val r = spark.read.parquet(dir).head()
          cache.put(dir, (fp, r))
          r
        }
    }
}
