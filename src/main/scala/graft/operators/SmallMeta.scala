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
  *
  * Staleness bound (ADVICE r15): the fingerprint is only as fine as the
  * filesystem's mtime granularity — a rewrite that preserves every part
  * file's name AND length within one mtime tick is indistinguishable
  * from no change. The persisted-index writers all stage fresh part
  * files per write (new task UUIDs → new names), so in-repo writers
  * always change the listing; the residual assumption, documented here,
  * is single-writer-per-index for EXTERNAL writers that deliberately
  * replay identical file names and lengths inside one mtime tick.
  *
  * The cache is bounded (LRU, [[MaxEntries]]) and keyed by the dir's
  * normalized URI, so a long-lived serving JVM probing many index dirs
  * (or one dir under several spellings) cannot grow it without bound.
  */
private[graft] object SmallMeta {

  private val MaxEntries = 256

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (String, Row)](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Row)]): Boolean =
        size() > MaxEntries
    })

  private def cacheKey(dir: String): String =
    new org.apache.hadoop.fs.Path(dir).toUri.toString

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
        val key = cacheKey(dir)
        val hit = cache.get(key)
        if (hit != null && hit._1 == fp) hit._2
        else {
          val r = spark.read.parquet(dir).head()
          cache.put(key, (fp, r))
          r
        }
    }
}
