package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle plumbing shared by the incremental stores (the digest,
  * gram-df, and band-key tables of q98/q151/q124): compaction for the
  * two that lacked an explicit one, and the staleness audit a 100 TB
  * deployment runs daily against every store — how many rows, how
  * many landed waves, how much dead weight a compaction would fold,
  * and when the store was last written. The audit's file-layout half
  * reads TABLE METADATA ONLY (the bucketed layout's one-file-per-
  * bucket-per-wave law makes wave count a directory listing); the
  * dead-weight half is one aggregate over the store's key columns —
  * no probe, no join, no text.
  */
object Stores {

  /** Drop a managed store table AND its warehouse directory: with the
    * in-memory catalog the table registration dies with the session
    * but its location survives, and the next CREATE fails with
    * LOCATION_ALREADY_EXISTS — so a rebuild-from-scratch (the q163
    * planted lifecycle, or any dev session) must clear both.
    */
  def dropStoreTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = new java.io.File(wh, table)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  /** Rewrite a digest store as DISTINCT digests, preserving the
    * bucketed+sorted layout — the [[Dedup.compactBandStore]] dance
    * (temp table because Spark refuses to overwrite a table its own
    * plan reads). Dead rows arise from at-least-once replays of
    * `appendToDigestStore`.
    */
  def compactDigestStore(spark: SparkSession, table: String,
      buckets: Int = 64): Unit = {
    val tmp = s"${table}__compact"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.table(table).distinct()
      .repartition(buckets, col("digest"))
      .write.bucketBy(buckets, "digest").sortBy("digest")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    ()
  }

  /** Compact a gram-df store by FOLDING: per-wave (dg, df) rows SUM
    * into one row per digest (df counts are additive across waves —
    * disjoint doc-id sets — which is the very property the probe's
    * read-side sum relies on, q151). A plain distinct would be wrong
    * here: two waves can legitimately carry the same dg with
    * different df.
    */
  def compactGramDfStore(spark: SparkSession, table: String,
      buckets: Int = 64): Unit = {
    val tmp = s"${table}__compact"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.table(table).groupBy("dg").agg(sum("df").as("df"))
      .repartition(buckets, col("dg"))
      .write.bucketBy(buckets, "dg").sortBy("dg")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    ()
  }

  private def bucketFileCounts(spark: SparkSession, table: String): Seq[Int] = {
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location
    val files = Option(new java.io.File(loc).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val bucketId = raw"_(\d{5})\.".r
    files.toSeq
      .flatMap(f => bucketId.findFirstMatchIn(f.getName).map(_.group(1)))
      .groupBy(identity).values.map(_.size).toSeq
  }

  /** One audit row for one store table:
    *
    *   (store, total_rows, distinct_keys, dead_rows, dead_e6,
    *    waves, compacted)
    *
    * `waves` = max parquet files per bucket, read from the table's
    * directory listing alone: every `write`/`append` repartitions by
    * the bucket column with the bucket hash, so each wave lands
    * EXACTLY ONE file per touched bucket (the store layout law,
    * plan-pinned in DigestStoreSpec) and compaction collapses the
    * count back to 1. `dead_rows` = total − distinct over `keyCols`
    * (replayed appends for digest/band stores, foldable per-wave df
    * rows for the gram store); `dead_e6` is the millionths fraction a
    * compaction would reclaim — the number that decides whether to
    * spend the rewrite.
    */
  def auditStore(spark: SparkSession, table: String, store: String,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val counts = bucketFileCounts(spark, table)
    val waves = if (counts.isEmpty) 0 else counts.max
    spark.table(table)
      .agg(count(lit(1)).as("total_rows"),
        count_distinct(struct(keyCols.map(col): _*)).as("distinct_keys"))
      .select(lit(store).as("store"), col("total_rows"), col("distinct_keys"),
        (col("total_rows") - col("distinct_keys")).as("dead_rows"),
        when(col("total_rows") > 0L,
          expr("((total_rows - distinct_keys) * 1000000) div total_rows"))
          .otherwise(0L).as("dead_e6"),
        lit(waves.toLong).as("waves"),
        lit(waves <= 1).as("compacted"))
  }

  /** [[auditStore]] over several stores — the daily ops dashboard. */
  def auditStores(spark: SparkSession,
      stores: Seq[(String, String, Seq[String])]): DataFrame =
    stores.map { case (table, name, keys) => auditStore(spark, table, name, keys) }
      .reduce(_ unionByName _).orderBy("store")

  /** Wave-gap audit over a batch_id-landed directory store (the
    * ivfPqMaintainStream / scd2Stream / sketch-store layout): batch
    * ids present, the contiguous range they should span, and the
    * MISSING ids inside it — a gap means a wave's landing was lost
    * after its offsets committed (the at-least-once window every
    * idempotent-landing store tolerates but an operator must notice
    * and replay). Directory listing only, no data scan.
    */
  def waveGaps(spark: SparkSession, dir: String): DataFrame = {
    val ids = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .flatMap(f => scala.util.Try(f.getName.stripPrefix("batch_id=").toLong).toOption)
      .sorted
    val missing =
      if (ids.isEmpty) Seq.empty[Long]
      else (ids.head to ids.last).filterNot(ids.toSet)
    import spark.implicits._
    Seq((ids.length.toLong,
      if (ids.isEmpty) -1L else ids.head,
      if (ids.isEmpty) -1L else ids.last,
      missing))
      .toDF("n_waves", "first_batch", "last_batch", "missing_batches")
  }

  /** Layout-only staleness (NO data scan — file metadata alone): file
    * and bucket counts, wave depth, and the newest file's modification
    * time, the freshness signal an ops dashboard alerts on when a
    * store stops receiving appends.
    */
  def layoutAudit(spark: SparkSession, table: String, store: String): DataFrame = {
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location
    val files = Option(new java.io.File(loc).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val counts = bucketFileCounts(spark, table)
    import spark.implicits._
    Seq((store, files.length.toLong, counts.size.toLong,
      (if (counts.isEmpty) 0 else counts.max).toLong,
      counts.forall(_ <= 1),
      if (files.isEmpty) 0L else files.map(_.lastModified()).max))
      .toDF("store", "n_files", "buckets_touched", "waves", "compacted",
        "last_write_ms")
  }
}
