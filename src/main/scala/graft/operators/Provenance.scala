package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lineage / provenance stamping — the reference's declared metadata
  * contract (/root/reference/docs/system-plan.md:32: "Track provenance
  * (source, timestamp, config hash) in metadata store. Include audit
  * logs"). Each ingested record carries WHERE it came from (source
  * name), WHICH configuration produced it (md5 of the raw config
  * text), and WHEN (job-start instant) inside its `metadata` map — so
  * any downstream table can be audited back to the exact ingest run,
  * and a re-ingest under a changed config is distinguishable row-by-row
  * (golden-specced in IngestionSpec).
  *
  * Stamping is a pure codegen'd projection (map_concat of literals) —
  * no UDF, no shuffle; at 100 TB it rides the ingest scan for free.
  * Re-stamping is idempotent: prior provenance keys are filtered out
  * before the concat, so map_concat can never hit a duplicate key.
  */
object Provenance {

  val SourceKey = "_prov_source"
  val ConfigKey = "_prov_config_hash"
  val AtKey = "_prov_ingested_at"
  private val Keys = Seq(SourceKey, ConfigKey, AtKey)

  /** md5 hex of the raw config text — the config identity. Computed
    * over the BYTES the user wrote (not a re-serialization), so any
    * edit, even a comment, yields a new hash: an audit trail must
    * distinguish "same file" from "equivalent file".
    */
  def configHash(configText: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(configText.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Append provenance tags to `df`'s `metadata` map column (created
    * when absent, null-safe, prior stamps replaced).
    */
  def stamp(df: DataFrame, source: String, configHash: String,
      ingestedAt: String): DataFrame = {
    val tags = map(
      lit(SourceKey), lit(source),
      lit(ConfigKey), lit(configHash),
      lit(AtKey), lit(ingestedAt))
    val stamped: Column =
      if (df.columns.contains("metadata"))
        map_concat(
          map_filter(
            coalesce(col("metadata"), map().cast("map<string,string>")),
            (k, _) => !k.isin(Keys.map(lit): _*)),
          tags)
      else tags
    df.withColumn("metadata", stamped)
  }
}
