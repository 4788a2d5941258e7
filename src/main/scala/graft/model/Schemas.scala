package graft.model

import org.apache.spark.sql.types._

/** The canonical molecule record every source normalizes into —
  * mirrors the reference's central tuple
  * (/root/reference/src/open_molecule_data_pipeline/ingestion/common.py:22-28):
  * `{source, identifier, smiles, metadata}`.
  *
  * `metadata` is MAP<STRING,STRING>: the reference's open dict is
  * string-valued in every producing path (SDF tags, ZINC columns), and
  * pinning the value type keeps the Parquet/NDJSON schema stable across
  * billions of rows — a requirement the reference's schemaless JSON
  * sink never had to meet.
  */
final case class MoleculeRecord(
    source: String,
    identifier: String,
    smiles: String,
    metadata: Map[String, String])

object Schemas {
  val molecule: StructType = StructType(Seq(
    StructField("source", StringType, nullable = false),
    StructField("identifier", StringType, nullable = true),
    StructField("smiles", StringType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))
}
