package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Dead-letter / tolerant-decode semantics (SURVEY.md §2B "DLQ =
  * badRecordsPath / columnNameOfCorruptRecord"; §4 "tolerant decoding"):
  * malformed rows are captured as error-side output instead of
  * aborting the scan — the engine's upgrade of the reference's
  * log-and-skip behavior.
  */
class DlqSpec extends SparkSpec {

  test("PERMISSIVE json scan routes malformed rows to the corrupt column") {
    val dir = tmpDir("dlq")
    Files.writeString(Paths.get(s"$dir/data.jsonl"),
      """{"identifier":"id1","smiles":"CCO"}
        |this is not json at all
        |{"identifier":"id2","smiles":"C"}
        |{"identifier":"id3","smiles":{"nested":true}}
        |""".stripMargin)
    val df = spark.read
      .schema("identifier STRING, smiles STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-record queries require materialization first
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    // nested objects coerce to their JSON text for STRING fields — only
    // the syntactically-broken line is corrupt
    assert(good.count() === 3)
    assert(bad.count() === 1, "only the garbage line is malformed")
    // error-side output: the raw text is preserved for the DLQ sink
    assert(bad.collect().map(_.getString(2)).exists(_.contains("not json")))
    df.unpersist()
  }

  test("CSV scan with DROPMALFORMED silently drops bad rows; PERMISSIVE keeps them") {
    val dir = tmpDir("dlq_csv")
    // short rows are null-padded, not malformed; EXTRA tokens are malformed
    Files.writeString(Paths.get(s"$dir/d.csv"), "1,a\n2,b\n5,c,EXTRA,EXTRA\n3,d\n")
    val schema = "k LONG, v STRING"
    val dropped = spark.read.schema(schema).option("mode", "DROPMALFORMED").csv(dir)
    // count() prunes all columns and never parses rows — malformed
    // detection requires materializing the schema
    assert(dropped.select("k", "v").collect().length === 3)
    val kept = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(dir)
    assert(kept.count() === 4)
    // type-cast failures are null-filled, not malformed: still 4 rows
    Files.writeString(Paths.get(s"$dir/d.csv"), "1,a\n2,b\nnot_a_number,c\n3,d\n")
    assert(spark.read.schema(schema).option("mode", "PERMISSIVE").csv(dir)
      .filter(col("k").isNull).count() === 1)
  }
}
