package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator: replicates the driver testdata at
  * `factor`× while PRESERVING the per-copy statistical structure, so a
  * factor-10 run is a fair ~linear-scaling probe (VERDICT r3 next-round
  * #1) rather than a degenerate one:
  *
  *  - `documents`: copy j suffixes every token with ASCII `~j` — a copy
  *    shares NO vocabulary with any other copy, so exact-dup groups,
  *    near-dup pairs, and df distributions replicate per copy instead
  *    of exploding quadratically across copies (a verbatim 10× copy
  *    would give every doc 10 exact dups → 45 cross-pairs each, a
  *    data-construction artifact, not an engine property).
  *  - `embeddings`: copy j flips element signs by a deterministic
  *    (j, dim) pattern — pairwise dot products WITHIN a copy are
  *    exactly preserved (s⊙a · s⊙b = a·b), while cross-copy cosines
  *    decorrelate, so planted near-neighbor structure scales linearly.
  *  - `events`: ids/users offset per copy (per-user event counts, and
  *    so session/window shapes, stay constant); `ts` kept as raw
  *    nanosecond longs exactly like the driver files.
  *  - `lineitem`+`orders`: order keys offset consistently (FK joins
  *    stay valid); dimension tables copied verbatim.
  *
  * Copy 0 is the identity, so the original corpus embeds unchanged.
  * Everything is deterministic — no RNG.
  *
  * Usage: `runMain graft.tools.ScaleGen <srcDir> <destDir> [factor]`.
  */
object ScaleGen {

  private val IdOffset = 10000000L   // doc_id / vec_id / user_id stride
  private val KeyOffset = 1000000000L // event_id / orderkey stride

  /** +1/−1 by a deterministic avalanche hash of (copy, dim). A weak
    * mixer is a trap here: the earlier `(j*1000003 + k*7919) & 1`
    * collapses to parity of j+k (both multipliers odd), which made
    * every odd copy's sign vector IDENTICAL — cross-copy exact-dup
    * vectors, precisely the measurement artifact the sign flips are
    * supposed to prevent. ScaleGenSpec pins cross-copy distinctness.
    */
  private[graft] def sign(j: Int, k: Int): Float = {
    var h = j * 0x9E3779B1 ^ (k * 0x85EBCA77)
    h ^= h >>> 16; h *= 0xC2B2AE35; h ^= h >>> 13
    if (((h >>> 8) & 1) == 0) 1.0f else -1.0f
  }

  /** Union of `factor` transformed copies; uniform input contract for
    * every scale function.
    */
  private def copies(factor: Int)(mk: Int => DataFrame): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    (0 until factor).map(mk).reduce(_ union _)
  }

  def scaleDocuments(df: DataFrame, factor: Int): DataFrame =
    copies(factor) { j =>
      if (j == 0) df
      else {
        // ASCII suffix: a multi-byte char here (the original `·`) made
        // byte-count ≠ char-count on scaled copies, silently breaking
        // every byte/char-equivalence assumption downstream (q126's
        // byte-histogram oracle diverged at 10×)
        val sfx = lit(s"~$j")
        val remapped = array_join(
          transform(graft.functions.TextFunctions.tokens(col("text")),
            t => concat(t, sfx)), " ")
        df.select(
          (col("doc_id") + lit(j * IdOffset)).as("doc_id"),
          remapped.as("text"),
          col("lang"),
          col("source"),
          length(remapped).cast("long").as("n_chars"))
      }
    }

  def scaleEmbeddings(df: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    if (factor == 1) return df
    // sign vector length = the corpus's actual dimensionality (a
    // hard-coded bound would silently NULL elements past it); empty
    // corpus → null aggregate → nothing to scale
    val dimRow = df.select(max(size(col("embedding")))).collect()(0)
    if (dimRow.isNullAt(0)) return df
    val dim = dimRow.getInt(0)
    (0 until factor).map { j =>
      if (j == 0) df
      else {
        // per-(copy, dim) sign flips; the per-copy sign vector folds
        // into the plan as literals
        df.select(
          (col("vec_id") + lit(j * IdOffset)).as("vec_id"),
          transform(col("embedding"),
            (x, k) => x * element_at(
              array((0 until dim).map(d => lit(sign(j, d))): _*), k + 1))
            .as("embedding"),
          col("label"))
      }
    }.reduce(_ union _)
  }

  def scaleEvents(df: DataFrame, factor: Int): DataFrame =
    copies(factor) { j =>
      df.select(
        (col("event_id") + lit(j * KeyOffset)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(j * IdOffset)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }

  def scaleOrders(df: DataFrame, factor: Int): DataFrame =
    copies(factor) { j =>
      df.select(
        (col("o_orderkey") + lit(j * KeyOffset)).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    }

  def scaleLineitem(df: DataFrame, factor: Int): DataFrame =
    copies(factor) { j =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(j * KeyOffset))
    }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/tmp/graft_scale/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts arrives as ns-precision parquet; keep it a raw long so
      // the written file round-trips through Tables.events unchanged
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String): Unit = {
      df.coalesce(4).write.mode(SaveMode.Overwrite).parquet(s"$dest/$name.parquet")
      System.err.println(s"[scalegen] $name: ${spark.read.parquet(s"$dest/$name.parquet").count()} rows")
    }

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")

    write(scaleDocuments(read("documents"), factor), "documents")
    write(scaleEmbeddings(read("embeddings"), factor), "embeddings")
    write(scaleEvents(read("events"), factor), "events")
    write(scaleOrders(read("orders"), factor), "orders")
    write(scaleLineitem(read("lineitem"), factor), "lineitem")
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => write(read(n), n))
    spark.stop()
  }
}
