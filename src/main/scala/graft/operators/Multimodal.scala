package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct, and
  * decode/feature steps run as partition-batched transforms.
  *
  * The actual media decode is STUBBED (this container has no image/
  * audio codecs): [[decodeStub]] derives deterministic pseudo-features
  * from the payload bytes. Everything around the stub — the schema
  * contract, `spark.read.format("binaryFile")` compatibility, the
  * mapPartitions batch shape (one codec init per partition, stream of
  * rows through it, mirroring a Pandas-UDF batch), and the
  * partition-size guidance — is real and tested.
  *
  * Scale notes: payloads dominate row width, so (a) media tables are
  * stored payload-separate (parquet with a path/offset pointer or
  * payloads in sidecar object storage) when rows exceed ~1 MB, (b)
  * `spark.sql.files.maxPartitionBytes` bounds decode-task memory, and
  * (c) feature extraction outputs (small fixed-width vectors) are
  * written to a separate gold table so downstream ANN never rescans
  * payload bytes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** Real binary-file ingestion: `spark.read.format("binaryFile")`
    * mapped into the media schema. Path/length come from the source
    * metadata; width/height stay null until decode.
    */
  def readBinaryFiles(spark: org.apache.spark.sql.SparkSession, pathGlob: String,
      mime: String = "application/octet-stream"): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("content").as("payload"),
        struct(
          lit(mime).as("mime"),
          col("length").as("n_bytes"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height")).as("meta"))

  /** Wrap any (id, string) DataFrame into the media schema with a
    * deterministic fake payload — the test-data generator for the
    * multimodal path.
    */
  def synthesize(df: DataFrame, idCol: String, textCol: String,
      mime: String = "image/fake"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit(mime).as("mime"),
        length(col(textCol)).cast("long").as("n_bytes"),
        (pmod(col(idCol).cast("long"), lit(64L)) + 1).cast("int").as("width"),
        (pmod(col(idCol).cast("long"), lit(48L)) + 1).cast("int").as("height"))
        .as("meta"))

  /** STUB decode + feature extraction: per-partition batch transform
    * producing a fixed-width feature vector per payload. A real
    * deployment swaps `fakeDecode` for a codec call; the partition
    * batching (init once, stream rows) is the part that matters.
    */
  def decodeStub(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("features", ArrayType(FloatType), nullable = true)))
    val rows: Dataset[Row] = media.mapPartitions { it =>
      // one-time per-partition "codec init" happens here
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq :+ fakeDecode(payload, dim))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    rows
  }

  /** Deterministic pseudo-decode: byte histogram folded into `dim`
    * buckets, normalized. Stands in for image decode + pooling.
    */
  private[operators] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null) return Array.fill(dim)(0.0f)
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1.0f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    acc.map(_ / n)
  }

  /** "Resize": stub that rewrites the metadata dimensions (payload
    * untouched — a real impl would transcode in the same partition
    * batch).
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      lit(w).as("width"), lit(h).as("height")))

  /** Perceptual near-dup candidates over binary payloads — the
    * multimodal counterpart of the text LSH tier, routed through the
    * SAME sign-LSH bucketing (`SignBucketExpr`): bucketed, never
    * all-pairs.
    *
    * Pipeline (integer-exact end to end, so the q126 DuckDB oracle
    * replays it rather than trusting a contract):
    *  1. [[decodeStub]] features → integer byte-bucket counts
    *     (c[b]·n_bytes recovered exactly, the q50 convention);
    *  2. perceptual signature = sign bucket of the OCCUPANCY
    *     DEVIATION vector (c[b]·dim − n): bit b set iff bucket b is
    *     at or above its uniform share — the render-invariant "shape
    *     of the byte distribution", and a direct `sign_bucket` call
    *     because deviation ≥ 0 is exactly its bit rule;
    *  3. same-signature docs pair within hot-bucket-capped buckets
    *     ([[HotBuckets.dropOversized]] — a degenerate signature
    *     carries no near-dup signal worth O(m²));
    *  4. verification: cross-scaled integer L1,
    *     Σ_b |c1[b]·n2 − c2[b]·n1| · 1000 ≤ thrPermille·n1·n2 ⟺
    *     normalized-histogram L1 ≤ thrPermille/1000 — no floats, no
    *     engine divergence. Exact payload copies score 0.
    *
    * A real deployment swaps the stub histogram for decoded
    * perceptual features (pHash planes, embedding signs) — every
    * stage downstream of [[decodeStub]] is unchanged.
    */
  def perceptualNearDupCandidates(media: DataFrame, dim: Int = 8,
      maxBucketSize: Int = 64, thrPermille: Int = 100): DataFrame = {
    require(dim >= 1 && dim <= 63, "dim must fit the sign-bucket bit range")
    val withKey = decodeStub(media, dim)
      .withColumn("__n", greatest(col("meta.n_bytes"), lit(1L)))
      .withColumn("__counts",
        expr("transform(features, f -> CAST(round(f * __n) AS BIGINT))"))
      .withColumn("__key", graft.plans.SignBucketExpr.sign_bucket(
        expr(s"transform(__counts, c -> CAST(c * $dim - __n AS DOUBLE))"), dim))
      .select(col("media_id").as("id"), col("__key"), col("__counts"), col("__n"))
      .repartition(col("__key"))
    val capped = HotBuckets.dropOversized(withKey, maxBucketSize, "__key")
    capped.alias("a").join(capped.alias("b"),
        col("a.__key") === col("b.__key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.__counts").as("c1"), col("b.__counts").as("c2"),
        col("a.__n").as("n1"), col("b.__n").as("n2"))
      .withColumn("l1", expr(
        "aggregate(zip_with(c1, c2, (x, y) -> abs(x * n2 - y * n1)), 0L, (acc, v) -> acc + v)"))
      .filter(col("l1") * 1000 <= lit(thrPermille.toLong) * col("n1") * col("n2"))
      .select("id1", "id2", "l1")
  }

  /** Video-level near-dup candidates by FRAME-DIGEST containment —
    * the sequence-aware tier above [[perceptualNearDupCandidates]]:
    * a clipped or re-muxed copy shares most of its frame windows with
    * the original even when whole-payload signatures differ.
    *
    * Pipeline (integer-exact; the q134 oracle replays it):
    *  1. payload → fixed-`frameBytes` windows, md5 per window (the
    *     md5/substring work rides INSIDE the frame transform — one
    *     linear pass per payload, Σ|payload| total, no decode);
    *     frame count = ⌈n_bytes / frameBytes⌉ as pure integer
    *     arithmetic (no float ceil to diverge across engines);
    *  2. distinct (video, frame-digest) pairs — a frame repeated
    *     within one video counts once;
    *  3. absolute df cap on frame digests (the q96 convention: a
    *     frame shared by > `maxFrameDf` videos is title-card/black-
    *     frame boilerplate, and capping it bounds every join group);
    *  4. digest equi-join pairs + containment gate
    *     shared·1000 ≥ thrPermille·min(n1, n2) — cross-multiplied,
    *     exact.
    *
    * Scale shape: only 16-byte digests shuffle (payloads never leave
    * their scan), groups are df-capped, and the per-video frame count
    * aggregate is vocab-of-videos-sized.
    */
  def frameNearDupCandidates(media: DataFrame, frameBytes: Int = 16,
      maxFrameDf: Int = 64, thrPermille: Int = 500): DataFrame = {
    require(frameBytes >= 1 && maxFrameDf >= 2)
    val frames = media
      .select(col("media_id").as("id"),
        explode(expr(
          s"""transform(
             |  sequence(0, CAST(greatest((coalesce(meta.n_bytes, 0) + ${frameBytes - 1}) div $frameBytes, 1) AS INT) - 1),
             |  f -> md5(substring(payload, f * $frameBytes + 1, $frameBytes)))""".stripMargin))
          .as("fd"))
      .distinct()
    val nf = frames.groupBy("id").agg(count(lit(1)).as("n"))
    val keep = frames.groupBy("fd").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxFrameDf).select("fd")
    val fr2 = frames.join(keep, "fd")
    fr2.alias("x").join(fr2.alias("y"),
        col("x.fd") === col("y.fd") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .join(nf.select(col("id").as("id1"), col("n").as("__n1")), "id1")
      .join(nf.select(col("id").as("id2"), col("n").as("__n2")), "id2")
      .filter(col("n_shared") * 1000 >= lit(thrPermille.toLong) * least(col("__n1"), col("__n2")))
      .select("id1", "id2", "n_shared")
  }

  /** Frame sampling stub for video-like payloads: every `stride`-th
    * byte window becomes one "frame" row (posexplode keeps lineage to
    * the source media row).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, stride: Int = 4): DataFrame =
    media
      .withColumn("n_frames",
        greatest(lit(1), (col("meta.n_bytes") / lit(frameBytes * stride)).cast("int")))
      .select(col("media_id"), col("meta"),
        posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("frame_idx", "frame_no")))
      .select(col("media_id"), col("frame_idx"),
        substring(base64(lit("frame")), 0, 8).as("frame_ref"), col("meta.mime").as("mime"))
}
