package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Embedding-similarity and probabilistic-dedup surface. The exact
  * formulations (brute-force cosine top-k, threshold near-dup) carry
  * DuckDB oracles via `list_cosine_similarity` over DOUBLE[]-cast
  * vectors; the approximate family (sign-LSH ANN, IVF ANN, MinHash
  * LSH, SimHash) is engine-internal (hash seeds / centroid layout are
  * not ANSI-SQL-expressible), so those entries take the driver's
  * rows-only check and are pinned by ScalaTest specs instead
  * (recall vs the exact baseline, banding behavior).
  */
object PipelineQueries {
  import QueryDef._
  import Tables._

  val all: Seq[QueryDef] = Seq(

    sql("q40_cosine_topk",
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT qid, cid, list_cosine_similarity(qv, cv) AS sim FROM q, c WHERE cid <> qid)
        |SELECT qid, cid, round(sim, 4) AS sim, rn FROM (
        | SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
        | FROM s) t
        |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin) {
      (s, d) =>
        val emb = embeddings(s, d)
        Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
          .select(col("qid"), col("cid"), round(col("sim"), 4).as("sim"), col("rn"))
          .orderBy(col("qid"), col("rn"))
    },

    sql("q41_embedding_neardup",
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        | round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.2
        |ORDER BY id1, id2""".stripMargin) {
      (s, d) =>
        import graft.functions.VectorFunctions.{dot, norm}
        val a = embeddings(s, d).select(col("vec_id").as("id1"),
          col("label"), col("embedding").as("va"), norm(col("embedding")).as("na"))
        val b = embeddings(s, d).select(col("vec_id").as("id2"),
          col("label"), col("embedding").as("vb"), norm(col("embedding")).as("nb"))
        a.join(b, Seq("label"))
          .filter(col("id1") < col("id2"))
          .withColumn("sim0", dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .filter(col("sim0") > 0.2)
          .select(col("id1"), col("id2"), round(col("sim0"), 4).as("sim"))
          .orderBy(col("id1"), col("id2"))
    },

    // The 100-TB routing of q41: sign-LSH buckets generate candidates,
    // exact cosine verifies. Rows-only (bucket hashing is engine-
    // internal); OperatorsSpec pins precision/recall against the exact
    // all-pairs set on planted near-dups.
    rowsOnly("q66_embedding_neardup_ann") { (s, d) =>
      Similarity.nearDupesAnn(embeddings(s, d), threshold = 0.2, bits = 6)
        .orderBy(col("id1"), col("id2"))
    },

    // Banded sign-LSH near-dup (MinHash-banding recall curve over
    // disjoint dimension slices): the high-recall scale formulation.
    // Rows-only; the banded-vs-single recall spec pins behavior.
    rowsOnly("q76_embedding_neardup_banded") { (s, d) =>
      Similarity.nearDupesAnnBanded(embeddings(s, d), threshold = 0.2,
          bits = 8, bands = 8)
        .orderBy(col("id1"), col("id2"))
    },

    rowsOnly("q42_ann_sign_lsh") { (s, d) =>
      val emb = embeddings(s, d)
      Similarity.annSignLsh(emb, emb.filter(col("vec_id") < 10), k = 5, bits = 6)
        .select(col("qid"), col("cid"), round(col("sim"), 4).as("sim"), col("rn"))
        .orderBy(col("qid"), col("rn"))
    },

    rowsOnly("q43_ann_ivf") { (s, d) =>
      val emb = embeddings(s, d)
      Similarity.annIvf(emb, emb.filter(col("vec_id") < 10), k = 5, nprobe = 3)
        .select(col("qid"), col("cid"), round(col("sim"), 4).as("sim"), col("rn"))
        .orderBy(col("qid"), col("rn"))
    },

    rowsOnly("q44_minhash_lsh_candidates") { (s, d) =>
      Dedup.minHashCandidates(documents(s, d), "doc_id", "text",
          bands = 8, rowsPerBand = 4)
        .orderBy(col("id1"), col("id2"))
    },

    rowsOnly("q45_simhash") { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), Dedup.simHash32(col("text")).as("simhash"))
        .orderBy(col("doc_id"))
    },

    // Multimodal plumbing (rows-only): documents → binary payload +
    // typed metadata → partition-batched stub decode → per-mime feature
    // aggregate. The decode itself is a documented deterministic fake
    // (no codecs in this environment); schema/partitioning/batch shape
    // are the real contract, pinned further in OperatorsSpec.
    rowsOnly("q50_multimodal_features") { (s, d) =>
      val media = graft.operators.Multimodal.synthesize(
        documents(s, d), "doc_id", "text")
      val feats = graft.operators.Multimodal.decodeStub(media, dim = 8)
      feats.select(col("media_id"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
        .orderBy(col("media_id"))
    }
  )
}
