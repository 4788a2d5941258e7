package graft.engine

import org.apache.spark.sql.functions._
import graft.operators.Pq

/** Round-9 batch (q123+): the retrieval-compression tier — product-
  * quantization training, encoding, and ADC retrieval over the
  * embeddings table. The reference's declared analysis stage commits
  * to fingerprint/similarity machinery over ingested records
  * (/root/reference/docs/system-plan.md:23-27); PQ is that capability
  * at the 100 TB operating point, where int8 (q102, 4×) still leaves
  * the corpus disk-bound and PQ's packed-long codes (32×) fit in RAM.
  *
  * Scale shapes:
  *  - q123: training is one corpus scan per round into an
  *    m·ksub·subdim-cell hash aggregate (map-side combined; the
  *    codebook driver-sync is k-means' classic tiny collect);
  *    retrieval is a stateless scan of ONE LongType column against a
  *    driver-built LUT + TakeOrderedAndProject. No corpus shuffle
  *    anywhere in the pipeline.
  */
object RetrievalQueries {
  import QueryDef._
  import Tables._

  val all: Seq[QueryDef] = Seq(

    // PQ ADC retrieval with a LEARNED codebook, trained, encoded and
    // queried inside the query — deterministic id-bucket seeds, one
    // integer-Lloyd round, integer-exact end to end, so DuckDB
    // replays the whole pipeline (training included) and the top-20
    // ids + scores hash-match exactly. m=8 blocks × ksub=16 codes
    // over the 64-dim embeddings; query = vec_id 0 at full precision
    // (the asymmetric side), corpus = the rest.
    sql("q123_pq_adc",
      """WITH p AS (
        |  SELECT vec_id,
        |         unnest([{'b': (i-1)//8, 'j': (i-1)%8,
        |                  'v': CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)}
        |                 FOR i IN range(1, len(embedding)+1)]) AS u
        |  FROM embeddings WHERE vec_id <> 0),
        |e AS (SELECT vec_id, u.b AS b, u.j AS j, u.v AS v FROM p),
        |seed AS (SELECT b, vec_id % 16 AS c, j, sum(v) // count(*) AS cent
        |         FROM e GROUP BY b, vec_id % 16, j),
        |d1 AS (SELECT e.vec_id, e.b, s.c,
        |              sum((e.v - s.cent) * (e.v - s.cent)) AS dist
        |       FROM e JOIN seed s ON e.b = s.b AND e.j = s.j
        |       GROUP BY e.vec_id, e.b, s.c),
        |a1 AS (SELECT vec_id, b, c FROM (
        |         SELECT vec_id, b, c,
        |                row_number() OVER (PARTITION BY vec_id, b ORDER BY dist, c) AS rn
        |         FROM d1) x WHERE rn = 1),
        |r1 AS (SELECT e.b, a.c, e.j, sum(e.v) // count(*) AS cent
        |       FROM e JOIN a1 a ON e.vec_id = a.vec_id AND e.b = a.b
        |       GROUP BY e.b, a.c, e.j),
        |cb AS (SELECT s.b, s.c, s.j, COALESCE(r1.cent, s.cent) AS cent
        |       FROM seed s LEFT JOIN r1
        |         ON s.b = r1.b AND s.c = r1.c AND s.j = r1.j),
        |d2 AS (SELECT e.vec_id, e.b, k.c,
        |              sum((e.v - k.cent) * (e.v - k.cent)) AS dist
        |       FROM e JOIN cb k ON e.b = k.b AND e.j = k.j
        |       GROUP BY e.vec_id, e.b, k.c),
        |enc AS (SELECT vec_id, b, c FROM (
        |          SELECT vec_id, b, c,
        |                 row_number() OVER (PARTITION BY vec_id, b ORDER BY dist, c) AS rn
        |          FROM d2) x WHERE rn = 1),
        |q AS (SELECT unnest([{'b': (i-1)//8, 'j': (i-1)%8,
        |                     'v': CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)}
        |                    FOR i IN range(1, len(embedding)+1)]) AS u
        |      FROM embeddings WHERE vec_id = 0),
        |qe AS (SELECT u.b AS b, u.j AS j, u.v AS qv FROM q),
        |lut AS (SELECT k.b, k.c, sum(qe.qv * k.cent) AS l
        |        FROM cb k JOIN qe ON k.b = qe.b AND k.j = qe.j
        |        GROUP BY k.b, k.c),
        |sc AS (SELECT enc.vec_id, CAST(sum(l.l) AS BIGINT) AS score_q
        |       FROM enc JOIN lut l ON enc.b = l.b AND enc.c = l.c
        |       GROUP BY enc.vec_id),
        |top AS (SELECT vec_id, score_q FROM sc ORDER BY score_q DESC, vec_id LIMIT 20)
        |SELECT vec_id, score_q FROM top ORDER BY vec_id""".stripMargin) {
      (s, d) =>
        val emb = embeddings(s, d)
        Pq.pqTopK(emb.filter(col("vec_id") =!= 0),
            emb.filter(col("vec_id") === 0), k = 20, m = 8, ksub = 16, iters = 1)
          .orderBy("vec_id")
    }
  )
}
