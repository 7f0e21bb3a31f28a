package graft.queries

import graft.Q
import graft.ann.Ann
import graft.dedup.Dedup
import graft.util.T
import org.apache.spark.sql.functions._

/** Deduplication and similarity-search operators over documents /
  * embeddings. Exact-key and cosine-top-k paths have DuckDB oracles;
  * MinHash/SimHash LSH stages are engine-specific (rows-only here,
  * planted-duplicate assertions in DedupSpec).
  */
object DedupAnnQueries {

  private def embs(s: org.apache.spark.sql.SparkSession, d: String) =
    T.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))

  val all: Seq[Q] = Seq(
    Q(
      // exact dedup accounting by normalized fingerprint
      "q_dedup_exact_stats",
      (s, d) =>
        T.documents(s, d)
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(graft.text.TextOps.fingerprint(col("text"))).as("n_unique"),
            (count(lit(1)) - countDistinct(graft.text.TextOps.fingerprint(col("text"))))
              .as("n_dup_rows")),
      Some("""SELECT count(*) AS n_docs,
             |  count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
             |    AS n_unique,
             |  count(*) - count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
             |    AS n_dup_rows
             |FROM documents""".stripMargin)
    ),
    Q(
      // MinHash LSH near-dup candidate pairs (engine-specific hashes —
      // rows-only; planted-duplicate recall asserted in DedupSpec)
      "q_dedup_minhash_lsh",
      (s, d) => Dedup.nearDuplicates(T.documents(s, d), "doc_id", "text", 0.5),
      None
    ),
    Q(
      // SimHash signatures + near-dup pairs (rows-only, see DedupSpec)
      "q_dedup_simhash",
      (s, d) => Dedup.simhashNearDuplicates(T.documents(s, d), "doc_id", "text", 10),
      None
    ),
    Q(
      // brute-force word-bigram Jaccard near-dup pairs over a bounded
      // doc subset — exact DuckDB oracle. This is the correctness
      // baseline for n-gram Jaccard dedup; the unbounded-corpus path is
      // q_dedup_minhash_lsh's bucketed LSH with in-bucket verification.
      "q_dedup_ngram_jaccard",
      (s, d) => {
        val sh = T.documents(s, d).filter(col("doc_id") < 40)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("__w"))
          .select(col("doc_id"), Dedup.shinglesFromWords(col("__w"), 2).as("sh"))
        val l = sh.select(col("doc_id").as("id1"), col("sh").as("sh1"))
        val r = sh.select(col("doc_id").as("id2"), col("sh").as("sh2"))
        l.join(r, col("id1") < col("id2"))
          .withColumn("jaccard",
            size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
              size(array_union(col("sh1"), col("sh2"))).cast("double"))
          .filter(col("jaccard") >= 0.05)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(1, len(regexp_split_to_array(trim(text), '\s+')) - 1) + 1),
             |    i -> array_to_string((regexp_split_to_array(trim(text), '\s+'))[i:i+1], ' ')))
             |    AS sh
             |  FROM documents WHERE doc_id < 40)
             |SELECT l.doc_id AS id1, r.doc_id AS id2,
             |  round(len(list_intersect(l.sh, r.sh)) * 1.0 /
             |        len(list_distinct(list_concat(l.sh, r.sh))), 6) AS jaccard
             |FROM docs l JOIN docs r ON l.doc_id < r.doc_id
             |WHERE len(list_intersect(l.sh, r.sh)) * 1.0 /
             |      len(list_distinct(list_concat(l.sh, r.sh))) >= 0.05""".stripMargin)
    ),
    Q(
      // brute-force cosine top-3 neighbors for 10 query vectors —
      // exact oracle via DuckDB list_cosine_similarity (double-cast)
      "q_ann_bruteforce_topk",
      (s, d) => {
        val c = embs(s, d)
        val q = c.filter(col("id") < 10)
        Ann.bruteForceTopK(q, c, 3)
          .select(col("query_id"), col("neighbor_id"),
            round(col("cosine"), 6).as("cosine"), col("rank"))
      },
      Some("""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
             |          FROM embeddings)
             |SELECT query_id, neighbor_id, cosine, rank FROM (
             |  SELECT q.id AS query_id, c.id AS neighbor_id,
             |    round(list_cosine_similarity(q.vec, c.vec), 6) AS cosine,
             |    row_number() OVER (PARTITION BY q.id
             |      ORDER BY list_cosine_similarity(q.vec, c.vec) DESC, c.id)
             |      AS rank
             |  FROM e q CROSS JOIN e c
             |  WHERE q.id < 10 AND q.id != c.id)
             |WHERE rank <= 3""".stripMargin)
    ),
    Q(
      // LSH-bucketed ANN (the scale path; recall measured in AnnSpec)
      "q_ann_lsh_topk",
      (s, d) => {
        val c = embs(s, d)
        Ann.lshTopK(c.filter(col("id") < 10), c, 3, planes = 6)
      },
      None
    ),
    Q(
      // embedding-cosine near-duplicates via hyperplane-bucketed LSH.
      // The sf corpus is near-orthogonal random vectors (max pairwise
      // cosine ~0.51), so near-dups are PLANTED: ids < 5 re-enter scaled
      // by 1.0001 (same direction => cosine exactly 1, same LSH bucket)
      // — the operator must recover exactly those pairs. Engine-specific
      // buckets => rows-only; recall also asserted in DedupAnnSpec.
      "q_dedup_embedding",
      (s, d) => {
        val base = T.embeddings(s, d)
          .select(col("vec_id").cast("long").as("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
        val planted = base.filter(col("vec_id") < 5)
          .select((col("vec_id") + 10000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(1.0001)).as("embedding"))
        Dedup.embeddingNearDuplicates(base.unionByName(planted),
          "vec_id", "embedding", threshold = 0.99, planes = 8)
      },
      None
    ),
    Q(
      // IVF cell-probed ANN top-k (the coarse-quantization scale path;
      // recall vs brute force measured in DedupAnnSpec)
      "q_ann_ivf_topk",
      (s, d) => {
        val c = embs(s, d)
        Ann.ivfTopK(c.filter(col("id") < 10), c, 3, nCells = 8, nprobe = 3)
      },
      None
    ),
    Q(
      // embedding norms / label profile — oracle via list_dot_product
      "q_embedding_norms",
      (s, d) =>
        embs(s, d)
          .join(T.embeddings(s, d).select(col("vec_id").as("id"), col("label")), Seq("id"))
          .withColumn("norm",
            sqrt(aggregate(col("vec"), lit(0.0), (acc, v) => acc + v * v)))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"), round(avg(col("norm")), 6).as("avg_norm")),
      Some("""SELECT label, count(*) AS n,
             |  round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
             |                                  CAST(embedding AS DOUBLE[])))), 6)
             |    AS avg_norm
             |FROM embeddings GROUP BY 1""".stripMargin)
    )
  )
}
