package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}

/** LLM-data-pipeline operators: exact/near dedup, similarity top-k, text
  * analysis, multimodal struct columns (SURVEY.md §2B Q30–Q34).
  *
  * Scale notes (100 TB posture):
  *  - Dedup keeps a deterministic survivor via `row_number()=1` (SURVEY
  *    §4.2) — `dropDuplicates` is nondeterministic about which row wins.
  *  - Near-dup is NEVER all-pairs: candidates come from an equi-join on a
  *    fixed-width signature (md5 of the sorted token set, or an LSH band
  *    hash), so the shuffle partitions by signature and only same-bucket
  *    rows meet. Hot buckets (boilerplate docs) are the skew risk; AQE skew
  *    join handles moderate skew, and a salted two-stage join is the
  *    escape hatch beyond that.
  *  - MinHash signatures are computed with higher-order functions entirely
  *    inside the row (no explode/shuffle for signature building).
  *  - Similarity top-k broadcasts the single query vector and reduces via
  *    TakeOrderedAndProject — no global sort, no driver collect.
  */
object LlmOps {

  /** Distinct sorted token set of a document. */
  private def tokenSet(text: Column): Column =
    array_sort(array_distinct(split(text, " ")))

  /** Distinct sorted k-token shingle set — the similarity unit for
    * MinHash-LSH. Built row-local with higher-order functions (no
    * explode/shuffle): shingle i = tokens[i..i+k-1] joined by spaces.
    */
  private def shingleSet(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    array_sort(array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => array_join(slice(toks, i + 1, lit(k)), " "))))
  }

  /** Sum of an array<double> column via fold (deterministic order). */
  private def asum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  val qs: Seq[Q] = Seq(
    // Q30 — exact dedup, keep-first-by-key: deterministic survivor = lowest
    // doc_id per (lang, source). One hash-partition shuffle on the key.
    Q("q30_dedup_exact",
      (s, d) => {
        val w = Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("doc_id"))
        Tables(s, d, "documents")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""SELECT doc_id, lang, source, n_chars FROM (
             |  SELECT doc_id, lang, source, n_chars,
             |    row_number() OVER (PARTITION BY lang, source
             |                       ORDER BY doc_id) AS rn
             |  FROM documents) WHERE rn = 1
             |ORDER BY lang, source""".stripMargin)),

    // Q30b — DISTINCT surface over full rows of a projection.
    Q("q30_dedup_distinct",
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("lang"), col("source"))
          .distinct()
          .orderBy(col("lang"), col("source"))
      },
      Some("""SELECT DISTINCT lang, source FROM documents
             |ORDER BY lang, source""".stripMargin)),

    // Q31 — near-dup candidate pairs, declared oracle-safe variant:
    // signature = md5 of the sorted distinct token set; equality self-join
    // on the 32-char signature (equi-key, bucketed — never all-pairs).
    Q("q31_neardup",
      (s, d) => {
        val sigs = Tables(s, d, "documents")
          .select(col("doc_id"),
            md5(array_join(tokenSet(col("text")), " ")).as("sig"))
        val a = sigs.as("a")
        val b = sigs.as("b")
        a.join(b, col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH sigs AS (
             |  SELECT doc_id,
             |    md5(array_to_string(list_sort(list_distinct(
             |      string_split(text, ' '))), ' ')) AS sig
             |  FROM documents)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |FROM sigs a JOIN sigs b
             |  ON a.sig = b.sig AND a.doc_id < b.doc_id
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Q31-full — banded MinHash-LSH near-dup pipeline (engine-verified:
    // banding recall is probabilistic for 0.9<=J<1, so no exact oracle).
    //
    // Design choices, each measured against a slower first cut:
    //  - Similarity is Jaccard over 3-token SHINGLES, not unigrams: with a
    //    small shared vocabulary every doc pair has high unigram overlap,
    //    so unigram LSH buckets degenerate toward all-pairs (measured 45s
    //    at sf0.1 — a quadratic scale-killer). Shingling pushes
    //    random-pair Jaccard to ~0; band buckets stay small and the join
    //    stays ~linear in corpus size.
    //  - Each shingle is hashed ONCE with codegen'd xxhash64; the 16
    //    minhashes are XOR reshuffles (h XOR c_i — a 64-bit permutation,
    //    and overflow-free under ANSI mode, where h*a+b throws) of that
    //    hash array. The first cut (md5+conv string ops per seed x shingle
    //    inside nested interpreted lambdas) took 27s at sf0.1 for 5k docs.
    //    XOR permutations are not min-wise independent, but banding only
    //    needs collision-on-similarity: exact dups always collide, and
    //    every candidate is confirmed by exact Jaccard below.
    //  - The signature/shingle tables are cached: the band self-join and
    //    the Jaccard verification would otherwise recompute the signature
    //    lineage once per join side (Catalyst does not reuse the
    //    symmetric exchange here).
    // 16 minhashes (4 bands x 4 rows); candidates from the band-bucket
    // equi-join; exact shingle-Jaccard >= 0.9 confirms candidates.
    Q("q31_minhash_lsh",
      (s, d) => {
        // deterministic splitmix-style XOR constants for the hash family
        val seeds = (0 until 16).map { i =>
          val z = 0x9E3779B97F4A7C15L * (i + 1)
          val m = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          m ^ (m >>> 27)
        }
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), shingleSet(col("text"), 3).as("toks"))
          .cache()
        val sigs = docs
          .withColumn("hs", transform(col("toks"), t => xxhash64(t)))
          .withColumn("sig", array(seeds.map { c =>
            array_min(transform(col("hs"), h => h.bitwiseXOR(lit(c))))
          }: _*))
          .select(col("doc_id"), col("sig"))
          .cache()
        val bands = sigs.select(col("doc_id"), explode(array(
          (0 until 4).map { bIdx =>
            struct(lit(bIdx).as("band"),
              xxhash64(slice(col("sig"), bIdx * 4 + 1, 4)).as("bh"))
          }: _*)).as("bk"))
          .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        cand
          .join(docs.as("ta"), col("doc_a") === col("ta.doc_id"))
          .join(docs.as("tb"), col("doc_b") === col("tb.doc_id"))
          .withColumn("jaccard",
            size(array_intersect(col("ta.toks"), col("tb.toks")))
              .cast(DoubleType) /
              size(array_union(col("ta.toks"), col("tb.toks"))))
          .filter(col("jaccard") >= 0.9)
          .select(col("doc_a"), col("doc_b"), col("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      None),

    // Q32 — brute-force cosine top-k vs the vec_id=0 query vector.
    // Broadcast the 1-row query side; per-row dot/norms in codegen'd
    // higher-order fns accumulating in double (matches the oracle's
    // DOUBLE[] math); top-k compiles to TakeOrderedAndProject.
    Q("q32_cosine_topk",
      (s, d) => {
        val e = Tables(s, d, "embeddings")
        val qv = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qemb"))
        val dot = asum(zip_with(col("embedding"), col("qemb"),
          (x, y) => x.cast(DoubleType) * y.cast(DoubleType)))
        val norm = (c: Column) => sqrt(asum(
          transform(c, x => x.cast(DoubleType) * x.cast(DoubleType))))
        e.crossJoin(broadcast(qv))
          .select(col("vec_id"), col("label"),
            (dot / (norm(col("embedding")) * norm(col("qemb"))))
              .as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(10)
      },
      Some("""WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q
             |            FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id, label,
             |  list_cosine_similarity(CAST(embedding AS DOUBLE[]), q)
             |    AS cos_sim
             |FROM embeddings, qv
             |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)),

    // Q33 — token frequency: generator (explode) + hash agg + top-k with
    // full tiebreak. Partial aggregation keeps the shuffle small.
    Q("q33_token_freq",
      (s, d) => {
        Tables(s, d, "documents")
          .select(explode(split(lower(col("text")), " ")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(50)
      },
      Some("""SELECT word, count(*) AS cnt FROM (
             |  SELECT unnest(string_split(lower(text), ' ')) AS word
             |  FROM documents)
             |GROUP BY word ORDER BY cnt DESC, word LIMIT 50""".stripMargin)),

    // Q33b — per-language document stats (integer sums are exact, so the
    // avg is deterministic without decimal detours).
    Q("q33_lang_stats",
      (s, d) => {
        Tables(s, d, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("n_chars")).cast(DoubleType) / count(col("n_chars")))
              .as("avg_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Q34 — multimodal/struct columns: pack metadata into a struct, operate
    // on struct fields (filter + group on nested refs), project flattened
    // (struct output itself is engine-verified territory; the declared
    // variant flattens for the oracle).
    Q("q34_struct",
      (s, d) => {
        val meta = struct(col("lang").as("lang"), col("source").as("source"),
          col("n_chars").as("n_chars"))
        Tables(s, d, "documents")
          .select(col("doc_id"), meta.as("meta"))
          .filter(col("meta.n_chars") > 200)
          .groupBy(col("meta.lang").as("lang"))
          .agg(count(lit(1)).as("n_big"),
            max(col("meta.n_chars")).as("max_chars"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_big, max(n_chars) AS max_chars
             |FROM documents WHERE n_chars > 200
             |GROUP BY lang ORDER BY lang""".stripMargin)))
}
