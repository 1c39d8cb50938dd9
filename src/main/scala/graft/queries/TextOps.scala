package graft.queries

import graft.api.Graft
import graft.{Exact, Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Text-analysis operators for training-data pipelines (builder-prompt
  * extension of SURVEY.md §2B Q33): language identification, quality
  * scoring, token counting, document fingerprinting.
  *
  * Scale notes:
  *  - Everything is per-row arithmetic or broadcast-joined against tiny
  *    side tables (language profiles: #langs x 5 rows) — no wide shuffles
  *    beyond declared final sorts.
  *  - The fingerprint is a positional polynomial hash folded with modular
  *    arithmetic (never overflows long under ANSI mode) and is
  *    oracle-portable via the md5-based token hash.
  */
object TextOps {

  /** 31^(k) mod P weights for the positional fingerprint. */
  private val P = 1000000007L
  private val weights: Seq[Long] =
    Iterator.iterate(1L)(w => w * 31 % P).take(8).toSeq

  private def toks(text: Column): Column = split(text, " ")

  val qs: Seq[Q] = Seq(
    // Q33c — language ID via corpus-derived token profiles: top-5 tokens
    // per language (frequency desc, token asc), prediction = language whose
    // profile overlaps the document's token set most (count desc, lang asc
    // tiebreak). The profile table is tiny and broadcast; the containment
    // join never shuffles the document side.
    Q("q33_langid",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        graft.api.Graft.languageId(docs, id = col("doc_id"),
            text = col("text"), langCol = col("lang"))
          .filter(col("pred_lang").isNotNull)
          .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
          .select(col("id").as("doc_id"), col("lang"), col("pred_lang"),
            col("hits"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH profiles AS (
             |  SELECT lang AS p_lang, tok FROM (
             |    SELECT lang, tok, count(*) AS cnt,
             |      row_number() OVER (PARTITION BY lang
             |        ORDER BY count(*) DESC, tok) AS rn
             |    FROM (SELECT lang,
             |            unnest(string_split(lower(text), ' ')) AS tok
             |          FROM documents)
             |    GROUP BY lang, tok)
             |  WHERE rn <= 5),
             |scored AS (
             |  SELECT d.doc_id, d.lang, p.p_lang, count(*) AS hits
             |  FROM (SELECT doc_id, lang,
             |          list_distinct(string_split(lower(text), ' ')) AS dtoks
             |        FROM documents) d
             |  JOIN profiles p ON list_contains(d.dtoks, p.tok)
             |  GROUP BY d.doc_id, d.lang, p.p_lang)
             |SELECT doc_id, lang, p_lang AS pred_lang, hits FROM (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id
             |    ORDER BY hits DESC, p_lang) AS rn FROM scored)
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // Q33d — document quality scoring: length, token stats, stopword
    // ratio, vowel-group density. Pure per-row arithmetic in codegen.
    Q("q33_quality",
      (s, d) => {
        graft.api.Graft.qualityScores(Tables(s, d, "documents"), col("text"))
          .select(col("doc_id"), col("n_chars"), col("n_tokens"),
            col("avg_tok_len"), col("stop_ratio"),
            col("vowel_groups_per_tok"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, n_chars,
              |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
              |  (n_chars - (len(string_split(text, ' ')) - 1))::DOUBLE /
              |    len(string_split(text, ' ')) AS avg_tok_len,
              |  len(list_filter(string_split(text, ' '),
              |    t -> list_contains(['the','a','of','and','to'], t)))::DOUBLE
              |    / len(string_split(text, ' ')) AS stop_ratio,
              |  (length(regexp_replace(text, '[aeiou]+', '~', 'g')) -
              |   length(replace(regexp_replace(text, '[aeiou]+', '~', 'g'),
              |          '~', '')))::DOUBLE
              |    / len(string_split(text, ' ')) AS vowel_groups_per_tok
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Q33e — token counting: whitespace tokens + a subword proxy
    // (vowel-group segmentation stands in for BPE merges — RE2-safe, no
    // lookahead, portable across engines).
    Q("q33_tokens",
      (s, d) => {
        val t = toks(col("text"))
        val squeezed = regexp_replace(col("text"), "[aeiou]+", "~")
        val nVg = length(squeezed) - length(regexp_replace(squeezed, "~", ""))
        Tables(s, d, "documents").select(
          col("doc_id"),
          size(t).as("ws_tokens"),
          (size(t) + nVg).as("subword_est"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
             |  CAST(len(string_split(text, ' ')) +
             |    length(regexp_replace(text, '[aeiou]+', '~', 'g')) -
             |    length(replace(regexp_replace(text, '[aeiou]+', '~', 'g'),
             |           '~', '')) AS INT) AS subword_est
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Q33f — positional rolling-hash fingerprint: fp = sum_i
    // h(tok_i) * 31^(i mod 8) (mod P). Modular fold keeps every
    // intermediate below 2^63 (ANSI-safe); md5-based token hash makes the
    // value oracle-portable. Order-sensitive (unlike the dedup signatures),
    // so re-ordered near-dups get distinct fingerprints.
    Q("q33_fingerprint",
      (s, d) => {
        graft.api.Graft.fingerprint(Tables(s, d, "documents"),
            id = col("doc_id"), text = col("text"))
          .select(col("id").as("doc_id"), col("fingerprint"))
          .orderBy(col("doc_id"))
      },
      Some {
        val wList = weights.mkString("[", ", ", "]")
        s"""SELECT doc_id,
           |  CAST(SUM((CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % $P)
           |           * ($wList)[(i % 8) + 1]) % $P AS BIGINT)
           |    AS fingerprint
           |FROM (
           |  SELECT doc_id,
           |    unnest(string_split(text, ' ')) AS t,
           |    unnest(range(0, len(string_split(text, ' ')))) AS i
           |  FROM documents)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Q33g — TF-IDF top terms (Graft.tfidfTopTerms): tf·ln(N/df) scored
    // over the whole corpus, top-3 terms per doc with deterministic
    // tiebreaks; result filtered to doc_id < 50 AFTER scoring so the
    // verified rows stay small while df/N remain corpus-level. The
    // multiply/divide order is pinned identically in both engines.
    Q("q33_tfidf",
      (s, d) => {
        Graft.tfidfTopTerms(Tables(s, d, "documents"),
            id = col("doc_id"), text = col("text"), topK = 3)
          .filter(col("id") < 50)
          .select(col("id").as("doc_id"), col("tok"), col("tfidf"))
          .orderBy(col("doc_id"), col("tfidf").desc, col("tok"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
             |  FROM documents),
             |tf AS (SELECT doc_id, tok, count(*) AS tc FROM toks
             |       GROUP BY doc_id, tok),
             |dlen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
             |dfreq AS (SELECT tok, count(*) AS nd FROM tf GROUP BY tok),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.tok,
             |    (CAST(tc AS DOUBLE) / CAST(dl AS DOUBLE)) *
             |      ln(CAST(n_docs AS DOUBLE) / CAST(nd AS DOUBLE)) AS tfidf
             |  FROM tf JOIN dlen USING (doc_id) JOIN dfreq USING (tok)
             |  CROSS JOIN n)
             |SELECT doc_id, tok, tfidf FROM (
             |  SELECT doc_id, tok, tfidf,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY tfidf DESC, tok) AS rk
             |  FROM scored)
             |WHERE rk <= 3 AND doc_id < 50
             |ORDER BY doc_id, tfidf DESC, tok""".stripMargin)),

    // Q33h — PII scrubbing (Graft.scrubPii): emails / IPv4s / phone
    // numbers redacted with typed placeholders, plus per-kind match
    // counts. The fixture text carries no PII, so the query plants
    // deterministic PII derived from fixture columns (doc_id, source)
    // first — both engines construct the identical string, then scrub
    // with the identical regexes (Java regex and RE2 agree on these
    // pattern classes; see Graft.emailRe note).
    Q("q33_pii",
      (s, d) => {
        val raw = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@"), col("source"), lit(".example.com from 10.1."),
          pmod(col("doc_id"), lit(256)).cast("string"), lit("."),
          pmod(col("doc_id") * 7, lit(256)).cast("string"),
          lit(" call +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
        Tables(s, d, "documents")
          .withColumn("__raw", raw)
          .select(col("doc_id"),
            Graft.scrubPii(col("__raw")).as("scrubbed"),
            regexp_count(col("__raw"), lit(Graft.emailRe)).as("n_email"),
            regexp_count(col("__raw"), lit(Graft.ipv4Re)).as("n_ip"),
            regexp_count(col("__raw"), lit(Graft.phoneRe)).as("n_phone"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH raw AS (
             |  SELECT doc_id,
             |    text || ' contact user' || CAST(doc_id AS VARCHAR)
             |      || '@' || source || '.example.com from 10.1.'
             |      || CAST(doc_id % 256 AS VARCHAR) || '.'
             |      || CAST((doc_id * 7) % 256 AS VARCHAR)
             |      || ' call +1-555-'
             |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS r
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(r,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             |    '<EMAIL>', 'g'),
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             |    '\+\d[\d-]{7,}\d', '<PHONE>', 'g') AS scrubbed,
             |  CAST(len(regexp_extract_all(r,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |    AS INT) AS n_email,
             |  CAST(len(regexp_extract_all(r,
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ip,
             |  CAST(len(regexp_extract_all(r,
             |    '\+\d[\d-]{7,}\d')) AS INT) AS n_phone
             |FROM raw ORDER BY doc_id""".stripMargin)),

    // Q33i — duplicate-n-gram repetition score
    // (Graft.duplicateNgramFraction): fraction of unigram and trigram
    // occurrences that repeat an earlier gram in the same document — the
    // Gopher-style boilerplate/degeneracy signal. Row-local array algebra;
    // the doubles are exact-input IEEE divisions, identical cross-engine.
    Q("q33_repetition",
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            Graft.duplicateNgramFraction(col("text"), 1).as("dup_unigram"),
            Graft.duplicateNgramFraction(col("text"), 3).as("dup_trigram"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id, lang, ts AS g1,
             |    [array_to_string(ts[i:i+2], ' ')
             |     FOR i IN range(1, greatest(len(ts) - 2, 1) + 1)] AS g3
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ts
             |        FROM documents))
             |SELECT doc_id, lang,
             |  1.0 - CAST(len(list_distinct(g1)) AS DOUBLE) /
             |    CAST(len(g1) AS DOUBLE) AS dup_unigram,
             |  1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) /
             |    CAST(len(g3) AS DOUBLE) AS dup_trigram
             |FROM g ORDER BY doc_id""".stripMargin)),

    // Q33j — fixed-size token chunking with overlap
    // (Graft.chunkDocuments): 40-token chunks every 30 tokens (10-token
    // overlap) — the RAG/context-window preprocessing shape. Explode is
    // row-local; chunk boundaries are pure integer arithmetic, so the
    // oracle reproduces every chunk string byte-for-byte.
    Q("q33_chunks",
      (s, d) => {
        Graft.chunkDocuments(Tables(s, d, "documents"),
            id = col("doc_id"), text = col("text"),
            chunkTokens = 40, overlap = 10)
          .select(col("id").as("doc_id"), col("chunk_id"), col("chunk"),
            col("n_tokens"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |c AS (
             |  SELECT doc_id, ts,
             |    unnest(range(0,
             |      greatest((len(ts) - 40 + 29) // 30, 0) + 1)) AS chunk_id
             |  FROM t)
             |SELECT doc_id, chunk_id,
             |  array_to_string(ts[chunk_id*30+1 : chunk_id*30+40], ' ')
             |    AS chunk,
             |  least(40, len(ts) - chunk_id*30) AS n_tokens
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // Q33k — concat-and-chunk sequence packing (Graft.packSequences):
    // documents laid end-to-end in doc_id order, cut into 512-token
    // training bins; each doc reports its stream offset and the bins its
    // span touches. The running sum is the CHUNKED prefix scan
    // (Graft.prefixSumExclusive, chunkSize=64 to exercise the carry path
    // at fixture scale) — the oracle's single window proves the two-level
    // formulation exact.
    Q("q33_pack",
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        Graft.packSequences(docs, order = col("doc_id"),
            tokens = col("n_tokens"), capacity = 512L, chunkSize = 64L)
          .select(col("doc_id"), col("n_tokens"),
            col("offset").as("tok_offset"), col("bin_first"),
            col("bin_last"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, n_tokens,
             |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS tok_offset
             |  FROM t)
             |SELECT doc_id, n_tokens, tok_offset,
             |  tok_offset // 512 AS bin_first,
             |  (tok_offset + n_tokens - 1) // 512 AS bin_last
             |FROM o ORDER BY doc_id""".stripMargin)),

    // Q33m — inverted index (Graft.invertedIndex): per-term document
    // frequency, total occurrences, and a CAPPED doc-ordered posting list
    // of doc:tf entries — the retrieval-side index a corpus search needs.
    // The cap is a pre-aggregation window rank, NOT a post-hoc slice of
    // collect_set: per-term state stays bounded at maxPostings even for
    // stopwords touching every document, which is what keeps the build
    // viable at 100 TB. df >= 10 bounds the declared output to the
    // non-hapax vocabulary.
    Q("q33_invindex",
      (s, d) => {
        Graft.invertedIndex(Tables(s, d, "documents"),
            id = col("doc_id"), text = col("text"), maxPostings = 20)
          .filter(col("df") >= 10)
          .select(col("term"), col("df"), col("tf_total"), col("postings"))
          .orderBy(col("term"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             |  FROM documents),
             |perdoc AS (
             |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
             |  FROM toks GROUP BY term, doc_id),
             |stats AS (
             |  SELECT term, CAST(count(*) AS BIGINT) AS df,
             |    CAST(sum(tf) AS BIGINT) AS tf_total
             |  FROM perdoc GROUP BY term),
             |ranked AS (
             |  SELECT term, doc_id, tf,
             |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
             |  FROM perdoc),
             |posts AS (
             |  SELECT term,
             |    string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)
             |      AS postings
             |  FROM ranked WHERE rn <= 20 GROUP BY term)
             |SELECT s.term, s.df, s.tf_total, p.postings
             |FROM stats s JOIN posts p USING (term)
             |WHERE s.df >= 10
             |ORDER BY s.term""".stripMargin)),

    // Q33l — per-domain corpus stats over URL parts (Graft.urlHost/
    // urlTld/urlPath): the CommonCrawl/C4-style grouping a web-scale
    // pipeline reports (docs and bytes per host, distinct pages). The
    // fixture carries no URLs, so the query synthesizes one per document
    // from fixture columns — both engines build the identical string, then
    // extract with the identical RE2-safe regexes. Per-row codegen
    // extraction + one partial-aggregated group-by; at 100 TB the
    // host-key shuffle is the only data movement, and hot hosts (the real
    // skew risk on web corpora) are exactly what AQE skew-join handles.
    Q("q33_domains",
      (s, d) => {
        val tld = when(pmod(col("doc_id"), lit(3)) === 0, "com")
          .when(pmod(col("doc_id"), lit(3)) === 1, "org")
          .otherwise("net")
        val url = concat(lit("https://"), col("source"), lit("."),
          col("lang"), lit(".example."), tld, lit("/"), col("lang"),
          lit("/"), col("doc_id").cast("string"))
        Tables(s, d, "documents")
          .withColumn("__url", url)
          .select(col("doc_id"), col("n_chars"),
            Graft.urlHost(col("__url")).as("host"),
            Graft.urlTld(col("__url")).as("tld"),
            Graft.urlPath(col("__url")).as("path"))
          .groupBy(col("tld"), col("host"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            count_distinct(col("path")).as("n_pages"))
          .orderBy(col("tld"), col("host"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id, n_chars,
             |    'https://' || source || '.' || lang || '.example.' ||
             |      CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
             |        ELSE 'net' END ||
             |      '/' || lang || '/' || CAST(doc_id AS VARCHAR) AS url
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, n_chars,
             |    regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS host,
             |    regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)', 1) AS path
             |  FROM u)
             |SELECT regexp_extract(host, '\.([A-Za-z0-9-]+)$', 1) AS tld,
             |  host,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  CAST(count(DISTINCT path) AS BIGINT) AS n_pages
             |FROM p GROUP BY tld, host ORDER BY tld, host""".stripMargin)),

    // Q33k — unigram-LM cross-entropy (Graft.lmScore): each document
    // scored against the corpus's own unigram distribution — the
    // model-free stand-in for a KenLM perplexity quality filter.
    // One explode feeds two partial-aggregated counts; the token join is
    // AQE-broadcastable at fixture scale, keyed+partial-aggregated at
    // corpus scale. Both engines sum ln(cnt/total) per doc (unordered
    // double sums land ~1e-13 apart — far under 6-dp hashing).
    Q("q33_lm_score",
      (s, d) => {
        Graft.lmScore(Tables(s, d, "documents"), id = col("doc_id"),
            text = col("text"))
          .select(col("id").as("doc_id"), col("n_tokens"), col("xent"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
             |  FROM documents),
             |cnts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
             |tot AS (SELECT count(*) AS tot FROM toks)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |  -sum(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))) / count(*)
             |    AS xent
             |FROM toks JOIN cnts USING (tok) CROSS JOIN tot
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Q33l — count-min-sketch heavy hitters (Graft.heavyHitters): tokens
    // whose CMS estimate reaches the threshold, single pass + bounded
    // memory. Engine-verified (DuckDB has no CMS): the driver checks
    // rows-only; the one-sided-error law (estimate >= exact, no false
    // negatives, eps-bounded overshoot) is proven against exact counts in
    // GraftApiSpec. Deterministic for the fixed seed.
    Q("q33_heavy",
      (s, d) => {
        val toks = Tables(s, d, "documents")
          .select(explode(split(lower(col("text")), " ")).as("token"))
        // standard phi-heavy-hitter threshold: count >= 1% of the
        // stream, read off the sketch's own totalCount (no count() job)
        Graft.heavyHittersPhi(toks, col("token"), phi = 0.01)
          .orderBy(col("token"))
      },
      None),

    // Q52 — per-language quality floor (Graft.quantileFilterPerGroup):
    // keep documents at or above their language's p25 length — the
    // quantile-threshold filter every training-mix pipeline runs before
    // sampling. Thresholds are one row per language (broadcast); exact
    // linear-interpolation percentile matches DuckDB's quantile_cont
    // definition bit-for-bit on this fixture.
    Q("q52_quantile_filter",
      (s, d) => {
        Graft.quantileFilterPerGroup(Tables(s, d, "documents"),
            group = col("lang"), value = col("n_chars"), q = 0.25)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH thr AS (
             |  SELECT lang, quantile_cont(n_chars, 0.25) AS t
             |  FROM documents GROUP BY lang)
             |SELECT doc_id, d.lang, n_chars
             |FROM documents d JOIN thr ON d.lang = thr.lang
             |WHERE CAST(n_chars AS DOUBLE) >= thr.t
             |ORDER BY doc_id""".stripMargin)),

    // Q55 — corpus-level boilerplate fraction (Graft.boilerplateFraction):
    // per doc, the share of its distinct 3-token shingles seen in >= 3
    // docs corpus-wide — the template/header detector that per-doc
    // repetition scores can't express. Explode -> shingle-keyed count ->
    // join back -> per-doc aggregate; every shuffle is keyed, none global.
    Q("q55_boilerplate",
      (s, d) => {
        Graft.boilerplateFraction(Tables(s, d, "documents"),
            id = col("doc_id"), text = col("text"), n = 3, minDf = 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    [array_to_string(ts[i:i+2], ' ')
             |     FOR i IN range(1, greatest(len(ts) - 2, 1) + 1)])) AS s
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ts
             |        FROM documents)),
             |dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             |  round(CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
             |        / count(*), 6) AS boiler_frac
             |FROM sh JOIN dfreq USING (s)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Q59 — bigram-LM cross-entropy (Graft.lmScoreBigram): per-doc fluency
    // under the corpus's own bigram conditionals — one Markov order above
    // q33_lm_score; catches shuffled/word-salad text whose unigrams are
    // all corpus-typical. Row-local bigram build, keyed count aggs + joins.
    Q("q59_lm_bigram",
      (s, d) => {
        Graft.lmScoreBigram(Tables(s, d, "documents"),
            id = col("doc_id"), text = col("text"))
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH bi AS (
             |  SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
             |    SELECT doc_id,
             |      unnest([{'w1': ts[i], 'w2': ts[i+1]}
             |              FOR i IN range(1, len(ts))]) AS b
             |    FROM (SELECT doc_id, string_split(lower(text), ' ') AS ts
             |          FROM documents))),
             |cb AS (SELECT w1, w2, count(*) AS cnt FROM bi GROUP BY w1, w2),
             |cl AS (SELECT w1, count(*) AS lcnt FROM bi GROUP BY w1)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |  -sum(ln(CAST(cnt AS DOUBLE) / CAST(lcnt AS DOUBLE)))
             |    / count(*) AS xent
             |FROM bi JOIN cb USING (w1, w2) JOIN cl USING (w1)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Q63 — token-distribution stats (Graft.tokenEntropy): unigram
    // Shannon entropy + type-token ratio per document — the corpus-free
    // lexical-diversity quality gate (low entropy = templated/repetitive
    // text) complementing q33_lm_score's corpus-relative fluency. One
    // explode into two keyed map-side-combinable aggregations; entropy
    // folded as ln n − (Σ c·ln c)/n so no per-token division.
    Q("q63_entropy",
      (s, d) => {
        Graft.tokenEntropy(Tables(s, d, "documents"),
            id = col("doc_id"), text = col("text"))
          .select(col("id").as("doc_id"), col("n_tokens"), col("n_types"),
            round(col("entropy"), 6).as("entropy"),
            round(col("ttr"), 6).as("ttr"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tc AS (
             |  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS c FROM (
             |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
             |    FROM documents)
             |  GROUP BY doc_id, tok)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS n_types,
             |  round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy,
             |  round(count(*) / sum(c), 6) AS ttr
             |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Q64 — canonical-URL dedup (Graft.canonicalizeUrl): collapse crawl
    // URL variants (host case, default ports, fragments, tracking params,
    // trailing slashes) onto one canonical key and keep-first per key —
    // the URL-level dedup pass that runs BEFORE any content hashing in a
    // web-corpus pipeline. Fixture URLs are synthesized as a pure
    // function of doc_id (page id = doc_id/4; variants 0-3 dirty the
    // same base URL four ways), so both engines build identical inputs;
    // variant 3 keeps its non-tracking `a=1` param — a different query
    // string IS a different page, and the group splits 3+1 by design.
    // Canonicalization is per-row codegen regex; dedup is one keyed agg.
    Q("q64_url_dedup",
      (s, d) => {
        val pid = expr("doc_id DIV 4")
        val host = concat(lit("src"), pmod(pid, lit(20)).cast("string"),
          lit(".example.com"))
        val path = concat(lit("/p/"), pid.cast("string"))
        val url = when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit("https://"), host, path))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            concat(lit("HTTPS://"), upper(host), path,
              lit("?utm_source=feed")))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            concat(lit("https://"), host, path, lit("/?ref=nav#frag")))
          .otherwise(
            concat(lit("https://"), host, lit(":443"), path,
              lit("?a=1&utm_campaign=x")))
        Tables(s, d, "documents")
          .select(col("doc_id"),
            Graft.canonicalizeUrl(url).as("canonical"))
          .groupBy(col("canonical"))
          .agg(min(col("doc_id")).as("keep_doc"),
            count(lit(1)).as("n_variants"))
          .orderBy(col("canonical"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    'src' || CAST((doc_id // 4) % 20 AS VARCHAR) ||
             |      '.example.com' AS host,
             |    '/p/' || CAST(doc_id // 4 AS VARCHAR) AS path
             |  FROM documents),
             |raw AS (
             |  SELECT doc_id, CASE doc_id % 4
             |    WHEN 0 THEN 'https://' || host || path
             |    WHEN 1 THEN 'HTTPS://' || upper(host) || path
             |      || '?utm_source=feed'
             |    WHEN 2 THEN 'https://' || host || path || '/?ref=nav#frag'
             |    ELSE 'https://' || host || ':443' || path
             |      || '?a=1&utm_campaign=x' END AS url
             |  FROM u),
             |c AS (
             |  SELECT doc_id,
             |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
             |      || '://' ||
             |    regexp_replace(lower(regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
             |      ':(80|443)$', '') ||
             |    CASE WHEN rest = '' THEN '/' ELSE rest END AS canonical
             |  FROM (
             |    SELECT doc_id, url, regexp_replace(regexp_replace(
             |      regexp_replace(regexp_replace(regexp_replace(
             |        regexp_replace(regexp_replace(url,
             |          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+', ''),
             |        '#.*$', ''),
             |        '([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&#]*',
             |        '\1', 'g'),
             |      '&&+', '&', 'g'), '\?&', '?'), '[?&]+$', ''),
             |      '/+$', '') AS rest
             |    FROM raw))
             |SELECT canonical, min(doc_id) AS keep_doc,
             |  CAST(count(*) AS BIGINT) AS n_variants
             |FROM c GROUP BY canonical ORDER BY canonical""".stripMargin)),

    // Q65 — perplexity bucketing (CCNet head/middle/tail): per language,
    // rank documents by unigram-LM cross-entropy and cut into terciles —
    // the quality-tier assignment that decides which corpus slice trains
    // vs gets filtered. ntile over a fully-tiebroken keyed window (xent
    // ties broken by doc_id, so bucket edges are deterministic on both
    // engines); the LM scoring underneath is q33_lm_score's keyed-agg
    // shape. Output: every doc with its tier + per-tier membership rank.
    Q("q65_ppl_bucket",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val scored = Graft.lmScore(docs, id = col("doc_id"), text = col("text"))
          .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("xent"), col("id"))
        scored.select(col("id").as("doc_id"), col("lang"),
            round(col("xent"), 6).as("xent"),
            ntile(3).over(w).as("tier"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
             |  FROM documents),
             |cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
             |tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks),
             |sc AS (
             |  SELECT doc_id,
             |    -sum(ln(CAST(c AS DOUBLE) / t)) / count(*) AS xent
             |  FROM toks JOIN cnt USING (tok) CROSS JOIN tot
             |  GROUP BY doc_id)
             |SELECT d.doc_id, d.lang, round(xent, 6) AS xent,
             |  CAST(ntile(3) OVER (PARTITION BY d.lang
             |    ORDER BY xent, d.doc_id) AS INTEGER) AS tier
             |FROM sc JOIN documents d USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // Q70 — PMI collocations (Graft.pmiBigrams): top-50 adjacent-token
    // pairs by pointwise mutual information with a count floor — the
    // association-mining pass behind tokenizer-vocab merges and
    // stop-phrase lists. All inputs to ln() are ratios of exact integer
    // counts (products < 2^53), so both engines feed ln the identical
    // double and even the sort key is bit-reproducible; ties broken by
    // (w1, w2). Keyed, map-side-combinable counts + single-token joins.
    Q("q70_pmi",
      (s, d) => {
        Graft.pmiBigrams(Tables(s, d, "documents"), col("text"),
            minCount = 5L, topN = 50)
          .select(col("w1"), col("w2"), col("c12"),
            // Exact.round6: PMI is signed — independence sits at 0
            graft.Exact.round6(col("pmi")).as("pmi"))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
      },
      Some("""WITH bi AS (
             |  SELECT b['w1'] AS w1, b['w2'] AS w2 FROM (
             |    SELECT unnest([{'w1': ts[i], 'w2': ts[i+1]}
             |                   FOR i IN range(1, len(ts))]) AS b
             |    FROM (SELECT string_split(lower(text), ' ') AS ts
             |          FROM documents))),
             |c AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
             |l AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
             |r AS (SELECT w2, count(*) AS c2 FROM bi GROUP BY w2),
             |t AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bi),
             |top AS (
             |  SELECT w1, w2, c12, ln(CAST(c12 AS DOUBLE) * n /
             |    (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) AS pmi
             |  FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t
             |  WHERE c12 >= 5
             |  ORDER BY pmi DESC, w1, w2 LIMIT 50)
             |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
             |  round(pmi, 6) + 0.0 AS pmi
             |FROM top ORDER BY pmi DESC, w1, w2""".stripMargin)),

    // Q73 — Zipf rank-frequency fit (Graft.zipfFit): per-language OLS of
    // ln(count) ~ ln(rank) over the token vocabulary — natural corpora
    // track slope ≈ −1; templated/generated text bends the curve, so the
    // slope is a cheap corpus-health gate and tokenizer-vocab input.
    // Keyed rank window with full (count desc, token) tiebreak; fit from
    // one keyed moment aggregation.
    Q("q73_zipf",
      (s, d) => {
        Graft.zipfFit(Tables(s, d, "documents"),
            group = col("lang"), text = col("text"))
          .select(col("grp").as("lang"), col("n_types"),
            // Exact.round6: the slope is negative by nature and the
            // intercept can sit near 0 for tiny vocabularies
            graft.Exact.round6(col("slope")).as("slope"),
            graft.Exact.round6(col("intercept")).as("intercept"))
          .orderBy(col("lang"))
      },
      Some("""WITH tok AS (
             |  SELECT lang, unnest(string_split(lower(text), ' ')) AS w
             |  FROM documents),
             |c AS (SELECT lang, w, count(*) AS cnt
             |      FROM tok GROUP BY lang, w),
             |r AS (SELECT lang,
             |    ln(CAST(row_number() OVER (PARTITION BY lang
             |      ORDER BY cnt DESC, w) AS DOUBLE)) AS x,
             |    ln(CAST(cnt AS DOUBLE)) AS y
             |  FROM c),
             |s AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             |    sum(x) AS sx, sum(y) AS sy,
             |    sum(x * y) AS sxy, sum(x * x) AS sxx
             |  FROM r GROUP BY lang)
             |SELECT lang, CAST(n AS BIGINT) AS n_types,
             |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0
             |    AS slope,
             |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
             |    / n, 6) + 0.0 AS intercept
             |FROM s ORDER BY lang""".stripMargin)),

    // Q160 — readability scoring (Flesch-reading-ease proxy): per-doc
    // words/sentence and vowel-groups/word (the syllable proxy that
    // needs no dictionary) folded into the standard FRE formula — the
    // document-difficulty facet of quality filtering (q33_quality gates
    // on shape; this gates on reading level). Sentence count via
    // terminal-punctuation stripping, vowel groups via one regex
    // collapse — pure per-row projections, scan-shaped at any scale.
    // Raw doubles both sides (identical op order).
    Q("q160_readability",
      (s, d) => {
        val words = size(split(col("text"), " ")).cast(LongType)
        val sentences = greatest(lit(1L),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[.!?]", "")))
            .cast(LongType))
        val vgroups =
          (length(regexp_replace(lower(col("text")), "[aeiou]+", "#")) -
            length(regexp_replace(lower(col("text")), "[aeiou]+", "")))
            .cast(LongType)
        Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), words.as("words"),
            sentences.as("sentences"), vgroups.as("vgroups"))
          .select(col("doc_id"), col("lang"), col("words"),
            col("sentences"), col("vgroups"),
            (lit(206.835) -
              lit(1.015) * (col("words").cast(DoubleType) /
                col("sentences").cast(DoubleType)) -
              lit(84.6) * (col("vgroups").cast(DoubleType) /
                col("words").cast(DoubleType))).as("fre"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH m AS (
             |  SELECT doc_id, lang,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
             |    greatest(1, CAST(length(text) -
             |      length(regexp_replace(text, '[.!?]', '', 'g'))
             |      AS BIGINT)) AS sentences,
             |    CAST(length(regexp_replace(lower(text), '[aeiou]+',
             |        '#', 'g')) -
             |      length(regexp_replace(lower(text), '[aeiou]+', '',
             |        'g')) AS BIGINT) AS vgroups
             |  FROM documents)
             |SELECT doc_id, lang, words, sentences, vgroups,
             |  206.835 - 1.015 * (CAST(words AS DOUBLE) /
             |      CAST(sentences AS DOUBLE)) -
             |    84.6 * (CAST(vgroups AS DOUBLE) / CAST(words AS DOUBLE))
             |    AS fre
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Q33s — blocklist screening: score each document by the fraction
    // of tokens that hit a curated blocklist — the pre-train content
    // filter every corpus pipeline runs before anything reaches a
    // tokenizer. Pure per-row codegen (split + higher-order filter
    // against a literal array): no explode, no shuffle, no UDF — the
    // scorer rides the scan at full speed and the flag threshold is a
    // plain pushable predicate if a pipeline filters on it.
    Q("q167_blocklist",
      (s, d) => {
        val terms = array(Seq("slow", "merge", "dup").map(lit): _*)
        Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
            size(filter(split(col("text"), " "),
              t => array_contains(terms, t))).cast(LongType).as("hits"))
          .withColumn("hit_rate",
            col("hits").cast(DoubleType) / col("n_tokens"))
          .withColumn("blocked",
            (col("hit_rate") > 0.08).cast(IntegerType))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  CAST(len(list_filter(string_split(text, ' '),
             |    t -> list_contains(['slow', 'merge', 'dup'], t)))
             |    AS BIGINT) AS hits,
             |  CAST(len(list_filter(string_split(text, ' '),
             |      t -> list_contains(['slow', 'merge', 'dup'], t)))
             |      AS DOUBLE) /
             |    len(string_split(text, ' ')) AS hit_rate,
             |  CASE WHEN CAST(len(list_filter(string_split(text, ' '),
             |        t -> list_contains(['slow', 'merge', 'dup'], t)))
             |        AS DOUBLE) /
             |      len(string_split(text, ' ')) > 0.08
             |    THEN 1 ELSE 0 END AS blocked
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Q33t — novelty growth curve: 5-token shingles are attributed to
    // the ingest batch (doc_id DIV 50) where they FIRST appear;
    // new-shingle counts per batch plus the cumulative shingle-
    // vocabulary size trace the Heaps-law curve that tells a curation
    // pipeline when a source stops contributing novelty. First-seen is
    // one shingle-keyed min aggregate; the cumulative rides
    // Graft.prefixSumExclusive's two-level chunked scan, so no window
    // ever holds the batch dimension in a single task.
    Q("q170_vocab_growth",
      (s, d) => {
        val perBatch = Tables(s, d, "documents")
          .select(floor(col("doc_id") / 50).cast(LongType).as("batch"),
            explode(Graft.shingleSet(col("text"), 5)).as("sh"))
          .groupBy(col("sh")).agg(min(col("batch")).as("batch"))
          .groupBy(col("batch")).agg(count(lit(1)).as("new_shingles"))
          // one row per batch, but the lineage above it is the full
          // shingle explode + two keyed aggs — prefixSumExclusive reads
          // its input twice (carry + join), and uncached each read
          // re-explodes the corpus (r18: 2 Generate passes → 1)
          .cache()
        Graft.prefixSumExclusive(perBatch, col("batch"),
            col("new_shingles"), "prev_vocab")
          .select(col("batch"), col("new_shingles"),
            (col("prev_vocab") + col("new_shingles")).as("vocab_size"))
          .orderBy(col("batch"))
      },
      Some("""WITH fs AS (
             |  SELECT sh, min(batch) AS batch FROM (
             |    SELECT doc_id // 50 AS batch, unnest(list_distinct(
             |      [array_to_string(ts[i:i+4], ' ')
             |       FOR i IN range(1, greatest(len(ts) - 4, 1) + 1)]))
             |      AS sh
             |    FROM (SELECT doc_id, string_split(text, ' ') AS ts
             |          FROM documents))
             |  GROUP BY sh),
             |pb AS (
             |  SELECT batch, CAST(count(*) AS BIGINT) AS new_shingles
             |  FROM fs GROUP BY batch)
             |SELECT batch, new_shingles,
             |  CAST(sum(new_shingles) OVER (ORDER BY batch) AS BIGINT)
             |    AS vocab_size
             |FROM pb ORDER BY batch""".stripMargin)),

    // Q179 — adjacent-batch vocabulary drift (r13): Jaccard similarity of
    // 5-token shingle sets between ingest batch b and b+1 — the drift
    // SERIES a pipeline alerts on (q170 answers "is novelty flattening",
    // this answers "did the distribution jump between two drops"; q157
    // compares SOURCES, not time order). One distinct (batch, shingle)
    // projection; intersections via a shingle equi-join restricted to the
    // b→b+1 diagonal, |A∪B| recovered from sizes — never a batch×batch
    // product over shingles.
    Q("q179_batch_drift",
      (s, d) => {
        // r18: ONE tokenize pass — collect_set dedups (batch, shingle)
        // inside a per-shingle aggregate (replacing explode → distinct →
        // self-join, which re-exploded the corpus once per consumer).
        // Sizes and the b→b+1 intersections both derive from it:
        // n_common(b) counts shingles whose batch set holds both b and
        // b+1 — exactly the former diagonal join. r19: the r18 `.cache()`
        // dropped (q157's precedent — the materialization barrier
        // anti-scaled, 8c/32c 0.95; the two consumer branches recompute
        // in parallel instead).
        val bySh = Tables(s, d, "documents")
          .select(floor(col("doc_id") / 50).cast(LongType).as("batch"),
            explode(Graft.shingleSet(col("text"), 5)).as("sh"))
          .groupBy(col("sh"))
          .agg(sort_array(collect_set(col("batch"))).as("bs"))
        val sizes = bySh.select(explode(col("bs")).as("batch"))
          .groupBy(col("batch")).agg(count(lit(1)).as("n"))
        val inter = bySh
          .select(explode(filter(col("bs"),
            b => array_contains(col("bs"), b + 1))).as("batch"))
          .groupBy(col("batch")).agg(count(lit(1)).as("n_common"))
        sizes.toDF("batch", "n_a")
          .join(sizes.toDF("batch_b", "n_b"),
            col("batch_b") === col("batch") + 1)
          .join(inter, Seq("batch"), "left")
          .na.fill(0L, Seq("n_common"))
          .select(col("batch"), col("n_a"), col("n_b"), col("n_common"),
            Exact.round6(col("n_common").cast(DoubleType) /
              (col("n_a") + col("n_b") - col("n_common")).cast(DoubleType))
              .as("jaccard"))
          .orderBy(col("batch"))
      },
      Some("""WITH fs AS (
             |  SELECT DISTINCT doc_id // 50 AS batch, sh FROM (
             |    SELECT doc_id, unnest(list_distinct(
             |      [array_to_string(ts[i:i+4], ' ')
             |       FOR i IN range(1, greatest(len(ts) - 4, 1) + 1)]))
             |      AS sh
             |    FROM (SELECT doc_id, string_split(text, ' ') AS ts
             |          FROM documents))),
             |sizes AS (
             |  SELECT batch, CAST(count(*) AS BIGINT) AS n
             |  FROM fs GROUP BY batch),
             |inter AS (
             |  SELECT a.batch, CAST(count(*) AS BIGINT) AS n_common
             |  FROM fs a JOIN fs b
             |    ON a.sh = b.sh AND b.batch = a.batch + 1
             |  GROUP BY a.batch),
             |adj AS (
             |  SELECT sa.batch, sa.n AS n_a, sb.n AS n_b
             |  FROM sizes sa JOIN sizes sb ON sb.batch = sa.batch + 1)
             |SELECT adj.batch, n_a, n_b,
             |  COALESCE(n_common, 0) AS n_common,
             |  round(CAST(COALESCE(n_common, 0) AS DOUBLE) /
             |    CAST(n_a + n_b - COALESCE(n_common, 0) AS DOUBLE), 6) + 0.0
             |    AS jaccard
             |FROM adj LEFT JOIN inter ON adj.batch = inter.batch
             |ORDER BY adj.batch""".stripMargin)),

    // Q182 — code-switch screen (r13): q33_langid picks each doc's ONE
    // best language; this flags docs hitting ≥2 language profiles (top-5
    // tokens per labeled language, ≥2 distinct-token hits each) — the
    // mixed-language documents a monolingual training mix should route or
    // drop, invisible to an argmax classifier. Same broadcast profile
    // join as langid; TOTAL over the corpus (zero-hit docs come back
    // unmixed, never vanish).
    Q("q182_lang_mix",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val byLang = Window.partitionBy(col("lang"))
          .orderBy(col("cnt").desc, col("tok"))
        val profiles = docs
          .select(col("lang"), explode(split(lower(col("text")), " "))
            .as("tok"))
          .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(byLang))
          .filter(col("rn") <= 5)
          .select(col("lang").as("p_lang"), col("tok"))
        val perDoc = docs
          .select(col("doc_id"),
            explode(array_distinct(split(lower(col("text")), " ")))
              .as("dtok"))
          .join(broadcast(profiles), col("dtok") === col("tok"))
          .groupBy(col("doc_id"), col("p_lang"))
          .agg(count(lit(1)).as("hits"))
          .where(col("hits") >= 2)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_langs_hit"),
            sum(col("hits")).as("total_hits"))
        docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_langs_hit", "total_hits"))
          .withColumn("mixed", col("n_langs_hit") >= 2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
             |  FROM documents),
             |cnt AS (
             |  SELECT lang, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |prof AS (
             |  SELECT lang AS p_lang, tok FROM (
             |    SELECT lang, tok, row_number() OVER (
             |      PARTITION BY lang ORDER BY c DESC, tok) AS rn
             |    FROM cnt) WHERE rn <= 5),
             |dt AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    string_split(lower(text), ' '))) AS dtok
             |  FROM documents),
             |h AS (
             |  SELECT doc_id, p_lang, CAST(count(*) AS BIGINT) AS hits
             |  FROM dt JOIN prof ON dtok = tok GROUP BY 1, 2),
             |pd AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_langs_hit,
             |    CAST(sum(hits) AS BIGINT) AS total_hits
             |  FROM h WHERE hits >= 2 GROUP BY 1)
             |SELECT d.doc_id,
             |  COALESCE(n_langs_hit, 0) AS n_langs_hit,
             |  COALESCE(total_hits, 0) AS total_hits,
             |  COALESCE(n_langs_hit, 0) >= 2 AS mixed
             |FROM documents d LEFT JOIN pd USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // Q188 — top-token rank churn between corpus halves (r13): the
    // top-20 tokens of the first doc-id half vs the second, full-outer
    // joined — entered/dropped/moved tokens are the cheapest drift alarm
    // there is (q179's shingle Jaccard weighs ALL vocabulary; this
    // watches the head, where a template or spam infusion shows first).
    // Ranks are deterministic (count desc, token asc); each half's
    // top-20 comes off one hash aggregate + a TakeOrderedAndProject
    // (per-partition heaps — r14 fix: the r13 shape ran a row_number
    // window over the FULL vocab-sized frequency table in one task);
    // the rank window now runs over exactly 20 rows. The half cut is a
    // broadcast one-row bounds frame (q78 pattern), not a driver .head().
    Q("q188_rank_churn",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val cut = docs.agg(
          floor(max(col("doc_id")) / 2).cast(LongType).as("c"))
        val withCut = docs.crossJoin(broadcast(cut))
        def top(half: org.apache.spark.sql.DataFrame, rcol: String) = {
          val w = Window.orderBy(col("n").desc, col("tok")) // 20 rows
          half.select(explode(split(lower(col("text")), " ")).as("tok"))
            .groupBy(col("tok")).agg(count(lit(1)).as("n"))
            .orderBy(col("n").desc, col("tok")).limit(20)
            .withColumn(rcol, row_number().over(w))
            .select(col("tok"), col(rcol))
        }
        top(withCut.where(col("doc_id") <= col("c")), "rank_a")
          .join(top(withCut.where(col("doc_id") > col("c")), "rank_b"),
            Seq("tok"), "full_outer")
          .select(col("tok"), col("rank_a"), col("rank_b"),
            when(col("rank_a").isNotNull && col("rank_b").isNotNull, "both")
              .when(col("rank_a").isNotNull, "dropped")
              .otherwise("entered").as("status"))
          .orderBy(col("tok"))
      },
      Some("""WITH cut AS (SELECT max(doc_id) // 2 AS c FROM documents),
             |ta AS (
             |  SELECT tok, row_number() OVER (ORDER BY n DESC, tok)
             |    AS rank_a
             |  FROM (SELECT tok, count(*) AS n FROM (
             |      SELECT unnest(string_split(lower(text), ' ')) AS tok
             |      FROM documents, cut WHERE doc_id <= c) GROUP BY tok)
             |  QUALIFY rank_a <= 20),
             |tb AS (
             |  SELECT tok, row_number() OVER (ORDER BY n DESC, tok)
             |    AS rank_b
             |  FROM (SELECT tok, count(*) AS n FROM (
             |      SELECT unnest(string_split(lower(text), ' ')) AS tok
             |      FROM documents, cut WHERE doc_id > c) GROUP BY tok)
             |  QUALIFY rank_b <= 20)
             |SELECT COALESCE(ta.tok, tb.tok) AS tok,
             |  CAST(rank_a AS INTEGER) AS rank_a,
             |  CAST(rank_b AS INTEGER) AS rank_b,
             |  CASE WHEN rank_a IS NOT NULL AND rank_b IS NOT NULL
             |    THEN 'both' WHEN rank_a IS NOT NULL THEN 'dropped'
             |    ELSE 'entered' END AS status
             |FROM ta FULL OUTER JOIN tb ON ta.tok = tb.tok
             |ORDER BY tok""".stripMargin)),

    // Q192 — bytes-per-token by language (r13): UTF-8 bytes per
    // whitespace token per language — the capacity-planning number for a
    // multilingual mix (a fixed token budget buys different byte volumes
    // per language; CJK and diacritic-heavy scripts skew it). Pure
    // scan-shaped per-row projections + one keyed aggregate.
    Q("q192_bytes_per_token",
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("lang"),
            octet_length(col("text")).cast(LongType).as("bytes"),
            size(split(col("text"), " ")).cast(LongType).as("toks"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("bytes")).as("total_bytes"),
            sum(col("toks")).as("total_tokens"))
          .withColumn("bytes_per_token",
            Exact.round6(col("total_bytes").cast(DoubleType) /
              col("total_tokens").cast(DoubleType)))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT)
             |    AS total_tokens,
             |  round(CAST(sum(strlen(text)) AS DOUBLE) /
             |    CAST(sum(len(string_split(text, ' '))) AS DOUBLE), 6)
             |    + 0.0 AS bytes_per_token
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Q211 — language-ID confusion matrix: true lang × predicted lang
    // counts over q33_langid's profile classifier — the error-structure
    // readout (WHICH languages bleed into which) that q33_langid's
    // per-document table and q199's agreement scalar both summarize
    // away. Same broadcast-profile shape as q33_langid plus one keyed
    // aggregate.
    Q("q211_langid_confusion",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        graft.api.Graft.languageId(docs, id = col("doc_id"),
            text = col("text"), langCol = col("lang"))
          .filter(col("pred_lang").isNotNull)
          .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("pred_lang"))
      },
      Some("""WITH profiles AS (
             |  SELECT lang AS p_lang, tok FROM (
             |    SELECT lang, tok, count(*) AS cnt,
             |      row_number() OVER (PARTITION BY lang
             |        ORDER BY count(*) DESC, tok) AS rn
             |    FROM (SELECT lang,
             |            unnest(string_split(lower(text), ' ')) AS tok
             |          FROM documents)
             |    GROUP BY lang, tok)
             |  WHERE rn <= 5),
             |scored AS (
             |  SELECT d.doc_id, d.lang, p.p_lang, count(*) AS hits
             |  FROM (SELECT doc_id, lang,
             |          list_distinct(string_split(lower(text), ' '))
             |            AS dtoks
             |        FROM documents) d
             |  JOIN profiles p ON list_contains(d.dtoks, p.tok)
             |  GROUP BY d.doc_id, d.lang, p.p_lang),
             |pred AS (
             |  SELECT lang, p_lang AS pred_lang FROM (
             |    SELECT *, row_number() OVER (PARTITION BY doc_id
             |      ORDER BY hits DESC, p_lang) AS rn FROM scored)
             |  WHERE rn = 1)
             |SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
             |FROM pred GROUP BY lang, pred_lang
             |ORDER BY lang, pred_lang""".stripMargin)),

    // Q236 — per-batch duplication trend (r15): the CURATION dashboard
    // number — what share of each ingest batch was already seen in an
    // EARLIER batch (first-seen attribution on the q227 5-token-prefix
    // fingerprint; batches derive from doc_id, the fixture convention).
    // q206 histograms family sizes and q227 audits cross-source pairs;
    // this is the third axis — the TREND that says when a source's
    // novelty collapses and crawling it stops paying. First-seen is one
    // fingerprint-keyed min aggregate; everything shuffles signatures,
    // never text.
    Q("q236_dup_trend",
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select((col("doc_id") % 8).as("batch"),
            array_join(slice(split(lower(col("text")), " "), 1, 5), " ")
              .as("fp"))
        val firstSeen = docs.groupBy(col("fp"))
          .agg(min(col("batch")).as("first_b"))
        docs.join(firstSeen, "fp")
          .groupBy(col("batch"))
          .agg(count(lit(1)).as("docs"),
            sum((col("batch") > col("first_b")).cast(LongType))
              .cast(LongType).as("dups"))
          .select(col("batch"), col("docs"), col("dups"),
            Exact.round6(col("dups").cast(DoubleType) /
              col("docs").cast(DoubleType)).as("dup_share"))
          .orderBy(col("batch"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id % 8 AS batch,
             |    array_to_string(string_split(lower(text), ' ')[1:5], ' ')
             |      AS fp
             |  FROM documents),
             |fb AS (SELECT fp, min(batch) AS first_b FROM d GROUP BY fp)
             |SELECT batch, CAST(count(*) AS BIGINT) AS docs,
             |  CAST(sum(CASE WHEN batch > first_b THEN 1 ELSE 0 END)
             |    AS BIGINT) AS dups,
             |  round(CAST(sum(CASE WHEN batch > first_b THEN 1 ELSE 0 END)
             |    AS DOUBLE) / count(*), 6) + 0.0 AS dup_share
             |FROM d JOIN fb USING (fp)
             |GROUP BY batch ORDER BY batch""".stripMargin)),

    // Q237 — token-length histogram (r15): the length DISTRIBUTION per
    // source on power-of-two buckets — the shape (not just q49-style
    // moments) that exposes truncation cliffs, boilerplate spikes, and
    // context-window fit before any tokenizer run. The bucket index is a
    // SUM OF EXACT INTEGER COMPARISONS (log2/floor on doubles misrounds
    // at the powers of two — the documented digit-extraction hazard);
    // one hash aggregate, ≤10 buckets × sources rows at any scale.
    Q("q237_len_hist",
      (s, d) => {
        val n = size(split(col("text"), " ")).cast(LongType)
        val bucket = Seq(4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L, 1024L)
          .map(b => (n >= b).cast(LongType))
          .reduce(_ + _)
        Tables(s, d, "documents")
          .select(col("source"), bucket.as("bucket"), n.as("n"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("docs"),
            min(col("n")).as("min_tokens"),
            max(col("n")).as("max_tokens"))
          .orderBy(col("source"), col("bucket"))
      },
      Some("""WITH t AS (
             |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT)
             |    AS n
             |  FROM documents)
             |SELECT source,
             |  CAST(CAST(n >= 4 AS INTEGER) + CAST(n >= 8 AS INTEGER)
             |    + CAST(n >= 16 AS INTEGER) + CAST(n >= 32 AS INTEGER)
             |    + CAST(n >= 64 AS INTEGER) + CAST(n >= 128 AS INTEGER)
             |    + CAST(n >= 256 AS INTEGER) + CAST(n >= 512 AS INTEGER)
             |    + CAST(n >= 1024 AS INTEGER) AS BIGINT) AS bucket,
             |  CAST(count(*) AS BIGINT) AS docs,
             |  CAST(min(n) AS BIGINT) AS min_tokens,
             |  CAST(max(n) AS BIGINT) AS max_tokens
             |FROM t GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin))
  )
}
