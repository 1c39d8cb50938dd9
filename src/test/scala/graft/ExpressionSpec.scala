package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The native CosineSimilarity expression: SQL registration, codegen vs
  * interpreted parity, parity with the higher-order-function formulation,
  * and null/edge behavior.
  */
class ExpressionSpec extends SparkSpec {

  test("cosine_sim is registered and callable from SQL") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS s"""
        .stripMargin).head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("expression matches the HOF formulation bit-for-bit on fixture embeddings") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables(spark, sfDir, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val hofDot = aggregate(zip_with(col("embedding"), col("q"),
      (x, y) => x.cast(DoubleType) * y.cast(DoubleType)), lit(0.0), _ + _)
    val hofNorm = (c: org.apache.spark.sql.Column) => sqrt(aggregate(
      transform(c, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), _ + _))
    val both = e.crossJoin(broadcast(qv)).select(
      call_function("cosine_sim", col("embedding"), col("q")).as("native"),
      (hofDot / (hofNorm(col("embedding")) * hofNorm(col("q")))).as("hof"))
    // bit-identical accumulation: exact equality, not approximate
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("null inputs yield null; orthogonal vectors yield 0") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>),
        |                  CAST(array(1.0) AS ARRAY<FLOAT>)) AS s"""
        .stripMargin).head()
    assert(r.isNullAt(0))
    val o = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)) AS s"""
        .stripMargin).head().getDouble(0)
    assert(o == 0.0)
  }

  test("type mismatch is an analysis-time error") {
    GraftFunctions.ensureRegistered(spark)
    intercept[Exception] {
      spark.sql("SELECT cosine_sim(array('a'), array('b'))").collect()
    }
  }

  test("null ELEMENTS contribute 0, not a crash (containsNull input)") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, NULL, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 2.0, 0.0) AS ARRAY<FLOAT>)) AS s"""
        .stripMargin).head().getDouble(0)
    // null elem = 0 contribution: dot=1, |x|=1, |y|=sqrt(5)
    assert(math.abs(r - 1.0 / math.sqrt(5.0)) < 1e-12)
  }

  test("simhash matches the per-bit HOF formulation on fixture documents") {
    GraftFunctions.ensureRegistered(spark)
    val hs = transform(graft.api.Graft.tokenSet(col("text")),
      t => graft.api.Graft.phash32(t))
    val hof = (0 until 32).map { b =>
      val vote = aggregate(col("__hs"), lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val both = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), hs.as("__hs"))
      .select(call_function("simhash", col("__hs"), lit(32)).as("native"),
        hof.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("simhash: null element votes -1 on every bit (HOF parity); null array is null") {
    GraftFunctions.ensureRegistered(spark)
    // [3, NULL]: bit0 votes +1-1=0 -> unset; bit1 votes +1-1=0 -> unset
    val r = spark.sql(
      "SELECT simhash(array(3L, CAST(NULL AS BIGINT)), 2) AS s").head().getLong(0)
    assert(r == 0L)
    // [3, 1]: bit0 +2 -> set; bit1 0 -> unset
    val r2 = spark.sql("SELECT simhash(array(3L, 1L), 2) AS s").head().getLong(0)
    assert(r2 == 1L)
    assert(spark.sql("SELECT simhash(CAST(NULL AS ARRAY<BIGINT>), 2) AS s")
      .head().isNullAt(0))
  }

  test("simhash bits bounds are analysis-time errors") {
    GraftFunctions.ensureRegistered(spark)
    intercept[Exception] {
      spark.sql("SELECT simhash(array(1L), 0)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT simhash(array(1L), 65)").collect()
    }
  }

  test("dup_ngram_frac matches the interpreted HOF formulation on fixtures + edges") {
    GraftFunctions.ensureRegistered(spark)
    // the exact HOF pipeline the native expression replaced — kept here as
    // the semantic oracle so any drift breaks loudly
    def hof(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(text, " ")
      val grams = transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " "))
      lit(1.0) - size(array_distinct(grams)).cast(DoubleType) /
        size(grams).cast(DoubleType)
    }
    import spark.implicits._
    val edges = Seq(
      "", " ", "  ", "a", "a a", "a a a a", "a  b", " a b ",
      "x y z w", "x y x y x y", "héllo wörld héllo wörld",
      "единственный 単語 mixed マルチバイト 単語").toDF("text")
    val fixtures = Tables(spark, sfDir, "documents").select(col("text"))
    for (n <- Seq(1, 2, 3); df <- Seq(edges, fixtures)) {
      val bad = df.select(
        call_function("dup_ngram_frac", col("text"), lit(n)).as("native"),
        hof(col("text"), n).as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(bad.count() == 0, s"n=$n mismatch")
    }
  }

  test("dup_ngram_frac: null text is null; n bounds are analysis-time errors") {
    GraftFunctions.ensureRegistered(spark)
    assert(spark.sql("SELECT dup_ngram_frac(CAST(NULL AS STRING), 1) AS s")
      .head().isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT dup_ngram_frac('a b', 0)").collect()
    }
  }

  test("nfc_normalize: decomposed forms compose; already-NFC passes through") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // decomposed 'e'+COMBINING ACUTE (U+0301) -> composed U+00E9;
    // ANGSTROM SIGN (U+212B) -> LATIN A WITH RING (U+00C5)
    val decomposed = "cafe\u0301 \u212b plain"
    val composed = "caf\u00e9 \u00c5 plain"
    val out = Seq(decomposed, composed, "plain ascii", null)
      .toDF("t")
      .select(call_function("nfc_normalize", col("t")).as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) == composed)
    assert(out(1) == composed)
    assert(out(2) == "plain ascii")
    assert(out(3) == null)
  }

  test("l2_sq matches the HOF fold bit-for-bit on fixture embeddings") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables(spark, sfDir, "embeddings")
    val d = transform(col("embedding"), x => x.cast(DoubleType))
    val qv = e.filter(col("vec_id") === 0).select(
      transform(col("embedding"), x => x.cast(DoubleType)).as("q"))
    val hof = aggregate(zip_with(d, col("q"), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)
    val both = e.crossJoin(broadcast(qv)).select(
      call_function("l2_sq", d, col("q")).as("native"), hof.as("hof"))
    // same sequential element-order accumulation: exact equality
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("l2_sq null/edge behavior: null array, null element, length mismatch") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT l2_sq(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS s").head()
    assert(r.isNullAt(0), "null input -> null")
    val z = spark.sql(
      """SELECT l2_sq(array(1.0d, CAST(NULL AS DOUBLE)),
        |             array(1.0d, 5.0d)) AS s""".stripMargin)
      .head().getDouble(0)
    assert(z == 25.0, "null element contributes 0.0, not a crash")
    val p = spark.sql(
      "SELECT l2_sq(array(1.0d, 2.0d, 99.0d), array(1.0d, 4.0d)) AS s")
      .head().getDouble(0)
    assert(p == 4.0, "length mismatch uses the common prefix")
    intercept[Exception] {
      spark.sql("SELECT l2_sq(array('a'), array('b'))").collect()
    }
  }

  test("jaro_winkler matches the oracle engine's builtin bit-for-bit") {
    GraftFunctions.ensureRegistered(spark)
    // Constants are duckdb jaro_winkler_similarity outputs, exact doubles
    // (the prototype kernel matched it on 25k random pairs + all fixture
    // part-name pairs with zero bit mismatches before porting).
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // boost, prefix 3
      ("dixon", "dicksonx", 0.8133333333333332),  // boost, uneven lengths
      ("ab", "abcdefghij", 0.7866666666666667),   // boost just above 0.7
      ("aaaaaa", "aaabbb", 0.6666666666666666),   // prefix 3 but NO boost
      ("CRATE", "TRACE", 0.7333333333333334),     // eligible, prefix 0
      ("abcd", "abdc", 0.9333333333333333),       // one transposition
      ("xy", "yx", 0.0),                          // window 0: no matches
      ("abcdef", "abcdef", 1.0),
      ("", "", 0.0), ("a", "", 0.0))              // empty -> 0, not 1
    for ((a, b, want) <- cases) {
      val got = spark.sql(s"SELECT jaro_winkler('$a', '$b') AS s")
        .head().getDouble(0)
      assert(got == want, s"jw($a,$b): got $got want $want")
    }
    assert(spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'x') AS s")
      .head().isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT jaro_winkler(1, 'x')").collect()
    }
  }
}
