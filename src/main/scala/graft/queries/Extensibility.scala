package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** User-extension surface: UDF, typed Aggregator UDAF, generator/UDTF
  * (SURVEY.md §2B Q40–Q42).
  *
  * Scale notes:
  *  - The UDF/UDAF run as registered SQL functions, so they flow through
  *    the same partial/final aggregation and codegen pipeline as builtins
  *    (a Scala UDF is an eval boundary — fine for the declared surface;
  *    the hot-path alternative is a Catalyst Expression, see
  *    functions/CosineSimilarity notes).
  *  - WeightedAvg accumulates in BigDecimal: exact, order-independent
  *    across partitions — the same trick as [[graft.Exact]], required for
  *    cross-engine hash equality and deterministic at any partition count.
  */
object Extensibility {

  /** Q41 — exact weighted average: sum(v*w)/sum(w) with decimal
    * accumulation. IN = (value, weight) as two SQL args.
    */
  class WeightedAvg extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
    override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    override def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
      (b._1 + BigDecimal(a._1) * BigDecimal(a._2), b._2 + BigDecimal(a._2))
    override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (BigDecimal, BigDecimal)): Double =
      if (r._2 == BigDecimal(0)) Double.NaN else r._1.toDouble / r._2.toDouble
    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.product[(BigDecimal, BigDecimal)]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val qs: Seq[Q] = Seq(
    // Q40 — scalar UDF registered and invoked through the SQL surface.
    Q("q40_udf",
      (s, d) => {
        s.udf.register("l2_norm", (a: Seq[Float]) =>
          math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)))
        Tables(s, d, "embeddings").createOrReplaceTempView("q40_emb")
        s.sql("""SELECT vec_id, label, l2_norm(embedding) AS l2
                |FROM q40_emb ORDER BY vec_id""".stripMargin)
      },
      Some("""SELECT vec_id, label,
             |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
             |       x -> x * x))) AS l2
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // Q41 — typed Aggregator UDAF through the SQL surface: exact weighted
    // average of extendedprice weighted by quantity, per return flag.
    Q("q41_udaf",
      (s, d) => {
        s.udf.register("wavg", udaf(new WeightedAvg))
        Tables(s, d, "lineitem").createOrReplaceTempView("q41_li")
        s.sql("""SELECT l_returnflag,
                |  wavg(l_extendedprice, l_quantity) AS wavg_price
                |FROM q41_li GROUP BY l_returnflag
                |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6)) *
             |           CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) /
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
             |    AS wavg_price
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Q42 — generator/UDTF surface: (pos, word) per document token.
    // posexplode is a Generator in the logical plan — the engine's native
    // table-function mechanism (no row-by-row UDF).
    Q("q42_udtf",
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
          .orderBy(col("doc_id"), col("pos"))
      },
      Some("""SELECT doc_id, CAST(pos AS INT) AS pos, word FROM (
             |  SELECT doc_id,
             |    unnest(generate_series(0, len(string_split(text, ' ')) - 1))
             |      AS pos,
             |    unnest(string_split(text, ' ')) AS word
             |  FROM documents)
             |ORDER BY doc_id, pos""".stripMargin)))
}
