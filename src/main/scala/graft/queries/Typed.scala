package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Typed Dataset surface (SURVEY §1.3: case-class Encoders where type
  * safety helps): groupByKey + mapGroups and cogroup as declared queries.
  * Both have exact relational equivalents, so they stay oracle-paired —
  * the point is that the typed path produces identical results to the
  * declarative one.
  *
  * Scale note: mapGroups/cogroup shuffle by key and stream each group as
  * an iterator — safe as long as per-group state is O(1) (here: a running
  * max / two counters), never a group materialization.
  */
object Typed {

  case class Doc(doc_id: Long, lang: String, n_chars: Long)
  case class LangTop(lang: String, top_doc: Long, max_chars: Long)
  case class KeyCount(k: Long, n_cust: Long, n_ord: Long)

  val qs: Seq[Q] = Seq(
    // Typed groupByKey -> mapGroups: per-language doc with the most
    // characters (deterministic tiebreak on doc_id), computed with a
    // streaming fold over the group iterator.
    Q("q43_typed_mapgroups",
      (s, d) => {
        import s.implicits._
        Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars")).as[Doc]
          .groupByKey(_.lang)
          .mapGroups { (lang, docs) =>
            var best: Doc = null
            docs.foreach { doc =>
              if (best == null || doc.n_chars > best.n_chars ||
                (doc.n_chars == best.n_chars && doc.doc_id < best.doc_id))
                best = doc
            }
            LangTop(lang, best.doc_id, best.n_chars)
          }
          .toDF()
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, doc_id AS top_doc, n_chars AS max_chars FROM (
             |  SELECT lang, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY n_chars DESC, doc_id) AS rn
             |  FROM documents) WHERE rn = 1
             |ORDER BY lang""".stripMargin)),

    // Typed cogroup: customers and orders streamed per custkey-bucket,
    // counting both sides — the typed dual of a full-outer grouped join.
    Q("q43_typed_cogroup",
      (s, d) => {
        import s.implicits._
        val cust = Tables(s, d, "customer")
          .select(col("c_custkey").as("k")).as[Tuple1[Long]]
          .groupByKey(_._1)
        val ord = Tables(s, d, "orders")
          .select(col("o_custkey").as("k")).as[Tuple1[Long]]
          .groupByKey(_._1)
        cust.cogroup(ord) { (k, cs, os) =>
          Iterator.single(KeyCount(k, cs.size.toLong, os.size.toLong))
        }
          .toDF()
          .orderBy(col("k"))
      },
      Some("""SELECT coalesce(c.k, o.k) AS k,
             |  coalesce(n_cust, 0) AS n_cust, coalesce(n_ord, 0) AS n_ord
             |FROM (SELECT c_custkey AS k, count(*) AS n_cust
             |      FROM customer GROUP BY 1) c
             |FULL OUTER JOIN (SELECT o_custkey AS k, count(*) AS n_ord
             |                 FROM orders GROUP BY 1) o
             |  ON c.k = o.k
             |ORDER BY k""".stripMargin)))
}
