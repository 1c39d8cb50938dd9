package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Session-parser extension: plain `spark.sql(...)` accepts the ENGINE
  * grammar — `OPTIMIZE`, `VACUUM`, `EXPIRE VERSIONS`, `RESTORE`,
  * `DESCRIBE HISTORY`, `SET SKIPPING`, `REFRESH ROLLUP`, change-feed
  * statements, quoted-path DML, `CREATE/DROP VERSIONED TABLE`,
  * time-travel path reads — with no `GraftSql.sql` wrapper (the
  * DeltaSqlParser move). Installed by `GraftExtensions`
  * (`injectParser`).
  *
  * Precedence is delegate-first: every statement Spark can parse takes
  * its normal path untouched (so vanilla SELECT/INSERT/UPDATE/DELETE/
  * MERGE/ALTER on names keep their DSv2/VanillaDml routes, views
  * re-analyze identically, and this class can never change the meaning
  * of valid Spark SQL). Only on a [[ParseException]] does
  * [[GraftSql.recognizes]] decide: engine statement → executed through
  * [[GraftSql.sql]] (the SAME eager semantics that entry point has
  * always had — maintenance verbs run when the statement is issued) and
  * the result frame's plan is returned; anything else → Spark's own
  * error, verbatim.
  *
  * Declared trade: for an ENGINE statement, parse IS execution — a
  * caller that parses engine grammar without intending to run it (a
  * lint/dry-run tool walking `sessionState.sqlParser`) triggers the
  * verb at parse time. That is exactly `GraftSql.sql`'s contract (the
  * grammar has no deferred form: each statement's result schema is only
  * known by running its verb), and valid Spark SQL is never affected —
  * the delegate owns everything it can parse. Parse-only callers must
  * use the delegate parser directly.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  /** Re-entrancy guard: GraftSql's own fallback hands unrecognized text
    * to `spark.sql`, which parses with THIS parser — if `recognizes`
    * ever claims a statement the grammar then fails to match, the
    * fallback must surface the original ParseException instead of
    * recursing GraftSql→spark.sql→GraftSql to a StackOverflow.
    */
  private val inEngineFallback: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  override def parsePlan(sqlText: String): LogicalPlan =
    try delegate.parsePlan(sqlText)
    catch {
      case pe: ParseException =>
        if (!inEngineFallback.get() && GraftSql.recognizes(sqlText)) {
          inEngineFallback.set(true)
          // the ANALYZED plan, not the raw one: GraftSql's per-statement
          // temp views (time-travel/name rewrites) are dropped once its
          // DataFrame is analyzed, so the plan handed back must already
          // have them resolved into snapshot reads — the outer
          // analysis then re-runs idempotently over resolved nodes
          try GraftSql.sql(SparkSession.active,
            GraftSql.stripLeadingComments(sqlText))
            .queryExecution.analyzed
          finally inEngineFallback.set(false)
        } else throw pe
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
