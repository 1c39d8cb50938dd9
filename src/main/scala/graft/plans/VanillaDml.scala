package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, AttributeSet, EqualTo, Expression, PredicateHelper,
  SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeAction,
  MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftshims.SparkInternals
import org.apache.spark.sql.types.LongType

import graft.sources.{GraftVersionedSparkTable, VersionedTable}

/** Post-hoc resolution rule: VANILLA Spark SQL DML on name-addressed
  * versioned tables. `DELETE FROM db.t WHERE ...`, `UPDATE db.t SET
  * ... [WHERE ...]` and `MERGE INTO db.t USING ... ON ... WHEN ...`
  * parse natively into `DeleteFromTable`/`UpdateTable`/`MergeIntoTable`
  * — plans Spark can only execute against tables implementing its
  * row-level-operation connector API. This rule intercepts those plans
  * when the target resolves to a [[GraftVersionedSparkTable]] (the DSv2
  * session-catalog table) and compiles them onto the engine's verbs —
  * the SAME `deleteWhere`/`updateWhere`/`mergeIntoKeys`/
  * `mergeUpdateKeys` calls the `GraftSql` spellings and the Scala API
  * make, so every statement lands as one atomic version through the
  * put-if-absent publish, file-granular CoW, CHECK-constraint gate,
  * CDC sidecar, and internal rebase. With this, a tool that speaks
  * ONLY plain Spark SQL (dbt, notebooks, JDBC frontends) has the full
  * lifecycle on named tables: CREATE (GraftSql) + SELECT/INSERT (DSv2)
  * + UPDATE/DELETE/MERGE (here). (The Delta pattern: `DeltaAnalysis`
  * converting `MergeIntoTable` into its own command nodes.)
  *
  * Supported MERGE shapes mirror [[graft.sources.GraftSql]]'s contract
  * exactly (one verb per statement, loud failures for the rest):
  *  - `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *    [+ `WHEN MATCHED AND cond THEN DELETE`] → full-row upsert
  *    ([[VersionedTable.mergeIntoKeys]]; the analyzer's star expansion
  *    already requires the source to carry the full row);
  *  - `WHEN MATCHED [AND cond] THEN UPDATE SET c = expr[, ...]` alone →
  *    partial-column update ([[VersionedTable.mergeUpdateKeys]] — old
  *    row as `t`, source row as `s`);
  *  - `WHEN MATCHED [AND cond] THEN DELETE` alone → delete-merge.
  * The ON clause must be a conjunction of same-named target=source
  * column equalities (the key tuple that identifies a row — composite
  * keys supported). A pure delete-merge evaluates its condition over
  * the matched PAIR (old row `t`, source row `s`) — full ANSI MATCHED
  * semantics, deleting only the matched-and-condition rows and ignoring
  * everything else; in an UPSERT merge the delete condition must
  * reference source columns only (the verb evaluates it on the source
  * row), failing typed rather than silently reading the wrong side.
  *
  * Mechanics: conditions/assignments are harvested from the resolved
  * plan, DE-resolved (attribute references become name-based lookups —
  * `t`/`s`-qualified for the two-sided merge expressions) and carried
  * as opaque [[Column]]s inside leaf command nodes, so `CheckAnalysis`
  * never sees an unresolved expression; the verbs re-resolve them
  * against their own snapshot reads, exactly as the GraftSql path does
  * with its textual `expr(...)` arguments. Subquery conditions are
  * rejected typed (rewrite as a MERGE against the subquery source).
  */
class VanillaDml(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable if d.resolved =>
      graftTarget(d.table).map(t => compileDelete(d, t)).getOrElse(d)
    case u: UpdateTable if u.resolved =>
      graftTarget(u.table).map(t => compileUpdate(u, t)).getOrElse(u)
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable).map(t => compileMerge(m, t)).getOrElse(m)
    case p => p
  }

  // ---- target resolution -------------------------------------------

  private def graftTarget(p: LogicalPlan): Option[GraftVersionedSparkTable] =
    p match {
      case SubqueryAlias(_, child) => graftTarget(child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftVersionedSparkTable => Some(t)
        case _ => None
      }
      case _ => None
    }

  // ---- DELETE / UPDATE ---------------------------------------------

  private def compileDelete(d: DeleteFromTable,
      t: GraftVersionedSparkTable): LogicalPlan = {
    guard(d.condition, "DELETE")
    GraftDeleteCommand(t.graftLocation,
      col(deRes(d.condition, d.table.outputSet)))
  }

  private def compileUpdate(u: UpdateTable,
      t: GraftVersionedSparkTable): LogicalPlan = {
    val targetSet = u.table.outputSet
    u.condition.foreach(guard(_, "UPDATE"))
    val set = u.assignments.map { a =>
      guard(a.value, "UPDATE")
      columnName(a.key, "UPDATE") -> col(deRes(a.value, targetSet))
    }.toMap
    val cond = u.condition.map(c => col(deRes(c, targetSet)))
      .getOrElse(lit(true))
    GraftUpdateCommand(t.graftLocation, cond, set)
  }

  // ---- MERGE --------------------------------------------------------

  private def compileMerge(m: MergeIntoTable,
      t: GraftVersionedSparkTable): LogicalPlan = {
    if (m.withSchemaEvolution)
      fail("MERGE ... WITH SCHEMA EVOLUTION is not supported on a " +
        "versioned table — widen through the change-batch path " +
        "(commitMerge) instead")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported — the verb " +
        "surface identifies rows by source keys; express source-absent " +
        "maintenance as a DELETE with an anti-join source")
    val targetSet = m.targetTable.outputSet
    val sourceSet = m.sourceTable.outputSet
    val keys = mergeKeys(m.mergeCondition, targetSet, sourceSet)

    val updStars = m.matchedActions.collect {
      case u: UpdateAction if isStarShaped(u.assignments, m) => u }
    val updPartials = m.matchedActions.collect {
      case u: UpdateAction if !isStarShaped(u.assignments, m) => u }
    val dels = m.matchedActions.collect { case d: DeleteAction => d }
    val (insStars, insOthers) = m.notMatchedActions.partition {
      case i: InsertAction => isStarShaped(i.assignments, m)
      case _ => false
    }
    if (insOthers.nonEmpty)
      fail("WHEN NOT MATCHED must INSERT the full source row (INSERT * " +
        "or an all-columns-by-name column list) — the verb inserts " +
        "source rows verbatim")
    if (updStars.exists(_.condition.nonEmpty))
      fail("UPDATE SET * must be the plain WHEN MATCHED clause")
    if (insStars.collect { case i: InsertAction => i }
        .exists(_.condition.nonEmpty))
      fail("INSERT * must be the plain WHEN NOT MATCHED clause")
    if (updPartials.nonEmpty &&
        (updPartials.size > 1 || dels.nonEmpty || updStars.nonEmpty ||
          insStars.nonEmpty))
      fail("UPDATE SET <assignments> stands alone — one WHEN MATCHED " +
        "clause, no DELETE/INSERT/SET * alongside (a partial row has " +
        "nothing to insert)")
    if (updPartials.isEmpty && updStars.nonEmpty != insStars.nonEmpty)
      fail("upsert merges need BOTH 'WHEN MATCHED THEN UPDATE SET *' " +
        "AND 'WHEN NOT MATCHED THEN INSERT *' — the verb replaces or " +
        "inserts the full source row")
    if (dels.size > 1 || updStars.size > 1 || insStars.size > 1)
      fail("duplicate WHEN clauses")
    if (dels.exists(_.condition.isEmpty) && updStars.nonEmpty)
      fail("an unconditional WHEN MATCHED THEN DELETE cannot combine " +
        "with upsert clauses: the delete predicate evaluates on the " +
        "source row (not matched-ness), so every source row would " +
        "delete; give the DELETE an AND condition, or drop the " +
        "UPDATE/INSERT clauses")

    val source = SparkInternals.ofRows(spark, m.sourceTable)

    if (updPartials.nonEmpty) {
      val u = updPartials.head
      val set = u.assignments.map { a =>
        guard(a.value, "MERGE")
        columnName(a.key, "MERGE") ->
          col(deRes(a.value, targetSet, sourceSet,
            tQual = Seq("t"), sQual = Seq("s")))
      }.toMap
      val when = u.condition.map { c =>
        guard(c, "MERGE")
        col(deRes(c, targetSet, sourceSet,
          tQual = Seq("t"), sQual = Seq("s")))
      }.getOrElse(lit(true))
      return GraftMergeUpdateCommand(t.graftLocation, source, keys, set,
        when)
    }
    if (updStars.isEmpty && dels.isEmpty)
      fail("no actionable clause (need an upsert pair and/or a DELETE)")

    val upsert = updStars.nonEmpty
    val deleteWhen: Option[Column] = dels.headOption.flatMap {
      case DeleteAction(Some(cond)) =>
        guard(cond, "MERGE")
        if (upsert) {
          // the upsert verb evaluates the delete predicate on the
          // source row — a condition over the matched row's OLD values
          // would silently read the wrong side, so it fails here
          if (cond.references.exists(targetSet.contains))
            fail("in an upsert merge, a MATCHED DELETE condition may " +
              "reference SOURCE columns only — it evaluates on the " +
              "source row (mergeInto semantics); split the statement " +
              "or express the old-value test as a pure delete-merge")
          Some(col(deRes(cond, AttributeSet.empty, sourceSet)))
        } else
          // pure delete-merge: the command joins target (`t`) to
          // source (`s`) on the keys, so the condition may reference
          // BOTH sides' values — full ANSI MATCHED semantics
          Some(col(deRes(cond, targetSet, sourceSet,
            tQual = Seq("t"), sQual = Seq("s"))))
      case DeleteAction(None) => None // unconditional: every match
    }
    GraftMergeCommand(t.graftLocation, source, keys, deleteWhen, upsert)
  }

  /** ON must be a conjunction of same-named target=source equalities —
    * the composite key tuple that identifies a row.
    */
  private def mergeKeys(cond: Expression, targetSet: AttributeSet,
      sourceSet: AttributeSet): Seq[String] = {
    val keys = VanillaDml.conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if targetSet.contains(a) && sourceSet.contains(b) &&
            conf.resolver(a.name, b.name) => a.name
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if sourceSet.contains(a) && targetSet.contains(b) &&
            conf.resolver(a.name, b.name) => b.name
      case other => fail("unsupported ON clause " +
        s"'${other.sql}' — use a conjunction of same-named " +
        "target=source column equalities (ON t.k = s.k [AND ...]); " +
        "the key tuple identifies the row")
    }
    if (keys.isEmpty) fail("MERGE needs at least one key equality")
    keys.distinct
  }

  /** Star-shaped action (the analyzer's `UPDATE SET *` / `INSERT *`
    * expansion, or an explicit by-name full-column list): one
    * assignment per target column, each a bare source attribute of the
    * same name.
    */
  private def isStarShaped(assigns: Seq[Assignment],
      m: MergeIntoTable): Boolean = {
    val targetCols = m.targetTable.output.map(_.name)
    val sourceSet = m.sourceTable.outputSet
    assigns.length == targetCols.length &&
      assigns.forall { a =>
        (a.key, a.value) match {
          case (k: AttributeReference, v: AttributeReference) =>
            sourceSet.contains(v) && conf.resolver(k.name, v.name)
          case _ => false
        }
      } &&
      targetCols.forall(c => assigns.exists {
        case Assignment(k: AttributeReference, _) => conf.resolver(k.name, c)
        case _ => false
      })
  }

  // ---- shared helpers ----------------------------------------------

  private def col(e: Expression): Column = SparkInternals.column(e)

  /** Resolved references → name-based lookups the verbs re-resolve
    * against their own reads; `tQual`/`sQual` qualify the two sides of
    * a merge expression (the verb aliases old row `t`, source row `s`).
    */
  private def deRes(e: Expression, target: AttributeSet,
      source: AttributeSet = AttributeSet.empty,
      tQual: Seq[String] = Nil, sQual: Seq[String] = Nil): Expression =
    e.transform {
      case a: AttributeReference if target.contains(a) =>
        UnresolvedAttribute(tQual :+ a.name)
      case a: AttributeReference if source.contains(a) =>
        UnresolvedAttribute(sQual :+ a.name)
      case a: AttributeReference =>
        fail(s"reference `${a.name}` binds to neither the target table " +
          "nor the MERGE source")
    }

  private def columnName(key: Expression, verb: String): String =
    key match {
      case a: AttributeReference => a.name
      case other => fail(s"$verb assignments must target a top-level " +
        s"column (got `${other.sql}`) — nested-field assignment is not " +
        "supported; rewrite the struct with a whole-column expression")
    }

  private def guard(e: Expression, verb: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      fail(s"$verb conditions with subqueries are not supported on a " +
        "versioned table — express the lookup as a MERGE whose USING " +
        "source is the subquery")

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"[graft vanilla DML] $msg")
}

private object VanillaDml {
  def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }
}

/** `DELETE FROM db.t WHERE cond` → [[VersionedTable.deleteWhere]]
  * (file-granular CoW, SQL NULL semantics, atomic version). Returns the
  * published version, mirroring the GraftSql statement's result shape.
  */
case class GraftDeleteCommand(location: String, cond: Column)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.deleteWhere(session, location, cond)))
}

/** `UPDATE db.t SET c = expr[, ...] [WHERE cond]` →
  * [[VersionedTable.updateWhere]] (assignments see OLD values and cast
  * to the existing type — the verb never migrates schema).
  */
case class GraftUpdateCommand(location: String, cond: Column,
    set: Map[String, Column]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.updateWhere(session, location, cond, set)))
}

/** Full-row upsert / delete-merge with ANSI MERGE framing. Differences
  * from handing the raw source to [[VersionedTable.mergeIntoKeys]],
  * both load-bearing for vanilla-SQL semantics:
  *  - the change batch is PROJECTED to the target's columns (the star
  *    expansion guarantees same-named source columns exist), so a
  *    source helper column — a delete flag, a join artifact — can
  *    never silently WIDEN the table the way the engine verb's
  *    additive schema evolution would;
  *  - a pure delete-merge (`WHEN MATCHED [AND cond] THEN DELETE`
  *    alone) deletes ONLY the matched-and-condition rows — the change
  *    batch is the target's own matched rows (key semi-join against
  *    the pinned base), never the source rows, so a non-matching
  *    source row is IGNORED instead of upserted (the engine verb's
  *    "conditional delete + full-row upsert" semantic stays available
  *    through GraftSql/the API, where it is documented).
  * Documented deviation shared with GraftSql's spelling: in an upsert
  * merge with a conditional DELETE, a source row satisfying the delete
  * condition but matching NO target row is a no-op (ANSI would fall
  * through to INSERT); the delete predicate evaluates on the source
  * row, pre-projection, so it may reference source-only columns.
  */
case class GraftMergeCommand(location: String, source: DataFrame,
    keys: Seq[String], deleteWhen: Option[Column], upsert: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val base = VersionedTable.latestVersion(session, location).getOrElse(
      throw new IllegalArgumentException(
        s"$location has no committed versions"))
    val changes =
      if (upsert) {
        val targetCols = VersionedTable.readVersion(session, location, base)
          .columns.toSeq
        // deleteWhen evaluates on the RAW source (may reference
        // source-only columns), then the batch narrows to target shape
        val op = deleteWhen.map(d => when(d, "d").otherwise("u"))
          .getOrElse(lit("u"))
        source.select(targetCols.map(col) :+ op.as("__op"): _*)
          .withColumn("__ver", lit(1L))
      } else {
        // pure delete-merge: the rows to delete are the TARGET's own
        // matched rows — a key join against the pinned base (the same
        // scan shape as the verb's own key probe), with the condition
        // evaluated over the PAIR (old row as `t`, source row as `s`).
        // EXPLICIT null-safe join condition, not a USING join: USING
        // drops the right-side key columns, so a condition naming
        // `s.<key>` (ANSI-legal) would fail to resolve
        val tgt = VersionedTable.readVersion(session, location, base)
        val on = keys.map(k => col(s"t.$k") <=> col(s"s.$k"))
          .reduce(_ && _)
        val joined = tgt.as("t").join(source.as("s"), on, "inner")
        deleteWhen.map(joined.filter).getOrElse(joined)
          .select(col("t.*"))
          .dropDuplicates(keys)
          .withColumn("__op", lit("d"))
          .withColumn("__ver", lit(1L))
      }
    Seq(Row(VersionedTable.commitMergeFromKeys(session, location, base,
      changes, keys, version = "__ver", op = "__op")))
  }
}

/** Partial-column MERGE update → [[VersionedTable.mergeUpdateKeys]]. */
case class GraftMergeUpdateCommand(location: String, source: DataFrame,
    keys: Seq[String], set: Map[String, Column], updateWhen: Column)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.mergeUpdateKeys(session, location, source, keys,
      set, updateWhen = updateWhen)))
}
