package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan,
  LessThanOrEqual, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation,
  DataSourceV2ScanRelation}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{Filter => SourceFilter}
import org.apache.spark.sql.types.{DecimalType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{GraftScanBridge, GraftV1Scan, GraftVersionedSparkTable}

/** Optimizer rule: replace a DSv2 relation over a name-addressed
  * versioned table with the engine's own pruned-read LOGICAL PLAN, so a
  * vanilla `spark.sql("... FROM db.t")` keeps vectorized parquet decode
  * and whole-stage codegen end to end.
  *
  * Why a plan splice and not a DSv2 `Batch`/`ParquetScan` delegation:
  * a versioned snapshot is not always a clean parquet scan — deferred
  * deletes read through keep-filters, schema evolution reads through
  * per-dir cast/align chains, and neither is `sources.Filter`
  * expressible, so only trivial tables could delegate. The spliced plan
  * IS `VersionedTable.readVersionPruned`'s DataFrame plan — those
  * residuals ride along as ordinary Filter/Project nodes and every
  * downstream optimization (predicate pushdown into the parquet
  * relations, column pruning via `PhysicalOperation` collapse, AQE)
  * applies to them for free. The alternative V1Scan bridge
  * ([[graft.sources.GraftV1Scan]]) pays an RDD[Row] conversion at the
  * catalog seam — row-by-row `InternalRow` materialization of every
  * scanned row; this rule removes the seam entirely. On a 100 TB scan
  * that boundary is the difference between columnar batches flowing
  * into codegen and a per-row deserialization wall.
  *
  * The rule fires in BOTH optimizer positions Spark can present:
  *  - `DataSourceV2Relation` (before `V2ScanRelationPushDown`): when a
  *    `Filter` sits directly above — the normalized position after the
  *    operator-optimization fixpoint — its conjuncts translate to
  *    source filters and drive the SAME manifest-level zone-map/Bloom
  *    file pruning the bridge does; the residual Filter stays above the
  *    splice, so pruning remains a strictly-superset file selection.
  *  - `DataSourceV2ScanRelation` over a [[GraftV1Scan]] (after
  *    pushdown): the scan already captured the pushed filters and the
  *    pruned column set — splice with exactly those.
  * Registered via `injectPreCBORule` (once, after operator
  * optimization), so the splice sees filters in normalized
  * positions and never loops; sessions without [[graft.functions
  * .GraftExtensions]] simply keep the V1 bridge.
  *
  * Version pinning is preserved: the splice reads the TABLE INSTANCE's
  * pinned version ([[GraftVersionedSparkTable.graftVersion]], resolved
  * at analysis), so a statement analyzed before a concurrent commit
  * still executes against its own snapshot — same contract as the
  * bridge. The exprId mapping (an alias per relation output attribute)
  * keeps every reference above the splice resolved; if any name fails
  * to line up (defensive — cannot happen while the pinned schema and
  * the pinned read derive from the same snapshot), the node is left
  * untouched and the V1 bridge answers.
  */
class ColumnarCatalogRead(spark: SparkSession) extends Rule[LogicalPlan]
  with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // a DML command node owns its target relation — Spark's own
    // planning (or the VanillaDml rule, which normally consumes these
    // first) must see it intact, never a spliced parquet subtree
    case _: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable |
         _: org.apache.spark.sql.catalyst.plans.logical.UpdateTable |
         _: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
      plan
    case _ => spliceAll(plan)
  }

  private def spliceAll(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // pre-pushdown shape: harvest the adjacent filter for file pruning
    case f @ Filter(cond, r: DataSourceV2Relation)
        if graftTable(r).isDefined =>
      val t = graftTable(r).get
      val pushable = splitConjunctivePredicates(cond)
        .flatMap(translate)
        .toArray
      splice(t, r.output, pushable).map(s => f.copy(child = s)).getOrElse(f)

    case r: DataSourceV2Relation if graftTable(r).isDefined =>
      val t = graftTable(r).get
      splice(t, r.output, Array.empty).getOrElse(r)

    // post-pushdown shape: the scan carries the pushed filters and the
    // pruned columns; Spark kept every filter residual above it
    case sr: DataSourceV2ScanRelation
        if sr.scan.isInstanceOf[GraftV1Scan] =>
      val scan = sr.scan.asInstanceOf[GraftV1Scan]
      spliceRead(scan.location, scan.version, scan.fullSchema,
        sr.output, scan.filters).getOrElse(sr)
  }

  private def graftTable(
      r: DataSourceV2Relation): Option[GraftVersionedSparkTable] =
    r.table match {
      case t: GraftVersionedSparkTable => Some(t)
      case _ => None
    }

  /** Catalyst predicate → source filter, restricted to the shapes the
    * pruner consumes ([[graft.sources.GraftScanBuilder.translatable]]):
    * a bare column compared to a numeric/string literal, either operand
    * order, plus IN over literals. Anything else translates to None —
    * the predicate stays residual and only file pruning is forgone,
    * never exactness. (Spark's own `DataSourceStrategy.translateFilter`
    * is `protected[sql]`; the post-pushdown splice arm receives ITS
    * output via the scan, so this hand translation only serves the
    * pre-pushdown arm.)
    */
  private def translate(e: Expression): Option[SourceFilter] = e match {
    case EqualTo(a: Attribute, l: Literal) =>
      scalaValue(l).map(v => sources.EqualTo(a.name, v))
    case EqualTo(l: Literal, a: Attribute) =>
      scalaValue(l).map(v => sources.EqualTo(a.name, v))
    case GreaterThan(a: Attribute, l: Literal) =>
      scalaValue(l).map(v => sources.GreaterThan(a.name, v))
    case GreaterThan(l: Literal, a: Attribute) =>
      scalaValue(l).map(v => sources.LessThan(a.name, v))
    case GreaterThanOrEqual(a: Attribute, l: Literal) =>
      scalaValue(l).map(v => sources.GreaterThanOrEqual(a.name, v))
    case GreaterThanOrEqual(l: Literal, a: Attribute) =>
      scalaValue(l).map(v => sources.LessThanOrEqual(a.name, v))
    case LessThan(a: Attribute, l: Literal) =>
      scalaValue(l).map(v => sources.LessThan(a.name, v))
    case LessThan(l: Literal, a: Attribute) =>
      scalaValue(l).map(v => sources.GreaterThan(a.name, v))
    case LessThanOrEqual(a: Attribute, l: Literal) =>
      scalaValue(l).map(v => sources.LessThanOrEqual(a.name, v))
    case LessThanOrEqual(l: Literal, a: Attribute) =>
      scalaValue(l).map(v => sources.GreaterThanOrEqual(a.name, v))
    case In(a: Attribute, vs) if vs.nonEmpty &&
        vs.forall(_.isInstanceOf[Literal]) =>
      val converted = vs.map(v => scalaValue(v.asInstanceOf[Literal]))
      if (converted.forall(_.isDefined))
        Some(sources.In(a.name, converted.map(_.get).toArray))
      else None
    case _ => None
  }

  /** Internal literal → external Scala value for the types whose stats
    * comparisons are representation-independent. Dates/timestamps keep
    * internal int/long encodings and are deliberately excluded here —
    * they prune on the post-pushdown arm where Spark did the
    * conversion.
    */
  private def scalaValue(l: Literal): Option[Any] = (l.value, l.dataType) match {
    case (null, _) => None
    case (u: UTF8String, StringType) => Some(u.toString)
    case (d: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
      Some(d.toJavaBigDecimal)
    case (v, _: NumericType) => Some(v)
    case _ => None
  }

  private def splice(t: GraftVersionedSparkTable, out: Seq[Attribute],
      filters: Array[SourceFilter]): Option[LogicalPlan] =
    spliceRead(t.graftLocation, t.graftVersion, t.schema(), out, filters)

  /** Build the pruned snapshot read and project it onto the relation's
    * attribute ids. The sub-plan is optimized in its own QueryExecution
    * first (the same nested-optimize move `OptimizeSubqueries` makes),
    * so expression rewrites that only run in earlier optimizer batches
    * — RuntimeReplaceable replacement, constant folding inside
    * keep-filters — are already applied when it lands mid-pipeline.
    */
  private def spliceRead(location: String, version: Long,
      fullSchema: org.apache.spark.sql.types.StructType,
      out: Seq[Attribute],
      filters: Array[SourceFilter]): Option[LogicalPlan] = {
    val sub = GraftScanBridge
      .prunedRead(spark, location, version, fullSchema, filters)
      .queryExecution.optimizedPlan
    val res = conf.resolver
    val mapped: Seq[Option[NamedExpression]] = out.map { o =>
      sub.output.find(a => res(a.name, o.name) && a.dataType == o.dataType)
        .map(a => Alias(a, o.name)(exprId = o.exprId))
    }
    if (mapped.exists(_.isEmpty)) None
    else Some(Project(mapped.map(_.get), sub))
  }
}
