package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ext.Layout

/** The option markers [[graft.sources.GraftSource]] `tableOf` stamps
  * on every relation it builds — which layout generation the relation
  * serves, whether that generation carries deletion vectors, and
  * whether [[GraftManifestPrune]] already shrank its file list. */
private[plans] object GraftReaderMarker {
  final case class Marker(dir: String, gen: Long, hasDv: Boolean,
                          pruned: Boolean, basePath: Option[String])

  def of(r: DataSourceV2Relation): Option[Marker] = r.table match {
    case pt: ParquetTable =>
      for {
        dir <- Option(pt.options.get("graft.layout.dir"))
        gen <- Option(pt.options.get("graft.layout.gen"))
      } yield Marker(dir, gen.toLong,
        "true".equalsIgnoreCase(pt.options.get("graft.layout.dv")),
        "true".equalsIgnoreCase(pt.options.get("graft.pruned")),
        Option(pt.options.get("basePath")))
    case _ => None
  }
}

/** Deletion-vector application for the `graft` DataSourceV2 reader —
  * the analysis-time half of merge-on-read: a V2 FILE relation serves
  * raw parquet bytes and cannot anti-join vectors, so when the
  * resolved generation carries any ([[graft.sources.GraftSource]]
  * stamps `graft.layout.dv`), this rule REPLACES the relation with
  * the plan [[graft.ext.Layout.readSnapshot]] builds for that very
  * generation — the one existing implementation of snapshot + DV
  * semantics (resolve live-or-retired, split DV-free files onto the
  * plain scan, anti-join the referenced stores on the parquet
  * metadata identity). The substitution happens at POST-HOC
  * resolution, before any optimization, so predicate pushdown and
  * column pruning land inside the substituted plan exactly as they
  * would on a hand-written `readSnapshot` call.
  *
  * Output fidelity: the replacement is wrapped in a Project aliasing
  * each snapshot column back to the relation's own attribute
  * (name-resolved, exprIds preserved), so nothing upstream
  * re-resolves; a name or type mismatch — impossible while both
  * sides derive from the same layout schema — fails loudly rather
  * than mis-mapping a column.
  *
  * Installed by [[graft.GraftExtensions]]
  * `injectPostHocResolutionRule`; sessions without the extensions are
  * refused at `tableOf` time (never a silent raw read that would
  * resurrect deleted rows). */
case class GraftDvReadRewrite(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case r: DataSourceV2Relation
          if GraftReaderMarker.of(r).exists(_.hasDv) =>
        val m = GraftReaderMarker.of(r).get
        val snap = Layout.readSnapshot(session, m.dir, m.gen)
        val child = snap.queryExecution.analyzed
        val resolver = session.sessionState.conf.resolver
        val aliases: Seq[NamedExpression] = r.output.map { a =>
          child.output.filter(c => resolver(c.name, a.name)) match {
            case Seq(one) =>
              require(one.dataType == a.dataType,
                s"graft DV read of ${m.dir} gen=${m.gen}: column " +
                  s"${a.name} resolves as ${one.dataType} in the " +
                  s"snapshot but ${a.dataType} in the relation — " +
                  "schema sidecar and manifest disagree")
              Alias(one, a.name)(exprId = a.exprId,
                qualifier = a.qualifier)
            case other => throw new IllegalStateException(
              s"graft DV read of ${m.dir} gen=${m.gen} cannot map " +
                s"relation column ${a.name} onto the snapshot plan " +
                s"(${other.size} candidates of " +
                s"${child.output.map(_.name).mkString(", ")})")
          }
        }
        Project(aliases, child)
    }
}

/** Manifest data skipping for the `graft` DataSourceV2 reader — the
  * optimizer half: a Filter directly above a marked graft relation
  * translates its pushable conjuncts into the SAME prune boxes the
  * Scala path uses, drops every file the generation manifest's
  * min/max/bloom stats PROVE disjoint
  * ([[graft.ext.Layout.prunedSnapshotFileAnchors]] — one skip
  * semantics, shared with [[graft.ext.Layout.scanPruned]]), and
  * swaps the relation's table for one over the survivors. The
  * query's own Filter STAYS as the residual, so pruned ≡ full scan
  * by construction — a box is only ever a SUPERSET of its conjunct's
  * satisfying set (strict bounds widen to closed ones; timestamp
  * keys prune only in UTC sessions, the one zone where the bound's
  * string round-trip is bijective; conjuncts the translator cannot
  * prove simply emit no box).
  *
  * At 100 TB this is the lever that makes the SQL surface usable on
  * the most common query shape: `WHERE key BETWEEN …` through
  * `format("graft")` opens the three overlapping files, not the
  * whole table — the same file-list shrink Delta/Iceberg planning
  * does with their stats, done here as a logical rewrite so Spark's
  * own parquet pushdown, column pruning, and vectorized reads apply
  * to the survivors unchanged.
  *
  * Scope guards: generation-TRACKED layouts only (an untracked
  * manifest mutates in place under the relation); DV-bearing
  * snapshots never reach here ([[GraftDvReadRewrite]] replaced them
  * at analysis); a partitioned relation only prunes while every
  * survivor still resolves under its single basePath anchor; a
  * relation is marked `graft.pruned` so the fixed-point batch
  * converges after one rewrite. Zero survivors collapse to an empty
  * [[LocalRelation]] (exact: no file can hold a match). */
case class GraftManifestPrune(session: SparkSession)
    extends Rule[LogicalPlan] {
  import GraftPruneBoxes.boxesOf

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case f @ Filter(cond, r: DataSourceV2Relation) =>
        GraftReaderMarker.of(r) match {
          case Some(m) if !m.hasDv && !m.pruned =>
            Layout.snapshotManifestSchema(session, m.dir, m.gen) match {
              case Some(mSchema) =>
                val boxes = boxesOf(cond, mSchema,
                  utcSession = session.sessionState.conf
                    .sessionLocalTimeZone == "UTC")
                if (boxes.isEmpty) f
                else prune(f, cond, r, m, boxes)
              case None => f // untracked layout: manifest is mutable
            }
          case _ => f
        }
    }

  private def prune(f: Filter, cond: Expression, r: DataSourceV2Relation,
                    m: GraftReaderMarker.Marker,
                    boxes: Seq[Layout.PruneBox]): LogicalPlan = {
    val pairs = Layout.prunedSnapshotFileAnchors(session, m.dir, m.gen,
      boxes)
    // a partitioned relation re-derives its partition columns from
    // ONE basePath; a survivor retired since table creation anchors
    // elsewhere — skip pruning rather than mis-derive (the unpruned
    // relation resolved its whole list at creation time)
    if (m.basePath.exists(bp => pairs.exists(_._1 != bp))) return f
    if (pairs.isEmpty)
      // no file can contain a match: exact empty result, scan-free
      return Filter(cond, LocalRelation(r.output))
    val pt = r.table.asInstanceOf[ParquetTable]
    val opts = new java.util.HashMap[String, String](
      pt.options.asCaseSensitiveMap())
    opts.put("graft.pruned", "true")
    val newTable = ParquetTable(pt.name, session,
      new CaseInsensitiveStringMap(opts), pairs.map(_._2).toIndexedSeq,
      pt.userSpecifiedSchema, classOf[ParquetFileFormat])
    Filter(cond, r.copy(table = newTable))
  }
}

/** Conjunct → prune-box translation, shared vocabulary with the
  * Scala path's [[graft.ext.Layout.PruneBox]] family. Every emitted
  * box is a PROVABLE SUPERSET of its conjuncts' satisfying set for
  * that column — the only property pruning needs, since the query's
  * Filter re-applies the exact predicate over the survivors. */
private[plans] object GraftPruneBoxes {

  private def statType(mSchema: StructType, c: String): Option[DataType] =
    if (mSchema.fieldNames.contains(s"min_$c"))
      Some(mSchema(s"min_$c").dataType)
    else None

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case o => Seq(o)
  }

  private def longOf(l: Literal): Option[Long] = l.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      Option(l.value).map(_.toString.toLong)
    case _ => None
  }

  private def dayStr(days: Int): String =
    java.time.LocalDate.ofEpochDay(days.toLong).toString

  /** A timestamp literal (internal: epoch micros) as the string
    * [[graft.ext.Layout.TypedKeyBox]] bounds take, rendered in UTC.
    * Only used when the SESSION timezone is UTC: the box's bound is
    * cast back to timestamp in the session zone, and only a
    * DST-free zone makes format∘parse bijective — anywhere else the
    * overlap hour could shift a bound and break the box⊇conjunct
    * superset contract, so non-UTC sessions simply don't prune
    * timestamp keys. */
  private def tsStr(micros: Long): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.EPOCH.plus(micros,
        java.time.temporal.ChronoUnit.MICROS))

  // per-column range accumulation; strict bounds widen to closed
  // (superset — see the object doc)
  private final class Range[T](implicit ord: Ordering[T]) {
    var lo: Option[T] = None
    var hi: Option[T] = None
    def addLo(v: T): Unit = lo = Some(lo.fold(v)(ord.max(_, v)))
    def addHi(v: T): Unit = hi = Some(hi.fold(v)(ord.min(_, v)))
  }

  def boxesOf(cond: Expression, mSchema: StructType,
              utcSession: Boolean = true): Seq[Layout.PruneBox] = {
    val longRanges =
      scala.collection.mutable.LinkedHashMap[String, Range[Long]]()
    val dateRanges =
      scala.collection.mutable.LinkedHashMap[String, Range[Int]]()
    val tsRanges =
      scala.collection.mutable.LinkedHashMap[String, Range[Long]]()
    val strRanges =
      scala.collection.mutable.LinkedHashMap[String, Range[String]]()
    val sets = scala.collection.mutable.ArrayBuffer[Layout.KeySetBox]()

    def addBound(a: AttributeReference, l: Literal, isLo: Boolean,
                 isHi: Boolean): Unit =
      statType(mSchema, a.name).foreach {
        case LongType => longOf(l).foreach { v =>
          val r = longRanges.getOrElseUpdate(a.name, new Range[Long])
          if (isLo) r.addLo(v)
          if (isHi) r.addHi(v)
        }
        case DateType if l.dataType == DateType =>
          Option(l.value).foreach { v =>
            val r = dateRanges.getOrElseUpdate(a.name, new Range[Int])
            if (isLo) r.addLo(v.asInstanceOf[Int])
            if (isHi) r.addHi(v.asInstanceOf[Int])
          }
        case TimestampType if l.dataType == TimestampType && utcSession =>
          Option(l.value).foreach { v =>
            val r = tsRanges.getOrElseUpdate(a.name, new Range[Long])
            if (isLo) r.addLo(v.asInstanceOf[Long])
            if (isHi) r.addHi(v.asInstanceOf[Long])
          }
        case StringType if l.dataType == StringType =>
          Option(l.value).foreach { v =>
            val r = strRanges.getOrElseUpdate(a.name, new Range[String])
            if (isLo) r.addLo(v.toString)
            if (isHi) r.addHi(v.toString)
          }
        case _ => () // NTZ / exotic stats: no box, stay exact
      }

    def addSet(a: AttributeReference, vs: Seq[Long]): Unit =
      statType(mSchema, a.name) match {
        case Some(LongType) if vs.nonEmpty =>
          sets += Layout.KeySetBox(a.name, vs)
        case _ => ()
      }

    splitConjuncts(cond).foreach {
      case EqualTo(a: AttributeReference, l: Literal) =>
        addBound(a, l, isLo = true, isHi = true)
      case EqualTo(l: Literal, a: AttributeReference) =>
        addBound(a, l, isLo = true, isHi = true)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        addBound(a, l, isLo = true, isHi = false)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        addBound(a, l, isLo = true, isHi = false)
      case LessThan(a: AttributeReference, l: Literal) =>
        addBound(a, l, isLo = false, isHi = true)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        addBound(a, l, isLo = false, isHi = true)
      case GreaterThan(l: Literal, a: AttributeReference) =>
        addBound(a, l, isLo = false, isHi = true)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        addBound(a, l, isLo = false, isHi = true)
      case LessThan(l: Literal, a: AttributeReference) =>
        addBound(a, l, isLo = true, isHi = false)
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        addBound(a, l, isLo = true, isHi = false)
      case In(a: AttributeReference, vs)
          if vs.forall(_.isInstanceOf[Literal]) =>
        // null elements drop: `k IN (1, null)` only ever keeps k = 1
        // rows through the residual filter
        addSet(a, vs.collect { case l: Literal =>
          longOf(l) }.flatten)
      case InSet(a: AttributeReference, vs) =>
        if (statType(mSchema, a.name).contains(LongType) &&
            a.dataType == LongType)
          addSet(a, vs.toSeq.collect { case v: java.lang.Long =>
            v.longValue() })
      case _ => () // unprovable conjunct: no box, residual keeps it exact
    }

    val longBoxes = longRanges.collect {
      case (c, r) if r.lo.isDefined || r.hi.isDefined =>
        Layout.KeyBox(c, r.lo.getOrElse(Long.MinValue),
          r.hi.getOrElse(Long.MaxValue))
    }.toSeq
    // half-open typed ranges take wide-but-valid sentinels for the
    // missing side (dates); strings need both bounds (no top element)
    val dateBoxes = dateRanges.collect {
      case (c, r) if r.lo.isDefined || r.hi.isDefined =>
        Layout.TypedKeyBox(c, r.lo.map(dayStr).getOrElse("0001-01-01"),
          r.hi.map(dayStr).getOrElse("9999-12-31"))
    }.toSeq
    val tsBoxes = tsRanges.collect {
      case (c, r) if r.lo.isDefined || r.hi.isDefined =>
        Layout.TypedKeyBox(c,
          r.lo.map(tsStr).getOrElse("0001-01-01 00:00:00"),
          r.hi.map(tsStr).getOrElse("9999-12-31 23:59:59"))
    }.toSeq
    val strBoxes = strRanges.collect {
      case (c, r) if r.lo.isDefined && r.hi.isDefined =>
        Layout.TypedKeyBox(c, r.lo.get, r.hi.get)
    }.toSeq
    longBoxes ++ dateBoxes ++ tsBoxes ++ strBoxes ++ sets.toSeq
  }
}
