package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types._

import graft.ext.Layout

/** ANSI `UPDATE` and `MERGE INTO` for graft catalog tables — the
  * standard-SQL complement of the `SupportsDelete` path (DELETE) and
  * the GRAFT dialect verbs:
  *
  * {{{
  *   UPDATE t SET v = v + 1 WHERE k BETWEEN 0 AND 9
  *   MERGE INTO t USING s ON t.k = s.k
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *   MERGE INTO t USING s ON t.k = s.k
  *     WHEN MATCHED THEN DELETE
  * }}}
  *
  * Spark's built-in analyzer honors these nodes only for tables with
  * V2 row-level-operation support; a session-catalog graft table
  * would refuse. So [[GraftSqlParser]] hands every delegate-parsed
  * plan through [[rewrite]], which replaces a ROOT UpdateTable /
  * MergeIntoTable whose target names a registered graft table with
  * an eager command over the EXISTING verb — `Layout.updateWhere`
  * (simultaneous assignment from pre-update values, determinism and
  * type preservation proved, constraint-checked) and
  * `Layout.upsertByKeys` / `deleteMatching` (the same desugarings
  * the GRAFT MERGE dialect uses; never a new mutation
  * implementation). Non-graft targets pass through untouched.
  *
  * The UPDATE condition must render as EXACT boxes over the layout's
  * declared keys — same contract as the ANSI DELETE translation
  * ([[graft.sources.GraftDeleteFilters]]), stated over parse-time
  * Catalyst expressions: literal =, IN, ranges and BETWEEN
  * conjuncts; strict bounds close by successor on discrete domains;
  * anything weaker refuses loudly rather than updating a superset.
  * MERGE supports the two whole-row shapes (`UPDATE SET *` +
  * `INSERT *`, and bare `DELETE`), key-equality join conditions
  * only, no conditional actions, no NOT MATCHED BY SOURCE, no
  * schema evolution — each refusal names what IS supported.
  */
object GraftAnsiDml {

  def rewrite(session: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case u @ UpdateTable(rel, assignments, cond) =>
        targetOf(session, rel) match {
          case None => u
          case Some((dir, quals)) =>
            updateCommand(session, dir, quals, assignments, cond)
        }
      case m: MergeIntoTable =>
        targetOf(session, m.targetTable) match {
          case None => m
          case Some((dir, tQuals)) => mergeCommand(session, dir, tQuals, m)
        }
      case p => p
    }

  /** The layout path + acceptable qualifier spellings when `plan` is
    * a (possibly aliased) graft catalog relation. */
  private def targetOf(session: SparkSession,
                       plan: LogicalPlan): Option[(String, Set[String])] =
    plan match {
      case SubqueryAlias(ident, child) =>
        targetOf(session, child).map { case (d, q) =>
          (d, q + ident.name.toLowerCase(java.util.Locale.ROOT))
        }
      case u: UnresolvedRelation =>
        GraftSqlCommands.catalogGraftPath(session, u.multipartIdentifier)
          .map(d => (d, u.multipartIdentifier
            .map(_.toLowerCase(java.util.Locale.ROOT)).toSet))
      case _ => None
    }

  // ───────────────────────── UPDATE ─────────────────────────

  private def updateCommand(session: SparkSession, dir: String,
                            quals: Set[String],
                            assignments: Seq[Assignment],
                            cond: Option[Expression]): LogicalPlan = {
    val expr = cond.getOrElse(throw new IllegalArgumentException(
      s"UPDATE of the graft table at $dir needs a WHERE over its " +
        "declared keys — a whole-table update has no bounded file " +
        "footprint; spell the full key range out if that is the intent"))
    val keys = Layout.storedKeys(session, dir).toSet
    // the sidecar is the schema authority when the layout has
    // evolved; a bare directory resolves through its footers
    val schema = Layout.storedSchemaOf(session, dir)
      .getOrElse(session.read.parquet(dir).schema)
    val boxes = boxesOfExpr(expr, keys, schema, quals).getOrElse(
      throw new IllegalArgumentException(
        s"UPDATE condition $expr has no exact box form over " +
          s"the declared keys of $dir — supported: =, IN, range and " +
          "BETWEEN conjuncts on manifest key columns (strict bounds " +
          "on discrete types); use GRAFT UPDATE or Layout.updateWhere " +
          "for anything richer"))
    val set = assignments.map { a =>
      val name = a.key match {
        case ua: UnresolvedAttribute if ua.nameParts.size == 1 =>
          ua.nameParts.head
        case ua: UnresolvedAttribute if ua.nameParts.size == 2 &&
            quals(ua.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
          ua.nameParts.last
        case other => throw new IllegalArgumentException(
          s"cannot UPDATE target column ${other.sql} — assignments " +
            "must set plain columns of the table")
      }
      name -> org.apache.spark.sql.GraftColumnBridge.column(
        stripQualifiers(a.value, quals))
    }
    GraftVerbCommand(
      attrsOf("files_rewritten" -> IntegerType,
        "files_untouched" -> IntegerType, "rows_updated" -> LongType),
      s => {
        val st = Layout.updateWhere(s, dir, boxes, set)
        Seq(Row(st.filesRewritten, st.filesUntouched, st.rowsUpdated))
      })
  }

  /** Rewrite `t.v` → `v` in assignment values so they resolve
    * against the layout frame updateWhere builds (which carries no
    * alias). Only the statement's own qualifiers strip. */
  private def stripQualifiers(e: Expression,
                              quals: Set[String]): Expression =
    e.transformUp {
      case ua: UnresolvedAttribute if ua.nameParts.size == 2 &&
          quals(ua.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
        UnresolvedAttribute(Seq(ua.nameParts.last))
    }

  // ───────────────────────── MERGE ─────────────────────────

  private def mergeCommand(session: SparkSession, dir: String,
                           tQuals: Set[String],
                           m: MergeIntoTable): LogicalPlan = {
    require(!m.withSchemaEvolution,
      s"MERGE WITH SCHEMA EVOLUTION is not supported on the graft " +
        s"table at $dir — evolve via APPEND with MERGE SCHEMA first")
    require(m.notMatchedBySourceActions.isEmpty,
      s"MERGE … WHEN NOT MATCHED BY SOURCE is not supported on the " +
        s"graft table at $dir — supported: WHEN MATCHED THEN UPDATE " +
        "SET * + WHEN NOT MATCHED THEN INSERT *, or WHEN MATCHED " +
        "THEN DELETE")
    val sQuals = m.sourceTable match {
      case SubqueryAlias(ident, _) =>
        Set(ident.name.toLowerCase(java.util.Locale.ROOT))
      case u: UnresolvedRelation =>
        u.multipartIdentifier.map(_.toLowerCase(java.util.Locale.ROOT))
          .toSet
      case _ => Set.empty[String]
    }
    val keys = splitAnd(m.mergeCondition).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        val (an, bn) = (a.nameParts, b.nameParts)
        require(an.last.equalsIgnoreCase(bn.last),
          s"MERGE key ${a.sql} = ${b.sql} joins differently-named " +
            "columns — the graft upsert joins by NAME; alias the " +
            "source column to the target's name")
        def side(p: Seq[String]): Option[Boolean] = // true = target
          if (p.size < 2) None
          else {
            val q = p.head.toLowerCase(java.util.Locale.ROOT)
            if (tQuals(q)) Some(true)
            else if (sQuals(q)) Some(false) else None
          }
        (side(an), side(bn)) match {
          case (Some(x), Some(y)) if x != y => an.last
          case _ => throw new IllegalArgumentException(
            s"MERGE key ${a.sql} = ${b.sql} must qualify one side " +
              "with the target and the other with the source " +
              "(t.k = s.k) so the join direction is unambiguous")
        }
      case other => throw new IllegalArgumentException(
        s"MERGE condition ${other.sql} is not a key equality — the " +
          "graft merge joins on AND'd t.<key> = s.<key> conjuncts only")
    }
    val src = org.apache.spark.sql.GraftColumnBridge.frameOf(session,
      m.sourceTable)
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) =>
        GraftVerbCommand(
          attrsOf("files_rewritten" -> IntegerType,
            "files_untouched" -> IntegerType,
            "rows_replaced" -> LongType, "rows_upserted" -> LongType),
          s => {
            val st = Layout.upsertByKeys(s, dir, src, keys)
            Seq(Row(st.filesRewritten, st.filesUntouched,
              st.rowsReplaced, st.rowsUpserted))
          })
      case (Seq(DeleteAction(None)), Seq()) =>
        GraftVerbCommand(
          attrsOf("files_rewritten" -> IntegerType,
            "rows_deleted" -> LongType),
          s => {
            val st = Layout.deleteMatching(s, dir, src, keys)
            Seq(Row(st.filesRewritten, st.rowsDeleted))
          })
      case other => throw new IllegalArgumentException(
        s"unsupported MERGE action combination on the graft table at " +
          s"$dir (${other.toString.take(200)}) — supported: WHEN " +
          "MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
          "(whole-row upsert), or WHEN MATCHED THEN DELETE; " +
          "conditional WHEN clauses and column-list forms are not")
    }
  }

  // ─────────── exact Catalyst-condition → box translation ───────────

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitAnd(a) ++ splitAnd(b)
    case x => Seq(x)
  }

  private sealed trait Key
  private case object LongKey extends Key
  private case object StringKey extends Key
  private case object DateKey extends Key
  private case object TsKey extends Key

  private def boxesOfExpr(e: Expression, keys: Set[String],
                          schema: StructType, quals: Set[String])
      : Option[Seq[Layout.PruneBox]] = {
    val boxes = splitAnd(e).map(conjunctBoxes(_, keys, schema, quals))
    if (boxes.isEmpty || boxes.exists(_.isEmpty)) None
    else Some(boxes.flatten.flatten)
  }

  /** One conjunct → its boxes. `x BETWEEN lo AND hi` arrives from
    * the parser as the unresolved `between` FUNCTION (the analyzer
    * would later expand it to the two comparisons) — expand it here
    * the same way, into two inclusive bound boxes. */
  private def conjunctBoxes(e: Expression, keys: Set[String],
                            schema: StructType, quals: Set[String])
      : Option[Seq[Layout.PruneBox]] = e match {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) ==
          Seq("between") && f.arguments.size == 3 && !f.isDistinct =>
      val Seq(x, lo, hi) = f.arguments
      for {
        a <- boxOf(GreaterThanOrEqual(x, lo), keys, schema, quals)
        b <- boxOf(LessThanOrEqual(x, hi), keys, schema, quals)
      } yield Seq(a, b)
    case other => boxOf(other, keys, schema, quals).map(Seq(_))
  }

  private def keyNameOf(e: Expression, keys: Set[String],
                        quals: Set[String]): Option[String] = e match {
    case ua: UnresolvedAttribute =>
      val name =
        if (ua.nameParts.size == 1) Some(ua.nameParts.head)
        else if (ua.nameParts.size == 2 &&
          quals(ua.nameParts.head.toLowerCase(java.util.Locale.ROOT)))
          Some(ua.nameParts.last)
        else None
      name.filter(n => keys.exists(_.equalsIgnoreCase(n)))
        .map(n => keys.find(_.equalsIgnoreCase(n)).get)
    case _ => None
  }

  private def keyTypeOf(schema: StructType, c: String): Option[Key] =
    schema.fields.find(_.name == c).map(_.dataType).collect {
      case ByteType | ShortType | IntegerType | LongType => LongKey
      case StringType => StringKey
      case DateType => DateKey
      case TimestampType => TsKey
    }

  /** A literal rendered for the key's box vocabulary: integral
    * literals widen exactly to Long; strings pass through (TypedKey
    * boxes cast them ANSI-loud at plan time — the same cast the
    * analyzer would have inserted); date literals render ISO; typed
    * timestamp literals carry their micros; a STRING literal against
    * a timestamp key parses in the SESSION zone at micro precision
    * (exactly the analyzer's cast), so every zone stays exact. */
  private def valueOf(k: Key, lit: Literal): Option[scala.util.Either[Long, String]] =
    (k, lit.dataType, lit.value) match {
      case (_, _, null) => None
      case (LongKey, ByteType | ShortType | IntegerType | LongType, v) =>
        Some(scala.util.Left(v.asInstanceOf[java.lang.Number].longValue()))
      case (StringKey, StringType, v) => Some(scala.util.Right(v.toString))
      case (DateKey, StringType, v) => Some(scala.util.Right(v.toString))
      case (DateKey, DateType, v) =>
        Some(scala.util.Right(java.time.LocalDate
          .ofEpochDay(v.asInstanceOf[Int].toLong).toString))
      case (TsKey, TimestampType, v) =>
        Some(scala.util.Left(v.asInstanceOf[Long])) // epoch micros
      case (TsKey, StringType, v) =>
        graft.sources.GraftInstants.microsOf(v.toString).map(scala.util.Left(_))
      case _ => None
    }

  private def pointBox(k: Key, c: String,
                       v: scala.util.Either[Long, String]): Layout.PruneBox =
    (k, v) match {
      case (LongKey, scala.util.Left(l)) => Layout.KeyBox(c, l, l)
      case (TsKey, scala.util.Left(m)) => Layout.TsMicrosBox(c, Some(m), Some(m))
      case (_, scala.util.Right(s)) => Layout.TypedKeyBox(c, s, s)
      case _ => throw new IllegalStateException(s"box form for $k")
    }

  private def boundBox(k: Key, c: String, v: scala.util.Either[Long, String],
                       lower: Boolean, inclusive: Boolean)
      : Option[Layout.PruneBox] = (k, v) match {
    case (LongKey, scala.util.Left(l)) =>
      val adj = if (inclusive) Some(l)
        else if (lower) { if (l == Long.MaxValue) None else Some(l + 1L) }
        else { if (l == Long.MinValue) None else Some(l - 1L) }
      adj.map(a =>
        if (lower) Layout.KeyBox(c, a, Long.MaxValue)
        else Layout.KeyBox(c, Long.MinValue, a))
        .orElse(Some(Layout.KeyBox(c, 1L, 0L))) // empty range
    case (TsKey, scala.util.Left(m)) =>
      val adj = if (inclusive) m else if (lower) m + 1L else m - 1L
      Some(if (lower) Layout.TsMicrosBox(c, Some(adj), None)
           else Layout.TsMicrosBox(c, None, Some(adj)))
    case (DateKey, scala.util.Right(s)) =>
      val d = java.time.LocalDate.parse(s)
      val adj = if (inclusive) d else if (lower) d.plusDays(1)
                else d.minusDays(1)
      Some(if (lower) Layout.TypedBoundsBox(c, Some(adj.toString), None)
           else Layout.TypedBoundsBox(c, None, Some(adj.toString)))
    case (StringKey, scala.util.Right(s)) if inclusive =>
      Some(if (lower) Layout.TypedBoundsBox(c, Some(s), None)
           else Layout.TypedBoundsBox(c, None, Some(s)))
    case _ => None
  }

  private def boxOf(e: Expression, keys: Set[String],
                    schema: StructType, quals: Set[String])
      : Option[Layout.PruneBox] = {
    def key(a: Expression): Option[(String, Key)] =
      keyNameOf(a, keys, quals).flatMap(c =>
        keyTypeOf(schema, c).map(c -> _))
    def lit(x: Expression): Option[Literal] = x match {
      case l: Literal => Some(l)
      case _ => None
    }
    e match {
      case EqualTo(a, b) =>
        (key(a), lit(b)) match {
          case (Some((c, k)), Some(l)) =>
            valueOf(k, l).map(pointBox(k, c, _))
          case _ => (key(b), lit(a)) match {
            case (Some((c, k)), Some(l)) =>
              valueOf(k, l).map(pointBox(k, c, _))
            case _ => None
          }
        }
      case In(a, vs) =>
        key(a).flatMap { case (c, k) =>
          val lits = vs.map(lit)
          if (lits.exists(_.isEmpty)) None
          else {
            val vals = lits.flatten.filter(_.value != null)
              .map(valueOf(k, _))
            if (vals.exists(_.isEmpty)) None
            else if (vals.isEmpty)
              // IN () after null-dropping matches nothing
              Some(Layout.KeyBox(c, 1L, 0L))
            else k match {
              case LongKey =>
                Some(Layout.KeySetBox(c,
                  vals.flatten.collect { case scala.util.Left(l) => l }))
              case TsKey =>
                Some(Layout.TsMicrosSetBox(c,
                  vals.flatten.collect { case scala.util.Left(m) => m }))
              case StringKey | DateKey =>
                Some(Layout.TypedKeySetBox(c,
                  vals.flatten.collect { case scala.util.Right(s) => s }))
            }
          }
        }
      case GreaterThanOrEqual(a, b) => rangeOf(key(a), lit(b),
        key(b), lit(a), lowerIfLeftKey = true, inclusive = true)
      case GreaterThan(a, b) => rangeOf(key(a), lit(b),
        key(b), lit(a), lowerIfLeftKey = true, inclusive = false)
      case LessThanOrEqual(a, b) => rangeOf(key(a), lit(b),
        key(b), lit(a), lowerIfLeftKey = false, inclusive = true)
      case LessThan(a, b) => rangeOf(key(a), lit(b),
        key(b), lit(a), lowerIfLeftKey = false, inclusive = false)
      case _ => None
    }
  }

  /** `k ⊙ lit` or the flipped `lit ⊙ k` — the flip mirrors the
    * bound's side. */
  private def rangeOf(leftKey: Option[(String, Key)],
                      rightLit: Option[Literal],
                      rightKey: Option[(String, Key)],
                      leftLit: Option[Literal],
                      lowerIfLeftKey: Boolean, inclusive: Boolean)
      : Option[Layout.PruneBox] =
    (leftKey, rightLit) match {
      case (Some((c, k)), Some(l)) =>
        valueOf(k, l).flatMap(boundBox(k, c, _, lowerIfLeftKey, inclusive))
      case _ => (rightKey, leftLit) match {
        case (Some((c, k)), Some(l)) =>
          valueOf(k, l).flatMap(boundBox(k, c, _, !lowerIfLeftKey,
            inclusive))
        case _ => None
      }
    }

  private def attrsOf(fields: (String, DataType)*): Seq[Attribute] =
    DataTypeUtils.toAttributes(StructType(
      fields.map { case (n, t) => StructField(n, t, nullable = false) }))
}
