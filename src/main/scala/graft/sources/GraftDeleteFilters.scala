package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.ext.Layout

/** EXACT translation of ANSI `DELETE FROM t WHERE …` conditions into
  * the layout's prune-box vocabulary — what lets a graft catalog
  * table take standard SQL deletes through
  * [[org.apache.spark.sql.connector.catalog.SupportsDelete]].
  *
  * This is a DIFFERENT contract from the reader rewrites'
  * `GraftPruneBoxes.boxesOf`: pruning only needs each box to be a
  * SUPERSET of its conjunct (the query's own Filter re-applies as
  * the residual), but a delete-by-filter has no residual — the boxes
  * ARE the deletion predicate, so every conjunct must translate
  * EXACTLY or the statement must refuse (Spark surfaces
  * `canDeleteWhere = false` as a loud error, never a partial
  * delete). Exactness decides every case below: strict bounds close
  * by successor only on DISCRETE domains (long +1, date +1 day,
  * timestamp +1 micro — strings have no successor and refuse),
  * IS NOT NULL translates only where a full-domain range is
  * expressible, IN-list nulls drop (a null element never equals
  * anything, so the reduced set deletes the same rows), and any
  * column outside the manifest keys refuses — the box vocabulary
  * (and the pay-for-the-touch file classification it drives) is
  * defined by the layout's declared keys.
  */
private[graft] object GraftDeleteFilters {

  /** `Some(boxes)` when `filters` (implicitly AND'd, Spark's delete
    * contract) translate exactly; `None` refuses the statement.
    * `AlwaysFalse` yields an impossible box (a no-op delete). */
  def boxesOf(schema: StructType, keys: Set[String],
              filters: Seq[Filter]): Option[Seq[Layout.PruneBox]] = {
    val conjuncts = flatten(filters)
    if (conjuncts.isEmpty) None // DELETE without WHERE — refuse here
    else {
      val boxes = conjuncts.map(boxOf(schema, keys, _))
      if (boxes.exists(_.isEmpty)) None else Some(boxes.flatten)
    }
  }

  private def flatten(fs: Seq[Filter]): Seq[Filter] = fs.flatMap {
    case And(a, b) => flatten(Seq(a, b))
    case f => Seq(f)
  }

  private sealed trait Key
  private case object LongKey extends Key
  private case object StringKey extends Key
  private case object DateKey extends Key
  private case object TsKey extends Key

  private def keyOf(schema: StructType, keys: Set[String],
                    c: String): Option[Key] =
    if (!keys.contains(c)) None
    else schema.fields.find(_.name == c).map(_.dataType).collect {
      case ByteType | ShortType | IntegerType | LongType => LongKey
      case StringType => StringKey
      case DateType => DateKey
      case TimestampType => TsKey
    }

  private def longOf(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  private def strOf(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case _ => None
  }

  private def dateOf(v: Any): Option[java.time.LocalDate] = v match {
    case d: java.sql.Date => Some(d.toLocalDate)
    case d: java.time.LocalDate => Some(d)
    case _ => None
  }

  private def microsOf(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(Math.multiplyExact(t.getTime, 1000L) +
        (t.getNanos % 1000000) / 1000L)
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        i.getNano / 1000L))
    case _ => None
  }

  private def point(k: Key, c: String, v: Any): Option[Layout.PruneBox] =
    k match {
      case LongKey => longOf(v).map(l => Layout.KeyBox(c, l, l))
      case StringKey => strOf(v).map(s => Layout.TypedKeyBox(c, s, s))
      case DateKey =>
        dateOf(v).map(d => Layout.TypedKeyBox(c, d.toString, d.toString))
      case TsKey =>
        microsOf(v).map(m => Layout.TsMicrosBox(c, Some(m), Some(m)))
    }

  /** An impossible box on `c` — a delete that provably matches
    * nothing (`IN ()` after null-dropping, `> Long.MaxValue`). */
  private def nothing(k: Key, c: String): Layout.PruneBox = k match {
    case LongKey => Layout.KeyBox(c, 1L, 0L)
    case StringKey | DateKey => Layout.TypedKeyBox(c, "b", "a")
    case TsKey => Layout.TsMicrosBox(c, Some(1L), Some(0L))
  }

  private def bound(k: Key, c: String, v: Any, lower: Boolean,
                    inclusive: Boolean): Option[Layout.PruneBox] = k match {
    case LongKey => longOf(v).map { l =>
      if (lower) {
        if (inclusive) Layout.KeyBox(c, l, Long.MaxValue)
        else if (l == Long.MaxValue) nothing(k, c)
        else Layout.KeyBox(c, l + 1L, Long.MaxValue)
      } else {
        if (inclusive) Layout.KeyBox(c, Long.MinValue, l)
        else if (l == Long.MinValue) nothing(k, c)
        else Layout.KeyBox(c, Long.MinValue, l - 1L)
      }
    }
    case StringKey =>
      // strings have no successor: only INCLUSIVE bounds are exact
      if (!inclusive) None
      else strOf(v).map(s =>
        if (lower) Layout.TypedBoundsBox(c, Some(s), None)
        else Layout.TypedBoundsBox(c, None, Some(s)))
    case DateKey => dateOf(v).map { d =>
      val adj = if (inclusive) d else if (lower) d.plusDays(1)
                else d.minusDays(1)
      if (lower) Layout.TypedBoundsBox(c, Some(adj.toString), None)
      else Layout.TypedBoundsBox(c, None, Some(adj.toString))
    }
    case TsKey => microsOf(v).map { m =>
      val adj = if (inclusive) m else if (lower) m + 1L else m - 1L
      if (lower) Layout.TsMicrosBox(c, Some(adj), None)
      else Layout.TsMicrosBox(c, None, Some(adj))
    }
  }

  private def inSet(k: Key, c: String,
                    vs: Seq[Any]): Option[Layout.PruneBox] = {
    val nonNull = vs.filter(_ != null) // null ∈ IN-list matches nothing
    if (nonNull.isEmpty) Some(nothing(k, c))
    else k match {
      case LongKey =>
        val ls = nonNull.map(longOf)
        if (ls.exists(_.isEmpty)) None
        else Some(Layout.KeySetBox(c, ls.flatten))
      case StringKey =>
        val ss = nonNull.map(strOf)
        if (ss.exists(_.isEmpty)) None
        else Some(Layout.TypedKeySetBox(c, ss.flatten))
      case DateKey =>
        val ds = nonNull.map(dateOf)
        if (ds.exists(_.isEmpty)) None
        else Some(Layout.TypedKeySetBox(c, ds.flatten.map(_.toString)))
      case TsKey =>
        val ms = nonNull.map(microsOf)
        if (ms.exists(_.isEmpty)) None
        else Some(Layout.TsMicrosSetBox(c, ms.flatten))
    }
  }

  private def boxOf(schema: StructType, keys: Set[String],
                    f: Filter): Option[Layout.PruneBox] = f match {
    case AlwaysFalse() =>
      // any translatable key column carries the impossible box
      keys.toSeq.sorted.view
        .flatMap(c => keyOf(schema, keys, c).map(nothing(_, c)))
        .headOption
    case EqualTo(c, v) if v != null =>
      keyOf(schema, keys, c).flatMap(point(_, c, v))
    case EqualNullSafe(c, v) if v != null =>
      // <=> with a non-null literal deletes exactly the = rows
      keyOf(schema, keys, c).flatMap(point(_, c, v))
    case In(c, vs) =>
      keyOf(schema, keys, c).flatMap(inSet(_, c, vs.toSeq))
    case GreaterThanOrEqual(c, v) =>
      keyOf(schema, keys, c).flatMap(bound(_, c, v, lower = true,
        inclusive = true))
    case GreaterThan(c, v) =>
      keyOf(schema, keys, c).flatMap(bound(_, c, v, lower = true,
        inclusive = false))
    case LessThanOrEqual(c, v) =>
      keyOf(schema, keys, c).flatMap(bound(_, c, v, lower = false,
        inclusive = true))
    case LessThan(c, v) =>
      keyOf(schema, keys, c).flatMap(bound(_, c, v, lower = false,
        inclusive = false))
    case IsNotNull(c) =>
      // exact only where a full-domain range exists: longs span
      // [Min, Max], strings are >= "", timestamps span micro-Longs;
      // dates extend before any renderable bound — refuse
      keyOf(schema, keys, c).flatMap {
        case LongKey =>
          Some(Layout.KeyBox(c, Long.MinValue, Long.MaxValue))
        case StringKey => Some(Layout.TypedBoundsBox(c, Some(""), None))
        case TsKey =>
          Some(Layout.TsMicrosBox(c, Some(Long.MinValue), None))
        case DateKey => None
      }
    case _ => None
  }
}
