package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.RunnableCommand

import graft.ext.Layout

/** The lakehouse LIFECYCLE verbs as plain SQL — the write-side
  * complement of the `graft` DataSourceV2 reader (reads:
  * `USING graft OPTIONS (versionAsOf …)`), injected as a PARSER
  * extension ([[graft.GraftExtensions]] `injectParser`) so a
  * SQL-only session manages a layout end to end:
  *
  * {{{
  *   GRAFT DESCRIBE HISTORY '<dir>'
  *   GRAFT DESCRIBE DETAIL '<dir>'
  *   GRAFT OPTIMIZE '<dir>' TARGET <n> ROWS [DV RATIO <x>]
  *   GRAFT VACUUM '<dir>' RETAIN <n> [FORCE]
  *   GRAFT SHOW PINS '<dir>'
  *   GRAFT RESTORE '<dir>' VERSION AS OF <n>
  *   GRAFT CREATE '<dir>' KEYS (k, …) [GENERATIONS] AS <query>
  *   GRAFT APPEND INTO '<dir>' [MERGE SCHEMA] AS <query>
  *   GRAFT UPSERT INTO '<dir>' KEYS (k, …) AS <query>
  *   GRAFT MERGE INTO '<dir>' USING (<query>) ON (k, …)
  *         WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT
  *       | WHEN MATCHED THEN DELETE
  *   GRAFT UPDATE '<dir>' SET c = <expr>[, …] WHERE <pred> [AND <pred> …]
  *   GRAFT DELETE FROM '<dir>' WHERE <pred> [AND <pred> …]
  *                    [USING VECTORS]
  *     pred: <key> BETWEEN <lo> AND <hi>  |  <key> = <v>
  *         | <key> IN (<v>, …)   — values numeric or 'quoted' (typed)
  *   GRAFT ALTER '<dir>' ADD CONSTRAINT <name> CHECK (<expr>)
  *   GRAFT ALTER '<dir>' DROP CONSTRAINT <name>
  *   GRAFT SHOW CONSTRAINTS '<dir>'
  *   GRAFT SHOW STREAMS '<dir>'
  * }}}
  *
  * The write statements' `AS <query>` tails parse through SPARK'S OWN
  * parser (the dialect never grows a query grammar), so any SELECT
  * the session can run can seed, extend, or merge into a layout;
  * APPEND follows the layout's STORED manifest keys — the writer
  * never re-states (or silently changes) them — and DELETE's bounds
  * dispatch to the numeric or typed key box by literal form.
  *
  * Every statement is a THIN shell over the existing verb (no second
  * implementation of any semantics): OPTIMIZE dispatches to
  * [[Layout.optimizeSelective]] on a flat layout and
  * [[Layout.optimizePartitionedSelective]] on a hive-partitioned
  * tree — the file-subset forms, since "pay for the degradation, not
  * the table" is the only default that survives 100 TB; VACUUM's
  * FORCE maps to the snapshot-pin override and inherits its loud
  * refusal otherwise. Statements not starting with the GRAFT keyword
  * delegate verbatim to Spark's own parser — the extension never
  * shadows standard SQL. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlCommands.parse(session, delegate, sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String) = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
}

/** One eagerly-executed command node per statement: `output` is fixed
  * at parse time (for the DESCRIBE forms, from the very DataFrame the
  * verb builds — never a hand-maintained schema copy that could
  * drift), `exec` runs the verb when the command executes. */
private case class GraftVerbCommand(override val output: Seq[Attribute],
                                    exec: SparkSession => Seq[Row])
    extends RunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] =
    exec(sparkSession)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan = this
}

object GraftSqlCommands {
  // paths ride in standard single-quoted SQL string literals; the
  // statement forms are deliberately regex-simple (keyword dialect,
  // one layout path, scalar options) — anything more belongs in the
  // Scala API
  private val DescribeHistoryRe =
    """(?is)\s*GRAFT\s+DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*""".r
  private val DescribeDetailRe =
    """(?is)\s*GRAFT\s+DESCRIBE\s+DETAIL\s+'([^']+)'\s*;?\s*""".r
  private val OptimizeRe =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s+TARGET\s+(\d+)\s+ROWS(?:\s+DV\s+RATIO\s+([0-9]*\.?[0-9]+))?\s*;?\s*""".r
  private val VacuumRe =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'\s+RETAIN\s+(\d+)(\s+FORCE)?\s*;?\s*""".r
  private val RestoreRe =
    """(?is)\s*GRAFT\s+RESTORE\s+'([^']+)'\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val CreateRe =
    """(?is)\s*GRAFT\s+CREATE\s+'([^']+)'\s+KEYS\s*\(([^)]+)\)(\s+GENERATIONS)?\s+AS\s+(.+?)\s*;?\s*""".r
  private val AppendRe =
    """(?is)\s*GRAFT\s+APPEND\s+INTO\s+'([^']+)'(\s+MERGE\s+SCHEMA)?\s+AS\s+(.+?)\s*;?\s*""".r
  private val UpsertRe =
    """(?is)\s*GRAFT\s+UPSERT\s+INTO\s+'([^']+)'\s+KEYS\s*\(([^)]+)\)\s+AS\s+(.+?)\s*;?\s*""".r
  // the USING query is PARENTHESIZED so its own `… ON (…)` join
  // syntax can never be mistaken for the merge keys: the greedy
  // `(.+)` claims everything up to the LAST `) ON (keys) WHEN …`
  private val MergeRe =
    """(?is)\s*GRAFT\s+MERGE\s+INTO\s+'([^']+)'\s+USING\s*\((.+)\)\s+ON\s*\(([^)]+)\)\s+(WHEN\s+.+?)\s*;?\s*""".r
  private val MergeUpsertRe =
    """(?is)^WHEN\s+MATCHED\s+THEN\s+UPDATE\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT$""".r
  private val MergeDeleteRe =
    """(?is)^WHEN\s+MATCHED\s+THEN\s+DELETE$""".r
  private val DeleteRe =
    """(?is)\s*GRAFT\s+DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+?)(\s+USING\s+VECTORS)?\s*;?\s*""".r
  // the WHERE tail parses as a CONJUNCTION of key predicates —
  // consumed front-to-back with anchored forms (a naive split on
  // AND would cut BETWEEN's own AND in half). Literal form picks the
  // box: bare numbers → KeyBox, quoted strings → TypedKeyBox (date /
  // timestamp / string stats), IN (…) → KeySetBox (point-lookup
  // pruning through the manifest blooms).
  private val PredNumRe =
    """(?is)^(\w+)\s+BETWEEN\s+(-?\d+)\s+AND\s+(-?\d+)\b(.*)""".r
  private val PredStrRe =
    """(?is)^(\w+)\s+BETWEEN\s+'([^']*)'\s+AND\s+'([^']*)'(.*)""".r
  private val PredInRe =
    """(?is)^(\w+)\s+IN\s*\(\s*(-?\d+(?:\s*,\s*-?\d+)*)\s*\)(.*)""".r
  private val PredInStrRe =
    """(?is)^(\w+)\s+IN\s*\(\s*('[^']*'(?:\s*,\s*'[^']*')*)\s*\)(.*)""".r
  // = desugars to the degenerate BETWEEN (point lookups without the
  // ceremony); quoted form dispatches to the typed box like BETWEEN
  private val PredEqNumRe = """(?is)^(\w+)\s*=\s*(-?\d+)\b(.*)""".r
  private val PredEqStrRe = """(?is)^(\w+)\s*=\s*'([^']*)'(.*)""".r
  private val AndTailRe = """(?is)^\s+AND\s+(.+)""".r
  private val UpdateRe =
    """(?is)\s*GRAFT\s+UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val AssignRe = """(?is)^(\w+)\s*=\s*(.+)$""".r
  private val AddConstraintRe =
    """(?is)\s*GRAFT\s+ALTER\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+([\w-]+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraintRe =
    """(?is)\s*GRAFT\s+ALTER\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+([\w-]+)\s*;?\s*""".r
  private val ShowConstraintsRe =
    """(?is)\s*GRAFT\s+SHOW\s+CONSTRAINTS\s+'([^']+)'\s*;?\s*""".r
  private val ShowStreamsRe =
    """(?is)\s*GRAFT\s+SHOW\s+STREAMS\s+'([^']+)'\s*;?\s*""".r
  private val ShowPinsRe =
    """(?is)\s*GRAFT\s+SHOW\s+PINS\s+'([^']+)'\s*;?\s*""".r
  private val GraftPrefixRe = """(?is)\s*GRAFT\b.*""".r

  private def attrsOf(fields: (String, org.apache.spark.sql.types.DataType)*)
      : Seq[Attribute] =
    DataTypeUtils.toAttributes(org.apache.spark.sql.types.StructType(
      fields.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t, nullable = false) }))

  import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}

  def parse(session: SparkSession, delegate: ParserInterface,
            sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case DescribeHistoryRe(dir) =>
        // schema from the verb's own frame — construction is
        // manifest-sized driver planning, executed (collected) only
        // when the command runs
        val df = Layout.describeHistory(session, dir)
        Some(GraftVerbCommand(DataTypeUtils.toAttributes(df.schema),
          _ => df.collect().toIndexedSeq))
      case DescribeDetailRe(dir) =>
        val df = Layout.describeLayout(session, dir)
        Some(GraftVerbCommand(DataTypeUtils.toAttributes(df.schema),
          _ => df.collect().toIndexedSeq))
      case OptimizeRe(dir, target, dvRatio) =>
        // DV RATIO <x> raises the deletion-vector compaction trigger:
        // only files whose dv_rows/n_rows crossed x rewrite (the
        // read-tax hotspots); without it every vectorized file purges
        val ratio = if (dvRatio == null) 0.0 else dvRatio.toDouble
        Some(GraftVerbCommand(
          attrsOf("reclustered" -> BooleanType, "files_before" -> IntegerType,
            "files_after" -> IntegerType, "worst_depth_before" -> LongType,
            "files_kept" -> IntegerType),
          s => {
            val st =
              if (Layout.isHivePartitioned(s, dir))
                Layout.optimizePartitionedSelective(s, dir, target.toLong,
                  minDvRatio = ratio)
              else Layout.optimizeSelective(s, dir, target.toLong,
                minDvRatio = ratio)
            Seq(Row(st.reclustered, st.filesBefore, st.filesAfter,
              st.worstDepthBefore, st.filesKept))
          }))
      case VacuumRe(dir, retain, force) =>
        Some(GraftVerbCommand(
          attrsOf("manifests_dropped" -> IntegerType,
            "files_dropped" -> IntegerType),
          s => {
            val (mf, fd) = Layout.vacuumGenerations(s, dir, retain.toInt,
              force = force != null)
            Seq(Row(mf, fd))
          }))
      case RestoreRe(dir, gen) =>
        Some(GraftVerbCommand(
          attrsOf("committed" -> BooleanType, "files_kept" -> IntegerType,
            "files_copied" -> IntegerType, "files_retired" -> IntegerType),
          s => {
            val st = Layout.restoreSnapshot(s, dir, gen.toLong)
            Seq(Row(st.committed, st.filesKept, st.filesCopied,
              st.filesRetired))
          }))
      case ShowPinsRe(dir) =>
        // what would block a vacuum, by consumer name — the reader
        // side of the pin coordination (views and CDC streams
        // register; vacuum refuses below the oldest)
        Some(GraftVerbCommand(
          attrsOf("consumer" -> org.apache.spark.sql.types.StringType,
            "pinned_gen" -> LongType),
          s => Layout.snapshotPins(s, dir).toSeq.sortBy(_._1)
            .map { case (c, g) => Row(c, g) }))
      case CreateRe(dir, keys, gens, query) =>
        // CTAS: the AS-tail parses through SPARK'S OWN parser (the
        // dialect never grows a query grammar of its own), so any
        // SELECT the session can run can seed a layout
        val df = org.apache.spark.sql.GraftColumnBridge.frameOf(session,
          delegate.parseQuery(query))
        val keyCols = keys.split(',').map(_.trim).toSeq
        Some(GraftVerbCommand(
          attrsOf("files" -> IntegerType, "rows" -> LongType),
          s => {
            val fs = new org.apache.hadoop.fs.Path(dir)
              .getFileSystem(s.sparkContext.hadoopConfiguration)
            require(!fs.exists(new org.apache.hadoop.fs.Path(dir)),
              s"GRAFT CREATE refuses to overwrite $dir — choose a " +
                "fresh directory, or GRAFT APPEND INTO the existing one")
            df.write.parquet(dir)
            Layout.buildFileManifest(s, dir, keyCols)
              .write.mode("overwrite").parquet(s"$dir/_graft_manifest")
            if (gens != null) Layout.enableGenerations(s, dir)
            val out = s.read.parquet(dir)
            Seq(Row(out.inputFiles.length, out.count()))
          }))
      case AppendRe(dir, mergeSchema, query) =>
        val df = org.apache.spark.sql.GraftColumnBridge.frameOf(session,
          delegate.parseQuery(query))
        Some(GraftVerbCommand(attrsOf("rows_appended" -> LongType),
          s => {
            // the layout's EXISTING keys govern the new files' stats —
            // the writer never re-states (or silently changes) them.
            // MERGE SCHEMA opts into ADD COLUMN evolution (the
            // canonical-schema sidecar commits first — see
            // appendWithManifest); without it a new column stays a
            // loud error
            Layout.appendWithManifest(df, dir, Layout.storedKeys(s, dir),
              mergeSchema = mergeSchema != null)
            Seq(Row(df.count()))
          }))
      case UpsertRe(dir, keys, query) =>
        val df = org.apache.spark.sql.GraftColumnBridge.frameOf(session,
          delegate.parseQuery(query))
        val keyCols = keys.split(',').map(_.trim).toSeq
        Some(GraftVerbCommand(
          attrsOf("files_rewritten" -> IntegerType,
            "files_untouched" -> IntegerType, "rows_replaced" -> LongType,
            "rows_upserted" -> LongType),
          s => {
            val st =
              if (keyCols.lengthCompare(1) == 0)
                Layout.upsertByKey(s, dir, df, keyCols.head)
              else Layout.upsertByKeys(s, dir, df, keyCols)
            Seq(Row(st.filesRewritten, st.filesUntouched, st.rowsReplaced,
              st.rowsUpserted))
          }))
      case MergeRe(dir, query, keys, whenTail) =>
        // the lakehouse workhorse, desugared onto the EXISTING verbs
        // (never a third mutation implementation): MATCHED UPDATE +
        // NOT MATCHED INSERT is exactly upsert-by-keys (whole-row
        // replace from the source, source-only keys insert); MATCHED
        // DELETE is the deleteMatching rewrite. Any other WHEN
        // combination is refused with the two supported forms named
        val df = org.apache.spark.sql.GraftColumnBridge.frameOf(session,
          delegate.parseQuery(query))
        val keyCols = keys.split(',').map(_.trim).toSeq
        whenTail.trim match {
          case MergeUpsertRe() =>
            Some(GraftVerbCommand(
              attrsOf("files_rewritten" -> IntegerType,
                "files_untouched" -> IntegerType,
                "rows_replaced" -> LongType, "rows_upserted" -> LongType),
              s => {
                val st = Layout.upsertByKeys(s, dir, df, keyCols)
                Seq(Row(st.filesRewritten, st.filesUntouched,
                  st.rowsReplaced, st.rowsUpserted))
              }))
          case MergeDeleteRe() =>
            Some(GraftVerbCommand(
              attrsOf("files_rewritten" -> IntegerType,
                "rows_deleted" -> LongType),
              s => {
                val st = Layout.deleteMatching(s, dir, df, keyCols)
                Seq(Row(st.filesRewritten, st.rowsDeleted))
              }))
          case other => throw new IllegalArgumentException(
            s"unsupported GRAFT MERGE action clause '$other' — " +
              "supported: WHEN MATCHED THEN UPDATE WHEN NOT MATCHED " +
              "THEN INSERT (upsert semantics: matched rows replaced " +
              "by the source row, unmatched source rows inserted) | " +
              "WHEN MATCHED THEN DELETE (source-matched rows removed)")
        }
      case UpdateRe(dir, setPart, whereTail) =>
        // SET expressions parse through SPARK'S OWN expression parser
        // (same discipline as the AS-tails — the dialect never grows
        // an expression grammar); assignments split on TOP-LEVEL
        // commas only, so `SET a = f(x, y), b = 2` parses whole
        val assignments = splitTopLevel(setPart).map {
          case AssignRe(c, exprText) =>
            c -> org.apache.spark.sql.GraftColumnBridge.column(
              delegate.parseExpression(exprText))
          case other => throw new IllegalArgumentException(
            s"cannot parse GRAFT UPDATE assignment '$other' — each " +
              "must be <column> = <expression>")
        }
        val boxes = parseBoxes(whereTail)
        Some(GraftVerbCommand(
          attrsOf("files_rewritten" -> IntegerType,
            "files_untouched" -> IntegerType, "rows_updated" -> LongType),
          s => {
            val st = Layout.updateWhere(s, dir, boxes, assignments)
            Seq(Row(st.filesRewritten, st.filesUntouched, st.rowsUpdated))
          }))
      case DeleteRe(dir, whereTail, vect) =>
        Some(deleteCommand(dir, parseBoxes(whereTail), vect != null))
      case AddConstraintRe(dir, name, exprText) =>
        Some(GraftVerbCommand(
          attrsOf("constraints" -> IntegerType),
          s => {
            Layout.addCheckConstraint(s, dir, name, exprText)
            Seq(Row(Layout.checkConstraintsOf(s, dir).size))
          }))
      case DropConstraintRe(dir, name) =>
        Some(GraftVerbCommand(
          attrsOf("constraints" -> IntegerType),
          s => {
            Layout.dropCheckConstraint(s, dir, name)
            Seq(Row(Layout.checkConstraintsOf(s, dir).size))
          }))
      case ShowStreamsRe(dir) =>
        // intent columns are null unless an append is in flight or
        // crashed mid-flight — the state the streamAppend refusal
        // messages tell the operator to inspect
        Some(GraftVerbCommand(
          DataTypeUtils.toAttributes(org.apache.spark.sql.types.StructType(
            Seq(org.apache.spark.sql.types.StructField("query_id",
                org.apache.spark.sql.types.StringType, nullable = false),
              org.apache.spark.sql.types.StructField("last_batch",
                LongType, nullable = false),
              org.apache.spark.sql.types.StructField("intent_batch",
                LongType, nullable = true),
              org.apache.spark.sql.types.StructField("intent_gen",
                LongType, nullable = true)))),
          s => Layout.streamLedgers(s, dir)
            .map { case (q, b, ib, ig) =>
              Row(q, b, ib.orNull, ig.orNull) }))
      case ShowConstraintsRe(dir) =>
        Some(GraftVerbCommand(
          attrsOf("name" -> org.apache.spark.sql.types.StringType,
            "expr" -> org.apache.spark.sql.types.StringType),
          s => Layout.checkConstraintsOf(s, dir).sortBy(_._1)
            .map { case (n, e) => Row(n, e) }))
      case GraftPrefixRe() =>
        // a GRAFT statement that matches no form must fail HERE with
        // the dialect spelled out — falling through to Spark's parser
        // would surface a baffling generic syntax error
        throw new IllegalArgumentException(
          s"unrecognized GRAFT statement: $sqlText — supported forms: " +
            "GRAFT DESCRIBE HISTORY '<dir>' | GRAFT DESCRIBE DETAIL " +
            "'<dir>' | GRAFT OPTIMIZE '<dir>' TARGET <n> ROWS " +
            "[DV RATIO <x>] | GRAFT " +
            "VACUUM '<dir>' RETAIN <n> [FORCE] | GRAFT SHOW PINS " +
            "'<dir>' | GRAFT RESTORE '<dir>' " +
            "VERSION AS OF <n> | GRAFT CREATE '<dir>' KEYS (k, …) " +
            "[GENERATIONS] AS <query> | GRAFT APPEND INTO '<dir>' " +
            "[MERGE SCHEMA] AS " +
            "<query> | GRAFT UPSERT INTO '<dir>' KEYS (k, …) AS " +
            "<query> | GRAFT MERGE INTO '<dir>' USING (<query>) ON " +
            "(k, …) WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN " +
            "INSERT / WHEN MATCHED THEN DELETE | " +
            "GRAFT UPDATE '<dir>' SET c = <expr>, … WHERE " +
            "<pred> [AND <pred> …] | GRAFT DELETE FROM '<dir>' WHERE " +
            "<pred> [AND <pred> …] [USING VECTORS] (pred: <key> " +
            "BETWEEN <lo> AND <hi> | <key> = <v> | <key> IN (<v>, …)) " +
            "| GRAFT ALTER " +
            "'<dir>' ADD " +
            "CONSTRAINT <name> CHECK (<expr>) | GRAFT ALTER '<dir>' " +
            "DROP CONSTRAINT <name> | GRAFT SHOW CONSTRAINTS '<dir>' | " +
            "GRAFT SHOW STREAMS '<dir>'")
      case _ => None
    }

  /** Split on commas at paren depth zero outside string literals —
    * what lets a SET list carry function calls and quoted strings. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    for (ch <- s) ch match {
      case '\'' => inStr = !inStr; sb += ch
      case '(' if !inStr => depth += 1; sb += ch
      case ')' if !inStr => depth -= 1; sb += ch
      case ',' if !inStr && depth == 0 => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Parse a WHERE conjunction into prune boxes, front to back. */
  private[plans] def parseBoxes(whereTail: String): Seq[Layout.PruneBox] = {
    val boxes = scala.collection.mutable.ArrayBuffer[Layout.PruneBox]()
    var rest = whereTail.trim
    var done = false
    while (!done) {
      val after = rest match {
        case PredNumRe(k, lo, hi, tail) =>
          boxes += Layout.KeyBox(k, lo.toLong, hi.toLong); tail
        case PredStrRe(k, lo, hi, tail) =>
          boxes += Layout.TypedKeyBox(k, lo, hi); tail
        case PredInRe(k, vs, tail) =>
          boxes += Layout.KeySetBox(k,
            vs.split(',').map(_.trim.toLong).toSeq); tail
        case PredInStrRe(k, vs, tail) =>
          // quoted IN-list → the typed set box (the list splits on
          // commas BETWEEN quotes, so values may hold commas)
          boxes += Layout.TypedKeySetBox(k,
            "'([^']*)'".r.findAllMatchIn(vs).map(_.group(1)).toSeq); tail
        case PredEqNumRe(k, v, tail) =>
          boxes += Layout.KeyBox(k, v.toLong, v.toLong); tail
        case PredEqStrRe(k, v, tail) =>
          boxes += Layout.TypedKeyBox(k, v, v); tail
        case _ => throw new IllegalArgumentException(
          s"cannot parse GRAFT DELETE predicate at '$rest' — each " +
            "conjunct must be <key> BETWEEN <lo> AND <hi>, <key> = <v>, " +
            "or <key> IN (<v>, …) (values numeric or 'quoted'), " +
            "joined with AND")
      }
      after.trim match {
        case "" => done = true
        case _ => after match {
          case AndTailRe(next) => rest = next.trim
          case _ => throw new IllegalArgumentException(
            s"trailing text after a GRAFT DELETE predicate: '${after.trim}'" +
              " — conjuncts join with AND")
        }
      }
    }
    boxes.toSeq
  }

  private def deleteCommand(dir: String, boxes: Seq[Layout.PruneBox],
                            vectors: Boolean): LogicalPlan =
    // USING VECTORS dispatches to the merge-on-read verb, and its
    // output schema says so: partial files take a deletion VECTOR
    // instead of a rewrite, so the column is files_vectorized — a
    // SQL consumer reading the schema can tell which mode ran
    // instead of misreading vectorized files as rewritten ones
    if (vectors)
      GraftVerbCommand(
        attrsOf("files_dropped" -> IntegerType,
          "files_vectorized" -> IntegerType, "rows_deleted" -> LongType),
        s => {
          val st = Layout.deleteWhereDv(s, dir, boxes)
          Seq(Row(st.filesDropped, st.filesVectorized, st.rowsDeleted))
        })
    else
      GraftVerbCommand(
        attrsOf("files_dropped" -> IntegerType,
          "files_rewritten" -> IntegerType, "rows_deleted" -> LongType),
        s => {
          val st = Layout.deleteWhere(s, dir, boxes)
          Seq(Row(st.filesDropped, st.filesRewritten, st.rowsDeleted))
        })
}
