package graft

/** `MERGE INTO` for the SQL session — the upsert primitive that completes
  * the mutation surface (INSERT / UPDATE / DELETE shipped in round 2).
  * Spark only supports MERGE on v2 tables with row-level-operation
  * support; on the session's bare-parquet warehouse tables it executes as
  * the same copy-on-write rewrite the other mutations use.
  *
  * Supported grammar (one clause of each kind, the common CDC shape):
  *
  * {{{
  * MERGE INTO t [[AS] a] USING (<query>) [AS] s | src_table [[AS] s]
  *   ON <condition>
  *   [WHEN MATCHED THEN UPDATE SET c = expr, …]   -- or: WHEN MATCHED THEN DELETE
  *   [WHEN NOT MATCHED THEN INSERT (c, …) VALUES (expr, …)]  -- or: INSERT *
  * }}}
  *
  * Semantics follow the SQL standard: all UPDATE expressions evaluate
  * against the (old target row, source row) pair; a target row matching
  * MORE THAN ONE source row is an error (the result would be
  * nondeterministic — the same rule Delta/DuckDB enforce); source rows
  * with a NULL/false condition are "not matched".
  */
private[graft] object Merge {

  sealed trait MatchedAction
  final case class UpdateAction(sets: Seq[(String, String)]) extends MatchedAction
  case object DeleteAction extends MatchedAction

  /** cols/values of `INSERT (…) VALUES (…)`; `None` = `INSERT *`. */
  final case class InsertAction(colsValues: Option[(Seq[String], Seq[String])])

  final case class MergeSpec(
      table: String, tableAlias: String,
      sourceSql: Either[String, String], // Left(table name) | Right(subquery text)
      sourceAlias: String,
      cond: String,
      matched: Option[MatchedAction],
      notMatched: Option[InsertAction])

  private val Head =
    """(?is)^\s*MERGE\s+INTO\s+([A-Za-z_][A-Za-z_0-9]*)(?:\s+(?:AS\s+)?([A-Za-z_][A-Za-z_0-9]*))?\s+USING\s+(.*)$""".r

  /** Index of the first occurrence of keyword `kw` at paren depth 0 that is
    * also outside any CASE … END or MATCH … END expression — those carry
    * their own WHEN/THEN arms at paren depth 0, so the plain top-level scan
    * (Sql.topLevelKeywordIndex) would cut a MERGE clause at the first
    * `CASE WHEN` inside an ON condition or SET expression. */
  private def clauseKeywordIndex(text: String, kw: String): Int = {
    var depth = 0; var caseDepth = 0; var i = 0
    while (i < text.length) {
      text(i) match {
        case q @ ('\'' | '"' | '`') =>
          i += 1
          while (i < text.length && text(i) != q) {
            if (text(i) == '\\' && q != '`' && i + 1 < text.length) i += 2 else i += 1
          }
          i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c if c.isLetter || c == '_' =>
          val start = i
          while (i < text.length && (text(i).isLetterOrDigit || text(i) == '_')) i += 1
          val word = text.substring(start, i)
          if (depth == 0) {
            if (word.equalsIgnoreCase("CASE") || word.equalsIgnoreCase("MATCH")) caseDepth += 1
            else if (word.equalsIgnoreCase("END") && caseDepth > 0) caseDepth -= 1
            else if (caseDepth == 0 && word.equalsIgnoreCase(kw)) return start
          }
        case _ => i += 1
      }
    }
    -1
  }

  /** Parse `stmt` as MERGE, or None if it is not one. Malformed MERGE
    * throws (a statement that names the verb must not fall through to the
    * stock parser, which would produce a misleading error). */
  def parse(stmt: String): Option[MergeSpec] = stmt match {
    case Head(table, aliasOpt, rest0) =>
      val tableAlias = Option(aliasOpt).getOrElse(table)
      // source spec runs up to the top-level ON
      val onIdx = clauseKeywordIndex(rest0, "ON")
      require(onIdx > 0, s"MERGE: expected ON <condition> in: $stmt")
      val (srcSpec, afterOn) = (rest0.substring(0, onIdx).trim, rest0.substring(onIdx + 2))
      val (sourceSql, sourceAlias) =
        if (srcSpec.startsWith("(")) {
          val close = srcSpec.lastIndexOf(')')
          require(close > 0, s"MERGE: unclosed source subquery: $srcSpec")
          val alias = srcSpec.substring(close + 1).trim match {
            case a if a.isEmpty => throw new IllegalArgumentException(
              "MERGE: a source subquery needs an alias")
            case a => a.replaceFirst("(?i)^AS\\s+", "").trim
          }
          (Right(srcSpec.substring(1, close)): Either[String, String], alias)
        } else srcSpec.split("\\s+").toSeq match {
          case Seq(t) => (Left(t): Either[String, String], t)
          case Seq(t, a) => (Left(t): Either[String, String], a)
          case Seq(t, as, a) if as.equalsIgnoreCase("AS") =>
            (Left(t): Either[String, String], a)
          case _ => throw new IllegalArgumentException(
            s"MERGE: cannot parse source '$srcSpec'")
        }
      // condition runs up to the first top-level WHEN
      val whenIdx = clauseKeywordIndex(afterOn, "WHEN")
      require(whenIdx > 0, s"MERGE: expected at least one WHEN clause in: $stmt")
      val cond = afterOn.substring(0, whenIdx).trim
      // split the remaining text into WHEN clauses
      var rest = afterOn.substring(whenIdx)
      val clauses = Seq.newBuilder[String]
      while (rest.nonEmpty) {
        val next = clauseKeywordIndex(rest.substring(4), "WHEN") match {
          case -1 => rest.length
          case i => i + 4
        }
        clauses += rest.substring(0, next).trim.stripSuffix(";").trim
        rest = rest.substring(next)
      }
      var matched: Option[MatchedAction] = None
      var notMatched: Option[InsertAction] = None
      val UpdateClause =
        """(?is)^WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.+)$""".r
      val DeleteClause = """(?is)^WHEN\s+MATCHED\s+THEN\s+DELETE$""".r
      val InsertClause =
        """(?is)^WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+(.+)$""".r
      clauses.result().foreach {
        case UpdateClause(sets) =>
          require(matched.isEmpty, "MERGE: more than one WHEN MATCHED clause")
          val pairs = Sql.splitTopLevel(sets, ',').map { a =>
            a.split("=", 2) match {
              case Array(c, e) =>
                c.trim.stripPrefix("`").stripSuffix("`") -> e.trim
              case _ => throw new IllegalArgumentException(
                s"MERGE: bad SET assignment '$a'")
            }
          }
          matched = Some(UpdateAction(pairs))
        case c if DeleteClause.matches(c) =>
          require(matched.isEmpty, "MERGE: more than one WHEN MATCHED clause")
          matched = Some(DeleteAction)
        case InsertClause(ins) =>
          require(notMatched.isEmpty, "MERGE: more than one WHEN NOT MATCHED clause")
          val body = ins.trim
          if (body == "*") notMatched = Some(InsertAction(None))
          else {
            val vIdx = clauseKeywordIndex(body, "VALUES")
            require(vIdx > 0, s"MERGE: expected INSERT (cols) VALUES (exprs), got: $body")
            def parenList(s: String): Seq[String] = {
              val t = s.trim
              require(t.startsWith("(") && t.endsWith(")"),
                s"MERGE: expected a parenthesized list, got: $s")
              Sql.splitTopLevel(t.substring(1, t.length - 1), ',')
            }
            val cols = parenList(body.substring(0, vIdx))
              .map(_.stripPrefix("`").stripSuffix("`"))
            val values = parenList(body.substring(vIdx + 6))
            require(cols.length == values.length,
              s"MERGE: ${cols.length} insert columns vs ${values.length} values")
            notMatched = Some(InsertAction(Some((cols, values))))
          }
        case other =>
          throw new IllegalArgumentException(s"MERGE: cannot parse clause '$other'")
      }
      require(matched.nonEmpty || notMatched.nonEmpty,
        "MERGE: needs WHEN MATCHED and/or WHEN NOT MATCHED")
      Some(MergeSpec(table, tableAlias, sourceSql, sourceAlias, cond, matched, notMatched))
    case _ => None
  }
}
