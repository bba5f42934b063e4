package graft.adt

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface for the ADT layer — the reference engine's user-facing
  * grammar (user-defined sum types + pattern matching *in SQL*),
  * re-expressed as a source-to-source rewrite onto plain Spark SQL over the
  * `Adt` struct encoding (`STRUCT(tag, <variant payloads>)`).
  *
  * Grammar accepted on top of Spark SQL:
  * {{{
  *   CREATE TYPE OrderState = Open(priority STRING) | Shipped(d TIMESTAMP) | Returned
  *   OrderState.Open(o_orderpriority)        -- constructor, full ADT value
  *   MATCH (state)
  *     WHEN Open(p)    THEN 'open:' || p     -- binders are positional
  *     WHEN Shipped(d) THEN year(d)
  *     WHEN Returned   THEN 'returned'
  *   [ELSE expr] END
  * }}}
  *
  * Everything lowers to `named_struct` / `CASE WHEN` BEFORE parsing, so ADT
  * queries are ordinary Catalyst plans: optimized, codegen'd, and columnar
  * at rest exactly like the `Adt` combinator API (which produces the same
  * encoding — the two surfaces interoperate on the same columns).
  *
  * Typechecking happens at rewrite time, mirroring the reference's
  * typechecked SQL: unknown variants, wrong constructor/binder arity,
  * ambiguous or non-exhaustive matches are REJECTED with a compile-style
  * error before anything executes.
  *
  * Wiring: `GraftExtensions.injectParser` routes every `spark.sql` text
  * through [[rewrite]] (sessions built `withExtensions`, e.g. `graft.Sql`);
  * [[sql]] is the same path callable on any session.
  */
object AdtSql {

  /** One variant: constructor tag + named, Spark-DDL-typed payload fields.
    * In a parametric type's template the field-type text may reference the
    * type parameters by name; [[TypeDef.instantiate]] substitutes them. */
  final case class VariantDef(tag: String, fields: Seq[(String, String)]) {
    def fieldName: String = tag.toLowerCase
    /** DDL of the payload struct (payload-less variants carry `present`
      * so the parquet group is non-empty — same rule as `Adt.Variant`). */
    def structDdl: String =
      if (fields.isEmpty) "STRUCT<present: BOOLEAN>"
      else fields.map { case (n, t) => s"$n: $t" }.mkString("STRUCT<", ", ", ">")
  }

  /** `params` non-empty makes this a GENERIC template (`CREATE TYPE
    * Maybe<T> = Just(value T) | Nothing`): constructors must instantiate it
    * with concrete Spark-DDL type arguments (`Maybe<BIGINT>.Just(x)`),
    * while MATCH needs no instantiation at all — pattern lowering only
    * reads tags and payload accessors, which are parameter-independent. */
  final case class TypeDef(name: String, variants: Seq[VariantDef],
                           params: Seq[String] = Nil) {
    def variant(tag: String): Option[VariantDef] =
      variants.find(_.tag.equalsIgnoreCase(tag))

    /** Monomorphize: substitute each parameter word (case-insensitive,
      * whole-word so `T` never rewrites `TIMESTAMP`) with its concrete
      * type argument inside every field-type text. */
    def instantiate(typeArgs: Seq[String]): TypeDef = {
      if (typeArgs.length != params.length)
        fail(s"type $name takes ${params.length} type argument(s) " +
          s"<${params.mkString(", ")}>, got ${typeArgs.length}")
      val sub = params.map(_.toLowerCase).zip(typeArgs.map(_.trim)).toMap
      val word = "[A-Za-z_][A-Za-z_0-9]*".r
      def apply(t: String): String =
        word.replaceAllIn(t, m => java.util.regex.Matcher.quoteReplacement(
          sub.getOrElse(m.matched.toLowerCase, m.matched)))
      val mono = copy(
        name = s"$name<${typeArgs.mkString(", ")}>",
        variants = variants.map(v => v.copy(fields = v.fields.map {
          case (fn, ft) => fn -> apply(ft)
        })),
        params = Nil)
      // validate the substituted DDL eagerly — a bad type argument fails
      // at the constructor site with the instantiated type named
      mono.variants.foreach(_.fields.foreach { case (fn, ft) =>
        try org.apache.spark.sql.types.DataType.fromDDL(ft)
        catch { case e: Exception =>
          fail(s"${mono.name}: field $fn has bad instantiated type '$ft': ${e.getMessage}")
        }
      })
      mono
    }
  }

  /** Session-scoped type catalog (the reference's CREATE TYPE registers in
    * its database catalog; here types live for the SparkSession). */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), TypeDef]()

  def types(spark: SparkSession): Seq[TypeDef] = {
    registry.keySet.removeIf(_._1.sparkContext.isStopped)
    import scala.jdk.CollectionConverters._
    registry.asScala.collect { case ((s, _), td) if s eq spark => td }.toSeq
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ADT type error: $msg")

  // ---------------------------------------------------------------- lexer

  /** Minimal SQL lexer: word tokens (identifiers/keywords/numbers) with
    * positions; string literals, quoted identifiers and comments are opaque
    * spans so rewrites never touch their contents.
    */
  private sealed trait Tok { def start: Int; def end: Int }
  private final case class Word(start: Int, end: Int, text: String) extends Tok
  private final case class Punct(start: Int, end: Int, ch: Char) extends Tok
  private final case class Opaque(start: Int, end: Int) extends Tok

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"' || c == '`') {
        val start = i; i += 1
        var done = false
        while (i < n && !done) {
          // backslash escape (Spark default string literals) — backticked
          // identifiers only use doubling
          if (s(i) == '\\' && c != '`' && i + 1 < n) i += 2
          else if (s(i) == c) { if (i + 1 < n && s(i + 1) == c) i += 2 else { i += 1; done = true } }
          else i += 1
        }
        out += Opaque(start, i)
      } else if (c == '-' && i + 1 < n && s(i + 1) == '-') {
        val start = i
        while (i < n && s(i) != '\n') i += 1
        out += Opaque(start, i)
      } else if (c == '/' && i + 1 < n && s(i + 1) == '*') {
        val start = i; i += 2
        while (i + 1 < n && !(s(i) == '*' && s(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
        out += Opaque(start, i)
      } else if (c.isLetter || c == '_' || c.isDigit) {
        val start = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Word(start, i, s.substring(start, i))
      } else {
        out += Punct(i, i + 1, c); i += 1
      }
    }
    out.result()
  }

  /** Index (in `toks`) just past the ')' matching the '(' at `open`. */
  private def closeParen(toks: Vector[Tok], open: Int): Int = {
    var depth = 0
    var j = open
    while (j < toks.length) {
      toks(j) match {
        case Punct(_, _, '(') => depth += 1
        case Punct(_, _, ')') =>
          depth -= 1
          if (depth == 0) return j + 1
        case _ =>
      }
      j += 1
    }
    fail("unbalanced parentheses")
  }

  private def isWord(t: Tok, up: String): Boolean = t match {
    case Word(_, _, w) => w.equalsIgnoreCase(up)
    case _ => false
  }

  // ------------------------------------------------------------ CREATE TYPE

  private val CreateType =
    """(?is)^\s*CREATE\s+TYPE\s+([A-Za-z_][A-Za-z_0-9]*)\s*(?:<\s*([A-Za-z_][A-Za-z_0-9]*(?:\s*,\s*[A-Za-z_][A-Za-z_0-9]*)*)\s*>)?\s*=\s*(.+?)\s*;?\s*$""".r

  /** Does this statement declare a type? (If so, [[sql]]/the injected parser
    * registers it instead of delegating the text to Spark.) */
  def isCreateType(text: String): Boolean = CreateType.matches(text)

  /** The declared type name, if the statement is a CREATE TYPE. */
  def createTypeName(text: String): Option[String] = text match {
    case CreateType(name, _, _) => Some(name)
    case _ => None
  }

  /** `TEXT` is the reference's string type name; everything else must be
    * Spark DDL, validated eagerly so a bad CREATE TYPE fails at declaration
    * (not first use). In a generic template, type-parameter words are
    * stand-ins: validation substitutes STRING for each parameter (any
    * parameter admits any concrete type, so one witness suffices) and the
    * raw text — parameters included — is what the template stores. */
  private def normType(t: String, params: Seq[String]): String = {
    val norm = if (t.trim.equalsIgnoreCase("text")) "STRING" else t.trim
    val probe =
      if (params.isEmpty) norm
      else {
        val ps = params.map(_.toLowerCase).toSet
        "[A-Za-z_][A-Za-z_0-9]*".r.replaceAllIn(norm,
          m => if (ps.contains(m.matched.toLowerCase)) "STRING" else m.matched)
      }
    try org.apache.spark.sql.types.DataType.fromDDL(probe)
    catch { case e: Exception => fail(s"bad field type '$t': ${e.getMessage}") }
    norm
  }

  /** Parse + register a CREATE TYPE statement; returns the TypeDef. */
  def createType(spark: SparkSession, text: String): TypeDef = text match {
    case CreateType(name, paramsTxt, body) =>
      val params: Seq[String] =
        if (paramsTxt == null) Nil
        else paramsTxt.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      if (params.map(_.toLowerCase).distinct.length != params.length)
        fail(s"duplicate type parameters in type $name<${params.mkString(", ")}>")
      // split variants on top-level '|' (parens may nest DECIMAL(10,2) etc)
      val parts = {
        val b = Seq.newBuilder[String]
        var depth = 0; var last = 0
        for (i <- body.indices) body(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case '|' if depth == 0 => b += body.substring(last, i); last = i + 1
          case _ =>
        }
        b += body.substring(last)
        b.result().map(_.trim)
      }
      val VariantRe = """(?s)^([A-Za-z_][A-Za-z_0-9]*)\s*(?:\((.*)\))?$""".r
      val variants = parts.map {
        case VariantRe(tag, null) => VariantDef(tag, Nil)
        case VariantRe(tag, fieldsTxt) =>
          // split fields on commas at zero ()/<> depth — DECIMAL(10,2),
          // MAP<STRING, BIGINT> and friends keep their inner commas
          val fieldParts = {
            val b = Seq.newBuilder[String]
            var depth = 0; var last = 0
            for (i <- fieldsTxt.indices) fieldsTxt(i) match {
              case '(' | '<' => depth += 1
              case ')' | '>' => depth -= 1
              case ',' if depth == 0 => b += fieldsTxt.substring(last, i); last = i + 1
              case _ =>
            }
            b += fieldsTxt.substring(last)
            b.result().map(_.trim).filter(_.nonEmpty)
          }
          val fields = fieldParts.map { f =>
            f.split("\\s+", 2) match {
              case Array(fn, ft) => fn -> normType(ft, params)
              case _ => fail(s"variant $tag: field '$f' needs '<name> <type>'")
            }
          }
          if (fields.isEmpty) fail(s"variant $tag: empty payload list — drop the parens instead")
          VariantDef(tag, fields)
        case other => fail(s"cannot parse variant '$other'")
      }
      val tags = variants.map(_.tag.toLowerCase)
      if (tags.distinct != tags) fail(s"duplicate variant tags in type $name")
      if (tags.contains("tag")) fail(s"variant name 'tag' collides with the discriminator field")
      if (params.nonEmpty && variants.forall(_.fields.forall { case (_, ft) =>
            !lex(ft).exists { case Word(_, _, w) =>
              params.exists(_.equalsIgnoreCase(w)); case _ => false }
          }))
        fail(s"type $name<${params.mkString(", ")}> declares parameters " +
          "but no field uses them — drop the parameter list")
      val td = TypeDef(name, variants, params)
      registry.keySet.removeIf(_._1.sparkContext.isStopped)
      registry.put((spark, name.toLowerCase), td) // CREATE OR REPLACE semantics
      td
    case _ => fail(s"not a CREATE TYPE statement: $text")
  }

  // ---------------------------------------------------------- constructors

  /** The full-ADT `named_struct` literal text for one constructor call. */
  private def constructorSql(td: TypeDef, v: VariantDef, args: Seq[String]): String = {
    if (args.length != v.fields.length)
      fail(s"${td.name}.${v.tag} takes ${v.fields.length} argument(s), got ${args.length}")
    val payloads = td.variants.map { w =>
      val value =
        if (w.tag != v.tag) s"CAST(NULL AS ${w.structDdl})"
        else if (w.fields.isEmpty) "named_struct('present', true)"
        else w.fields.zip(args).map { case ((fn, ft), a) =>
          s"'$fn', CAST(($a) AS $ft)"
        }.mkString("named_struct(", ", ", ")")
      s"'${w.fieldName}', $value"
    }
    (s"'tag', '${v.tag}'" +: payloads).mkString("named_struct(", ", ", ")")
  }

  /** Split a constructor-call argument token span on top-level commas. */
  private def splitArgs(text: String, inner: Vector[Tok]): Seq[String] =
    if (inner.isEmpty) Seq.empty[String]
    else {
      val b = Seq.newBuilder[String]
      var depth = 0
      var segStart = inner.head.start
      for (t <- inner) t match {
        case Punct(p, _, ',') if depth == 0 =>
          b += text.substring(segStart, p); segStart = p + 1
        case Punct(_, _, '(') => depth += 1
        case Punct(_, _, ')') => depth -= 1
        case _ =>
      }
      b += text.substring(segStart, inner.last.end)
      b.result().map(_.trim)
    }

  /** Index (in `toks`) just past the '>' matching the '<' at `open`, or
    * -1 if none closes it (then the '<' was a comparison, not type
    * arguments). Only '<'/'>' adjust depth — type-argument DDL contains
    * no comparison operators, and parens (DECIMAL(10,2)) pass through
    * untouched. */
  private def closeAngle(toks: Vector[Tok], open: Int): Int = {
    var depth = 0
    var j = open
    while (j < toks.length) {
      toks(j) match {
        case Punct(_, _, '<') => depth += 1
        case Punct(_, _, '>') =>
          depth -= 1
          if (depth == 0) return j + 1
        case _ =>
      }
      j += 1
    }
    -1
  }

  /** Rewrite the FIRST `TypeName.Variant(args)` or
    * `TypeName<TypeArgs>.Variant(args)` call; None if there is none. A
    * generic template instantiates at each constructor site (the
    * turbofish discipline: the writer names the payload type, nothing is
    * inferred), and distinct instantiations coexist freely — each call
    * emits its own concrete struct DDL. */
  private def rewriteOneConstructor(spark: SparkSession, text: String): Option[String] = {
    val toks = lex(text)
    var j = 0
    // --- generic form: Word '<' … '>' '.' Word '('
    while (j + 1 < toks.length) {
      (toks(j), toks(j + 1)) match {
        case (Word(s0, _, tn), Punct(_, _, '<')) =>
          val td = registry.get((spark, tn.toLowerCase))
          val gEnd = if (td != null && td.params.nonEmpty) closeAngle(toks, j + 1) else -1
          if (gEnd > 0) {
            (toks.lift(gEnd), toks.lift(gEnd + 1), toks.lift(gEnd + 2)) match {
              case (Some(Punct(_, _, '.')), Some(Word(_, _, vt)), Some(Punct(_, _, '('))) =>
                // split type args on commas at zero <>/() depth
                val inner = toks.slice(j + 2, gEnd - 1)
                val typeArgs = {
                  if (inner.isEmpty) fail(s"type ${td.name} needs type arguments")
                  val b = Seq.newBuilder[String]
                  var depth = 0
                  var segStart = inner.head.start
                  for (t <- inner) t match {
                    case Punct(p, _, ',') if depth == 0 =>
                      b += text.substring(segStart, p); segStart = p + 1
                    case Punct(_, _, '(') | Punct(_, _, '<') => depth += 1
                    case Punct(_, _, ')') | Punct(_, _, '>') => depth -= 1
                    case _ =>
                  }
                  b += text.substring(segStart, inner.last.end)
                  b.result().map(_.trim)
                }
                val mono = td.instantiate(typeArgs)
                val v = mono.variant(vt).getOrElse(
                  fail(s"type ${mono.name} has no variant $vt (has: ${mono.variants.map(_.tag).mkString(", ")})"))
                val close = closeParen(toks, gEnd + 2)
                val argToks = toks.slice(gEnd + 3, close - 1)
                val args = splitArgs(text, argToks)
                val repl = constructorSql(mono, v, args)
                return Some(text.substring(0, s0) + repl + text.substring(toks(close - 1).end))
              case _ => // a '<' comparison against a column named like the type
            }
          }
        case _ =>
      }
      j += 1
    }
    j = 0
    while (j + 3 < toks.length) {
      (toks(j), toks(j + 1), toks(j + 2), toks(j + 3)) match {
        case (Word(s0, _, tn), Punct(_, _, '.'), Word(_, _, vt), Punct(_, _, '(')) =>
          val td = registry.get((spark, tn.toLowerCase))
          if (td != null && td.params.nonEmpty)
            fail(s"type ${td.name} is generic over <${td.params.mkString(", ")}> — " +
              s"instantiate the constructor: ${td.name}<…>.$vt(…)")
          if (td != null) {
            val v = td.variant(vt).getOrElse(
              fail(s"type ${td.name} has no variant $vt (has: ${td.variants.map(_.tag).mkString(", ")})"))
            val close = closeParen(toks, j + 3)
            val args = splitArgs(text, toks.slice(j + 4, close - 1))
            val repl = constructorSql(td, v, args)
            return Some(text.substring(0, s0) + repl + text.substring(toks(close - 1).end))
          }
        case _ =>
      }
      j += 1
    }
    None
  }

  // ----------------------------------------------------------------- MATCH

  private final case class Arm(tag: String, binders: Seq[String], body: String)

  /** Rewrite the FIRST (leftmost) `MATCH (subj) WHEN … END`; None if absent.
    * Nested MATCH/CASE inside arm bodies are tracked as opaque END-blocks
    * and rewritten on later fixpoint passes.
    */
  private def rewriteOneMatch(spark: SparkSession, text: String): Option[String] = {
    val toks = lex(text)
    var m = toks.indexWhere(isWord(_, "MATCH"))
    while (m >= 0) {
      if (m + 1 < toks.length && toks(m + 1) == Punct(toks(m + 1).start, toks(m + 1).end, '(')) {
        val subjEnd = closeParen(toks, m + 1)
        val subj = text.substring(toks(m + 1).start, toks(subjEnd - 1).end)
        // scan arms at top level: WHEN Tag[(b,…)] THEN body … [ELSE body] END
        var j = subjEnd
        var parenDepth = 0
        var blockDepth = 0 // CASE/MATCH … END nesting inside bodies
        val arms = Seq.newBuilder[Arm]
        var elseBody: Option[String] = None
        var curTag: String = null
        var curBinders: Seq[String] = Nil
        var bodyStart = -1
        var inElse = false
        def flush(endPos: Int): Unit = {
          if (bodyStart < 0) fail("MATCH arm without THEN body")
          val body = text.substring(bodyStart, endPos).trim
          if (body.isEmpty) fail("empty MATCH arm body")
          if (inElse) elseBody = Some(body) else arms += Arm(curTag, curBinders, body)
          bodyStart = -1
        }
        while (j < toks.length) {
          toks(j) match {
            case Punct(_, _, '(') => parenDepth += 1; j += 1
            case Punct(_, _, ')') => parenDepth -= 1; j += 1
            case w: Word if parenDepth == 0 && (isWord(w, "CASE") || isWord(w, "MATCH")) =>
              blockDepth += 1; j += 1
            case w: Word if parenDepth == 0 && blockDepth > 0 && isWord(w, "END") =>
              blockDepth -= 1; j += 1
            case w: Word if parenDepth == 0 && blockDepth == 0 &&
                (isWord(w, "WHEN") || isWord(w, "ELSE") || isWord(w, "END")) =>
              if (bodyStart >= 0) flush(w.start)
              else if (curTag != null || inElse) fail("MATCH arm without THEN")
              if (isWord(w, "END")) {
                // resolve + emit
                val armList = arms.result()
                if (armList.isEmpty) fail("MATCH needs at least one WHEN arm")
                return Some(
                  text.substring(0, toks(m).start) +
                    lowerMatch(spark, subj, armList, elseBody) +
                    text.substring(w.end))
              } else if (isWord(w, "ELSE")) {
                inElse = true; curTag = null
                j += 1
                bodyStart = if (j < toks.length) toks(j).start else fail("ELSE without body")
              } else { // WHEN Tag [( binders )] THEN
                inElse = false
                j += 1
                curTag = toks.lift(j) match {
                  case Some(Word(_, _, t)) => t
                  case _ => fail("WHEN must name a variant")
                }
                j += 1
                curBinders = Nil
                if (j < toks.length && toks(j).isInstanceOf[Punct] &&
                    toks(j).asInstanceOf[Punct].ch == '(') {
                  val bEnd = closeParen(toks, j)
                  curBinders = toks.slice(j + 1, bEnd - 1).collect {
                    case Word(_, _, b) => b
                    case Punct(_, _, ',') => null
                    case t => fail(s"binder list may only contain names: '${text.substring(t.start, t.end)}'")
                  }.filter(_ != null).toSeq
                  j = bEnd
                }
                if (!(j < toks.length && isWord(toks(j), "THEN")))
                  fail(s"expected THEN after WHEN $curTag")
                j += 1
                bodyStart = if (j < toks.length) toks(j).start else fail("THEN without body")
              }
            case _ => j += 1
          }
        }
        fail("MATCH without closing END")
      }
      m = toks.indexWhere(isWord(_, "MATCH"), m + 1)
    }
    None
  }

  /** Type-resolve the arms against the session catalog and emit the CASE.
    *
    * The subject text is interpolated into each arm's tag test and payload
    * accessor; Catalyst's subexpression elimination collapses the duplicate
    * evaluations of a deterministic subject inside codegen, but a
    * NON-deterministic subject would be genuinely re-evaluated — tag test
    * and payload could disagree — so those are rejected here.
    */
  private val NonDeterministicFns =
    Seq("rand", "randn", "random", "uuid", "shuffle", "monotonically_increasing_id")
  private def lowerMatch(spark: SparkSession, subj: String,
                         arms: Seq[Arm], elseBody: Option[String]): String = {
    val subjWords = lex(subj).collect { case Word(_, _, w) => w.toLowerCase }.toSet
    val nd = NonDeterministicFns.filter(subjWords.contains)
    if (nd.nonEmpty) fail(
      s"MATCH subject must be deterministic (found ${nd.mkString(", ")}): " +
      "its text is evaluated per arm, so a random subject could match one " +
      "arm's tag and read another's payload — bind it in a subquery first")
    val sessionTypes = types(spark)
    if (sessionTypes.isEmpty) fail("no types declared — CREATE TYPE first")
    val candidates = sessionTypes.filter(td => arms.forall(a => td.variant(a.tag).isDefined))
    val td = candidates match {
      case Seq(one) => one
      case Seq() => fail(
        s"no declared type has variants {${arms.map(_.tag).mkString(", ")}} " +
        s"(declared: ${sessionTypes.map(t => t.name + " = " + t.variants.map(_.tag).mkString(" | ")).mkString("; ")})")
      case many => fail(s"ambiguous MATCH: variants fit ${many.map(_.name).mkString(" and ")}")
    }
    val seen = arms.map(_.tag.toLowerCase)
    if (seen.distinct != seen) fail(s"duplicate MATCH arm in {${arms.map(_.tag).mkString(", ")}}")
    if (elseBody.isEmpty) {
      val missing = td.variants.map(_.tag).filterNot(t => seen.contains(t.toLowerCase))
      if (missing.nonEmpty) fail(
        s"non-exhaustive MATCH on ${td.name}: missing ${missing.mkString(", ")} (add arms or ELSE)")
    }
    val cases = arms.map { a =>
      val v = td.variant(a.tag).get
      if (a.binders.length != v.fields.length) fail(
        s"${td.name}.${v.tag} has ${v.fields.length} payload field(s), pattern binds ${a.binders.length}")
      // positional binder → payload field accessor, substituted word-wise
      // (opaque string literals are never touched; a binder shadows any
      // same-named column inside its own arm, as in the reference). A word
      // preceded by '.' is a qualified/field reference and one followed by
      // '(' is a function-call head — neither is a binder occurrence.
      val sub = a.binders.zip(v.fields).map { case (b, (fn, _)) =>
        b.toLowerCase -> s"($subj).${v.fieldName}.$fn"
      }.toMap
      val body =
        if (sub.isEmpty) a.body
        else {
          val bts = lex(a.body)
          def isPunct(idx: Int, c: Char): Boolean = bts.lift(idx).exists {
            case Punct(_, _, p) => p == c
            case _ => false
          }
          val sb = new StringBuilder
          var pos = 0
          for (idx <- bts.indices) bts(idx) match {
            case Word(s0, e0, wtx) if sub.contains(wtx.toLowerCase) &&
                !isPunct(idx - 1, '.') && !isPunct(idx + 1, '(') =>
              sb.append(a.body.substring(pos, s0)).append(sub(wtx.toLowerCase)); pos = e0
            case _ =>
          }
          sb.append(a.body.substring(pos)).toString
        }
      s"WHEN ($subj).tag = '${v.tag}' THEN $body"
    }
    (Seq("CASE") ++ cases ++ elseBody.map(b => s"ELSE $b").toSeq ++ Seq("END")).mkString(" ")
  }

  // ------------------------------------------------------------ public API

  /** Lower all ADT syntax in a query text to plain Spark SQL (identity for
    * text using no ADT constructs). Fixpoint over constructor and MATCH
    * rewrites so nested uses resolve inside-out.
    */
  def rewrite(spark: SparkSession, text: String): String = {
    var cur = text
    var changed = true
    var rounds = 0
    while (changed) {
      changed = false
      rewriteOneConstructor(spark, cur).foreach { t => cur = t; changed = true }
      rewriteOneMatch(spark, cur).foreach { t => cur = t; changed = true }
      rounds += 1
      if (rounds > 200) fail("ADT rewrite did not terminate (malformed nesting?)")
    }
    cur
  }

  /** Run one statement with the ADT grammar enabled — CREATE TYPE registers
    * and returns a one-row acknowledgement; anything else is rewritten and
    * handed to `spark.sql`. Sessions built with `GraftExtensions` get this
    * transparently inside plain `spark.sql`.
    */
  def sql(spark: SparkSession, text: String): DataFrame =
    if (isCreateType(text)) {
      val td = createType(spark, text)
      spark.sql(s"SELECT '${td.name}' AS type_created")
    } else spark.sql(rewrite(spark, text))
}
