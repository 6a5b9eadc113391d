package graft.labels

import scala.util.matching.Regex

/** Label metadata model + selector grammar.
  *
  * Semantics follow the reference
  * (`/root/reference/broker/protocol/label_extensions.go`):
  *  - a LabelSet is an ordered set of (name, value) pairs; a name may
  *    carry multiple values (`label_extensions.go:60-120`)
  *  - a LabelSelector has include/exclude sets; empty selector value is
  *    an existence test; `name:prefix` matches on value prefix; values
  *    in parentheses are IN lists (`label_extensions.go:246-340`)
  *  - grammar: `foo=bar, baz in (a,b), !absent, name:prefix=x,
  *    env notin (...)`, invariant to reasonable spacing
  *    (`label_extensions.go:420-501`)
  *
  * In the Spark engine, label selectors resolve journals/tables at plan
  * time (partition pruning over catalog metadata) and compile to Column
  * predicates over label-bearing DataFrames via [[LabelSelector.toSqlPredicate]].
  */
final case class Label(name: String, value: String, prefix: Boolean = false)

final case class LabelSet(labels: Vector[Label]) {
  /** Sorted, de-duplicated (name, value) view. */
  lazy val sorted: Vector[Label] =
    labels.distinct.sortBy(l => (l.name, l.value))

  lazy val byName: Map[String, Vector[String]] =
    labels.groupBy(_.name).map { case (n, ls) => n -> ls.map(_.value).sorted }

  def valueOf(name: String): Option[String] = byName.get(name).flatMap(_.headOption)
  def add(name: String, value: String): LabelSet =
    LabelSet(labels :+ Label(name, value))
}

object LabelSet {
  val empty: LabelSet = LabelSet(Vector.empty)
  /** Convenience: LabelSet("name", "value", ...). A "name:prefix" name
    * yields a prefix-match label (selector context only).
    */
  def apply(nv: String*): LabelSet = {
    require(nv.length % 2 == 0, "expect Name/Value pairs")
    LabelSet(nv.grouped(2).map { p =>
      val prefix = p(0).endsWith(":prefix")
      Label(if (prefix) p(0).dropRight(":prefix".length) else p(0), p(1), prefix)
    }.toVector)
  }
}

final case class LabelSelector(include: LabelSet, exclude: LabelSet) {

  /** True iff no excluded label matches and every included name group
    * matches (label_extensions.go:246-253).
    */
  def matches(set: LabelSet): Boolean =
    !anyGroupMatches(exclude, set) && allGroupsMatch(include, set)

  private def groupMatches(vals: Vector[Label], set: LabelSet): Boolean =
    set.byName.get(vals.head.name) match {
      case None => false
      case Some(setVals) =>
        vals.exists { l =>
          l.value.isEmpty ||
            (if (l.prefix) setVals.exists(_.startsWith(l.value))
             else setVals.contains(l.value))
        }
    }

  private def groups(s: LabelSet): Iterable[Vector[Label]] =
    s.labels.groupBy(l => (l.name, l.prefix)).values

  private def anyGroupMatches(s: LabelSet, set: LabelSet): Boolean =
    groups(s).exists(g => groupMatches(g, set))
  private def allGroupsMatch(s: LabelSet, set: LabelSet): Boolean =
    groups(s).forall(g => groupMatches(g, set))

  /** Compile to an ANSI-SQL predicate over a row whose columns carry the
    * label values named by `colOf` (engine-side pushdown of selectors
    * into Catalyst filters; columns are assumed non-null single-valued
    * labels). Existence tests become IS NOT NULL.
    */
  def toSqlPredicate(colOf: String => String): String = {
    def lit(v: String) = "'" + v.replace("'", "''") + "'"
    // The selector value charset allows '%' and '_' (pathSymbols), and
    // both are LIKE metacharacters: unescaped, "name:prefix=a_b" would
    // compile to LIKE 'a_b%' where '_' matches ANY character —
    // diverging from the matcher's literal startsWith ('aXb…' wrongly
    // kept). '!' is outside the value charset, making it a collision-
    // free ESCAPE character (still doubled defensively).
    def likeEsc(v: String) =
      v.replace("!", "!!").replace("%", "!%").replace("_", "!_")
    def one(l: Label, negate: Boolean): String = {
      val c = colOf(l.name)
      if (l.value.isEmpty) s"$c IS ${if (negate) "" else "NOT "}NULL"
      else if (l.prefix) {
        val p = s"$c LIKE ${lit(likeEsc(l.value) + "%")} ESCAPE '!'"
        // Negated terms must keep NULL rows: an absent label is
        // not-excluded (matcher + RewriteMatchesSelector semantics),
        // but bare NOT(...)/<> evaluates to NULL and drops the row.
        if (negate) s"($c IS NULL OR NOT ($p))" else p
      } else if (negate) s"($c IS NULL OR $c <> ${lit(l.value)})"
      else s"$c = ${lit(l.value)}"
    }
    def group(g: Vector[Label], negate: Boolean): String =
      g.map(one(_, negate)).mkString("(", if (negate) " AND " else " OR ", ")")
    val inc = groups(include).map(group(_, negate = false))
    // Exclusion: NOT (any value matches); absent name is not excluded.
    val exc = groups(exclude).map { g =>
      if (g.head.value.isEmpty && g.size == 1)
        s"(${colOf(g.head.name)} IS NULL)"
      else group(g, negate = true)
    }
    val all = inc ++ exc
    if (all.isEmpty) "TRUE" else all.mkString(" AND ")
  }
}

object LabelSelector {
  val empty: LabelSelector = LabelSelector(LabelSet.empty, LabelSet.empty)

  // Grammar regexes mirror label_extensions.go:489-501.
  private val tokenSymbols = Regex.quote("-_+/.")
  private val pathSymbols = Regex.quote("-_+/.=%")
  private val reToken = s""" ?([\\p{L}\\p{N}$tokenSymbols]{2,}(?::prefix)?)"""
  private val rePath = s""" ?([\\p{L}\\p{N}$pathSymbols]*)"""
  private val reCommaOrEnd = """ ?(?:,|$)"""
  private val reParen = """ ?\(([^)]+)\)"""

  private val reEqual = s"^$reToken ?=?=$rePath$reCommaOrEnd".r
  private val reNotEqual = s"^$reToken ?!=$rePath$reCommaOrEnd".r
  private val reSetIn = s"^$reToken in$reParen$reCommaOrEnd".r
  private val reSetNotIn = s"^$reToken not ?in$reParen$reCommaOrEnd".r
  private val reSetExists = s"^$reToken$reCommaOrEnd".r
  private val reSetNotExists = s"^ ?!$reToken$reCommaOrEnd".r
  private val reSetValue = s"^$rePath$reCommaOrEnd".r

  private def mkLabel(rawName: String, value: String): Label = {
    val prefix = rawName.endsWith(":prefix")
    Label(if (prefix) rawName.dropRight(":prefix".length) else rawName,
      value, prefix)
  }

  /** Parse the selector grammar; Left(error) on failure. */
  def parse(input: String): Either[String, LabelSelector] = {
    var s = input
    var inc = Vector.empty[Label]
    var exc = Vector.empty[Label]

    def setParts(name: String, body: String): Either[String, Vector[Label]] = {
      var rest = body
      var out = Vector.empty[Label]
      while (rest.nonEmpty) {
        reSetValue.findFirstMatchIn(rest) match {
          case Some(m) if m.end > 0 =>
            out :+= mkLabel(name, m.group(1))
            rest = rest.substring(m.end)
          case _ =>
            return Left(s"could not match '$rest' to a label selector set expression")
        }
      }
      Right(out)
    }

    while (s.nonEmpty) {
      val step: Either[String, Int] =
        reEqual.findFirstMatchIn(s).map { m =>
          inc :+= mkLabel(m.group(1), m.group(2)); Right(m.end)
        }.orElse(reNotEqual.findFirstMatchIn(s).map { m =>
          exc :+= mkLabel(m.group(1), m.group(2)); Right(m.end)
        }).orElse(reSetIn.findFirstMatchIn(s).map { m =>
          setParts(m.group(1), m.group(2)).map { ls => inc ++= ls; m.end }
        }).orElse(reSetNotIn.findFirstMatchIn(s).map { m =>
          setParts(m.group(1), m.group(2)).map { ls => exc ++= ls; m.end }
        }).orElse(reSetNotExists.findFirstMatchIn(s).map { m =>
          exc :+= mkLabel(m.group(1), ""); Right(m.end)
        }).orElse(reSetExists.findFirstMatchIn(s).map { m =>
          inc :+= mkLabel(m.group(1), ""); Right(m.end)
        }).getOrElse(
          Left(s"could not match '$s' to a label selector expression"))

      step match {
        case Left(err) => return Left(err)
        case Right(n) => s = s.substring(n)
      }
    }
    Right(LabelSelector(LabelSet(inc), LabelSet(exc)))
  }

  def mustParse(s: String): LabelSelector =
    parse(s).fold(e => throw new IllegalArgumentException(e), identity)
}
