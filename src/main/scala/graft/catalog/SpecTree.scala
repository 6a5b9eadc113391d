package graft.catalog

import graft.labels.{Label, LabelSet}

/** Hierarchical journal-spec trees and the spec inheritance algebra
  * (SURVEY §2.12): flat catalog listings fold into a minimally-described
  * tree whose directory nodes carry configuration shared by their
  * children (`broker/journalspace/node.go:21-266`), using per-field
  * union/intersect/subtract over partial specs
  * (`broker/protocol/journal_spec_extensions.go:321-435`) and per-name
  * label-group algebra (`broker/protocol/label_extensions.go:178-233`).
  *
  * This is driver-side catalog tooling — trees are edited (YAML-style)
  * by operators, then flattened back to fully-specified specs for the
  * catalog's Apply path. Nothing here touches the data plane.
  */
object SpecAlgebra {

  private def groups(s: LabelSet): Vector[(String, Vector[Label])] =
    s.labels.groupBy(_.name).toVector.sortBy(_._1)

  private def rebuild(gs: Iterable[Vector[Label]]): LabelSet =
    LabelSet(gs.toVector.flatten.sortBy(l => (l.name, l.value)))

  /** Labels of `a`, plus groups of `b` whose name is absent from `a`
    * (per-name groups; `a`'s values win on conflict).
    */
  def unionLabels(a: LabelSet, b: LabelSet): LabelSet = {
    val an = a.labels.map(_.name).toSet
    rebuild(groups(a).map(_._2) ++ groups(b).collect { case (n, g) if !an(n) => g })
  }

  /** Label groups present in both sets with identical value lists. */
  def intersectLabels(a: LabelSet, b: LabelSet): LabelSet = {
    val bg = groups(b).toMap
    rebuild(groups(a).collect {
      case (n, g) if bg.get(n).exists(_.map(_.value) == g.map(_.value)) => g
    })
  }

  /** Label groups of `a` not present in `b` with identical values. */
  def subtractLabels(a: LabelSet, b: LabelSet): LabelSet = {
    val bg = groups(b).toMap
    rebuild(groups(a).collect {
      case (n, g) if !bg.get(n).exists(_.map(_.value) == g.map(_.value)) => g
    })
  }
}

/** A partial JournalSpec: zero-valued fields mean "unspecified, inherit"
  * (the reference's zero-value convention). `flags`: 0 unspecified,
  * else an O_RDONLY/O_WRONLY/O_RDWR-style gate.
  */
final case class SpecPatch(
    labels: LabelSet = LabelSet.empty,
    replication: Int = 0,
    fragmentTargetLength: Long = 0L,
    codec: String = "",
    flags: Int = 0,
    // Empty = unspecified/inherit. Without this field a fromCatalog →
    // applyTo round trip would wipe every journal's fragment stores
    // (toSpec used to emit Vector.empty unconditionally).
    stores: Vector[String] = Vector.empty,
    // -1 = unspecified/inherit (0 is a MEANINGFUL value for both:
    // retain-forever / unlimited), so the stores wipe hazard above
    // applies to these too.
    retentionMs: Long = -1L,
    maxAppendRate: Long = -1L,
    flushIntervalMs: Long = -1L) {

  /** Fields of `this`, falling back to `b` where unspecified (UnionJournalSpecs). */
  def union(b: SpecPatch): SpecPatch = SpecPatch(
    labels = SpecAlgebra.unionLabels(labels, b.labels),
    replication = if (replication == 0) b.replication else replication,
    fragmentTargetLength =
      if (fragmentTargetLength == 0L) b.fragmentTargetLength else fragmentTargetLength,
    codec = if (codec.isEmpty) b.codec else codec,
    flags = if (flags == 0) b.flags else flags,
    stores = if (stores.isEmpty) b.stores else stores,
    retentionMs = if (retentionMs < 0L) b.retentionMs else retentionMs,
    maxAppendRate = if (maxAppendRate < 0L) b.maxAppendRate else maxAppendRate,
    flushIntervalMs = if (flushIntervalMs < 0L) b.flushIntervalMs else flushIntervalMs)

  /** Fields shared by both patches; others zeroed (IntersectJournalSpecs). */
  def intersect(b: SpecPatch): SpecPatch = SpecPatch(
    labels = SpecAlgebra.intersectLabels(labels, b.labels),
    replication = if (replication == b.replication) replication else 0,
    fragmentTargetLength =
      if (fragmentTargetLength == b.fragmentTargetLength) fragmentTargetLength else 0L,
    codec = if (codec == b.codec) codec else "",
    flags = if (flags == b.flags) flags else 0,
    stores = if (stores == b.stores) stores else Vector.empty,
    retentionMs = if (retentionMs == b.retentionMs) retentionMs else -1L,
    maxAppendRate = if (maxAppendRate == b.maxAppendRate) maxAppendRate else -1L,
    flushIntervalMs =
      if (flushIntervalMs == b.flushIntervalMs) flushIntervalMs else -1L)

  /** Fields of `this` not matched by `b`; matches zeroed (SubtractJournalSpecs). */
  def subtract(b: SpecPatch): SpecPatch = SpecPatch(
    labels = SpecAlgebra.subtractLabels(labels, b.labels),
    replication = if (replication == b.replication) 0 else replication,
    fragmentTargetLength =
      if (fragmentTargetLength == b.fragmentTargetLength) 0L else fragmentTargetLength,
    codec = if (codec == b.codec) "" else codec,
    flags = if (flags == b.flags) 0 else flags,
    stores = if (stores == b.stores) Vector.empty else stores,
    retentionMs = if (retentionMs == b.retentionMs) -1L else retentionMs,
    maxAppendRate = if (maxAppendRate == b.maxAppendRate) -1L else maxAppendRate,
    flushIntervalMs =
      if (flushIntervalMs == b.flushIntervalMs) -1L else flushIntervalMs)

  /** Complete (all-fields-specified) view, for flattening to a JournalSpec. */
  def toSpec(name: String): JournalSpec = JournalSpec(
    name = name,
    labels = labels,
    replication = if (replication == 0) 1 else replication,
    fragmentTargetLength = if (fragmentTargetLength == 0L) 1L << 29 else fragmentTargetLength,
    codec = if (codec.isEmpty) "gz" else codec,
    readOnly = flags == SpecPatch.RdOnly,
    writeOnly = flags == SpecPatch.WrOnly,
    stores = stores,
    retentionMs = if (retentionMs < 0L) 0L else retentionMs,
    maxAppendRate = if (maxAppendRate < 0L) 0L else maxAppendRate,
    flushIntervalMs = if (flushIntervalMs < 0L) 0L else flushIntervalMs)
}

object SpecPatch {
  val RdOnly = 1; val WrOnly = 2; val RdWr = 3

  def of(s: JournalSpec): SpecPatch = SpecPatch(
    labels = s.labels,
    replication = s.replication,
    fragmentTargetLength = s.fragmentTargetLength,
    codec = s.codec,
    flags = if (s.readOnly) RdOnly else if (s.writeOnly) WrOnly else RdWr,
    stores = s.stores,
    retentionMs = s.retentionMs,
    maxAppendRate = s.maxAppendRate,
    flushIntervalMs = s.flushIntervalMs)
}

/** One node of the hierarchy: a "directory" if the name is empty or ends
  * in '/', else a terminal journal. Directory patches apply to every
  * descendant (node.go:21-40).
  */
final case class SpecNode(
    name: String,
    patch: SpecPatch = SpecPatch(),
    delete: Option[Boolean] = None,
    revision: Long = 0L,
    children: Vector[SpecNode] = Vector.empty,
    patched: Boolean = false) {

  def isDir: Boolean = name.isEmpty || name.endsWith("/")

  /** Structural validation (node.go:67-99): ordered children, parent
    * names prefix children, terminals have no children.
    */
  def validate: Either[String, Unit] =
    if (isDir) {
      if (revision != 0L) Left(s"unexpected revision on directory $name ($revision)")
      else if (children.isEmpty) Left(s"directory $name has no children")
      else children.zipWithIndex.foldLeft[Either[String, Unit]](Right(())) {
        case (acc @ Left(_), _) => acc
        case (_, (c, i)) =>
          if (!c.name.startsWith(name))
            Left(s"expected parent name to prefix child ($name vs ${c.name})")
          else if (i != 0 && children(i - 1).name >= c.name)
            Left(s"children out of order (${children(i - 1).name} vs ${c.name})")
          else c.validate
      }
    } else if (children.nonEmpty) Left(s"terminal $name has children")
    else Right(())

  /** Hoist spec values common to all children into this node, zeroing
    * them at the children (node.go:101-132). Bottom-up.
    */
  def hoist: SpecNode =
    if (!isDir || children.isEmpty) this // empty tree: nothing to hoist
    else {
      val hs = children.map(_.hoist)
      val commonDelete = hs.map(_.delete).distinct match {
        case Vector(d) => d
        case _ => None
      }
      val common = hs.map(_.patch).reduceLeft(_.intersect(_))
      copy(
        patch = common,
        delete = commonDelete,
        children = hs.map { c =>
          c.copy(
            patch = c.patch.subtract(common),
            delete = if (commonDelete.isDefined) None else c.delete)
        })
    }

  /** Push directory spec values down to children where unspecified,
    * zeroing directory patches (node.go:138-151). Top-down — after this
    * every terminal carries its fully-inherited configuration.
    */
  def pushDown: SpecNode = {
    val pushed = children.map { c =>
      c.copy(
        patch = c.patch.union(patch),
        delete = c.delete.orElse(delete)).pushDown
    }
    if (isDir) copy(patch = SpecPatch(), delete = None, children = pushed)
    else copy(children = pushed)
  }

  def terminals: Vector[SpecNode] =
    if (isDir) children.flatMap(_.terminals) else Vector(this)

  /** Patch `p` into the tree (node.go:172-217): union onto an existing
    * terminal, or splice a new node at the ordered insertion point.
    * Returns the updated tree (root may gain an empty-name wrapper).
    */
  def patchIn(p: SpecNode): SpecNode =
    // Re-wrap unless the match lands on this node EXACTLY or crosses a
    // '/' boundary into this directory (dir names end '/', so their
    // startsWith IS boundary-safe). The same raw-startsWith hazard the
    // child-descent branch below guards: with a single-terminal root
    // "topic/events", a patch of "topic/events-dlq" (or
    // "topic/events/sub") would otherwise walk into the terminal and
    // fail its name require instead of splicing in as a sibling.
    if (!(p.name == name || (isDir && p.name.startsWith(name))))
      SpecNode("", children = Vector(this)).patchIn(p)
    else if (!isDir) {
      require(name == p.name, s"unexpected patch of terminal $name with ${p.name}")
      copy(
        patch = p.patch.union(patch),
        delete = p.delete.orElse(delete),
        revision = if (p.revision != 0) p.revision else revision,
        patched = true)
    } else if (name == p.name) {
      // Dir-onto-dir: union the config here — pushDown propagates it to
      // every descendant. Also the terminating case for a spliced
      // directory patch (the splice below would otherwise re-enter
      // itself forever on a childless copy of the same name).
      copy(patch = p.patch.union(patch), delete = p.delete.orElse(delete))
    } else {
      val ind = children.indexWhere(_.name > p.name) match {
        case -1 => children.length
        case i => i
      }
      // Descend only across a '/' BOUNDARY: into the dir whose name
      // (ending '/') prefixes p, or onto the terminal with the SAME
      // name. A raw startsWith would walk into terminal "a/b" for
      // patch "a/bc" and fail the terminal's name require, instead of
      // splicing "a/bc" in as an ordered sibling.
      val descend = ind != 0 && {
        val prev = children(ind - 1)
        p.name == prev.name || (prev.isDir && p.name.startsWith(prev.name))
      }
      if (descend)
        copy(children = children.updated(ind - 1, children(ind - 1).patchIn(p)))
      else {
        val inserted = (children.take(ind) :+ p.copy(children = Vector.empty)) ++
          children.drop(ind)
        copy(children = inserted.updated(ind,
          inserted(ind).copy(patch = SpecPatch(), patched = false).patchIn(p)))
      }
    }

  /** Mark never-patched terminals for deletion (node.go:219-230) — the
    * "apply this config file authoritatively" mode of spec sync tools.
    */
  def markUnpatchedForDeletion: SpecNode =
    if (isDir) copy(children = children.map(_.markUnpatchedForDeletion))
    else if (!patched) copy(delete = Some(true))
    else this
}

object SpecTree {

  /** Shared prefix length of two names, measured at '/' boundaries
    * (node.go:268-279).
    */
  def sharedPrefix(a0: String, b0: String): Int = {
    val (a, b) = if (a0.length > b0.length) (b0, a0) else (a0, b0)
    var l = 0
    var done = false
    while (!done) {
      val n = a.indexOf('/', l)
      if (n != -1 && a.substring(0, n + 1) == b.substring(0, math.min(n + 1, b.length)))
        l = n + 1
      else done = true
    }
    l
  }

  /** Fold name-ordered terminal nodes into the directory tree implied by
    * their shared path prefixes (node.go:232-266), then hoist common
    * configuration.
    */
  def extract(nodes: Vector[SpecNode]): SpecNode = {
    if (nodes.isEmpty) return SpecNode("")
    var ns = nodes.sortBy(_.name)
    while (ns.length > 1) {
      var (beg, end, maxLen) = (0, 0, -1)
      var i = 1
      while (i < ns.length) {
        val l = sharedPrefix(ns(i).name, ns(i - 1).name)
        if (l > maxLen) { beg = i - 1; end = i + 1; maxLen = l }
        else if (l == maxLen && i == end) end = i + 1
        i += 1
      }
      val parent = SpecNode(ns(beg).name.substring(0, maxLen),
        children = ns.slice(beg, end))
      ns = (ns.take(beg) :+ parent) ++ ns.drop(end)
    }
    ns.head
  }

  /** Catalog listing → hoisted tree (FromListResponse, node.go:43-60).
    * Terminal nodes carry their catalog REVISIONS, so an applyTo of the
    * edited tree runs as a CAS cycle: a spec another writer changed
    * since this read fails with a revision mismatch instead of being
    * silently overwritten.
    */
  def fromCatalog(cat: JournalCatalog): SpecNode = {
    val terms = cat.listWithRevisions().map { case (s, rev) =>
      SpecNode(s.name, SpecPatch.of(s), revision = rev)
    }
    extract(terms).hoist
  }

  /** Flatten an edited tree back to catalog Apply operations: terminals
    * marked delete are removed, the rest upserted fully-specified.
    * Terminals with a known revision (a [[fromCatalog]] round trip)
    * apply as CAS; revision-0 terminals (hand-authored trees) apply
    * unconditionally, preserving the last-writer-wins behavior for
    * trees built outside a read-modify-write cycle.
    */
  def applyTo(tree: SpecNode, cat: JournalCatalog): Either[String, Int] = {
    val flat = tree.pushDown.terminals
    flat.foldLeft[Either[String, Int]](Right(0)) {
      case (acc @ Left(_), _) => acc
      case (Right(n), t) =>
        val expect = if (t.revision > 0L) t.revision else -1L
        val r =
          if (t.delete.contains(true))
            cat.delete(t.name, expect) match {
              case Left(m) if m.startsWith(JournalCatalog.RevisionMismatch) =>
                Left(m)
              case Left(_) => Right(()) // idempotent delete of an absent spec
              case Right(_) => Right(())
            }
          else cat.upsert(t.patch.toSpec(t.name), expect).map(_ => ())
        r.map(_ => n + 1)
    }
  }
}
