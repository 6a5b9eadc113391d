package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.labels.LabelSet

/** Spec-tree semantics from broker/journalspace/node_test.go and the
  * journal_spec_extensions algebra (reference scenarios re-expressed).
  */
class SpecTreeSpec extends AnyFunSuite {

  private def term(name: String, patch: SpecPatch = SpecPatch()) =
    SpecNode(name, patch)

  test("patch algebra: union prefers lhs, intersect keeps shared, subtract zeroes matches") {
    val a = SpecPatch(LabelSet("env", "prod", "team", "a"), replication = 3, codec = "gz")
    val b = SpecPatch(LabelSet("env", "stage", "zone", "us"), replication = 3, codec = "none")

    val u = a.union(b)
    assert(u.labels.valueOf("env").contains("prod")) // lhs wins
    assert(u.labels.valueOf("zone").contains("us"))  // rhs fills gaps
    assert(u.replication == 3 && u.codec == "gz")

    val i = a.intersect(b)
    assert(i.labels.labels.isEmpty) // no group with equal values
    assert(i.replication == 3 && i.codec == "")

    val s = a.subtract(b)
    assert(s.labels.valueOf("env").contains("prod"))
    assert(s.replication == 0 && s.codec == "gz")
  }

  test("extractTree derives directories from shared path components") {
    val tree = SpecTree.extract(Vector(
      term("root/foo/bar"), term("root/foo/baz"), term("root/bing")))
    assert(tree.name == "root/")
    assert(tree.children.map(_.name) == Vector("root/bing", "root/foo/"))
    assert(tree.children(1).children.map(_.name) == Vector("root/foo/bar", "root/foo/baz"))
    assert(tree.validate.isRight)
  }

  test("hoist lifts common config; pushDown restores fully-specified terminals") {
    val p1 = SpecPatch(LabelSet("env", "prod", "app", "x"), replication = 3, codec = "gz")
    val p2 = SpecPatch(LabelSet("env", "prod", "app", "y"), replication = 3, codec = "none")
    val tree = SpecTree.extract(Vector(term("t/a", p1), term("t/b", p2))).hoist

    assert(tree.patch.replication == 3) // hoisted
    assert(tree.patch.labels.valueOf("env").contains("prod"))
    assert(tree.children(0).patch.replication == 0) // zeroed at children
    assert(tree.children(0).patch.labels.valueOf("env").isEmpty)
    assert(tree.children(0).patch.codec == "gz") // not common → stays

    val flat = tree.pushDown.terminals
    assert(flat.map(_.patch.replication) == Vector(3, 3))
    assert(flat.forall(_.patch.labels.valueOf("env").contains("prod")))
    assert(flat.map(_.patch.labels.valueOf("app").get) == Vector("x", "y"))
  }

  test("patchIn updates existing terminals, splices new nodes, re-roots on prefix miss") {
    val base = SpecTree.extract(Vector(term("j/a"), term("j/b")))
    val t1 = base.patchIn(SpecNode("j/a", SpecPatch(replication = 5)))
    assert(t1.terminals.find(_.name == "j/a").get.patch.replication == 5)
    assert(t1.terminals.find(_.name == "j/a").get.patched)

    val t2 = t1.patchIn(SpecNode("j/c", SpecPatch(codec = "none")))
    assert(t2.terminals.map(_.name) == Vector("j/a", "j/b", "j/c"))

    val t3 = t2.patchIn(SpecNode("other/x")) // outside root prefix → re-roots
    assert(t3.terminals.map(_.name).contains("other/x"))

    val marked = t3.markUnpatchedForDeletion
    assert(marked.terminals.filter(_.delete.contains(true)).map(_.name) == Vector("j/b"))
  }

  test("round-trip: catalog → tree → edit → applyTo catalog") {
    val cat = new JournalCatalog
    cat.upsert(JournalSpec("logs/app/a", LabelSet("env", "prod"), replication = 2))
    cat.upsert(JournalSpec("logs/app/b", LabelSet("env", "prod"), replication = 2))
    cat.upsert(JournalSpec("logs/sys/c", LabelSet("env", "dev")))

    val tree = SpecTree.fromCatalog(cat)
    assert(tree.name == "logs/")
    // common env=prod hoisted into logs/app/
    val app = tree.children.find(_.name == "logs/app/").get
    assert(app.patch.labels.valueOf("env").contains("prod"))

    val edited = tree.patchIn(SpecNode("logs/app/d", SpecPatch(replication = 4)))
    assert(SpecTree.applyTo(edited, cat) == Right(4))
    assert(cat.get("logs/app/d").get.replication == 4)
    // d inherits nothing from the hoisted parent? No: pushDown applies
    // the logs/app/ patch — env=prod flows to the new terminal.
    assert(cat.get("logs/app/d").get.labels.valueOf("env").contains("prod"))

    // The first applyTo advanced every spec's revision, so re-applying
    // the STALE tree is a genuine conflict — the CAS cycle must refuse
    // it rather than silently overwrite.
    val stale = edited.patchIn(SpecNode("logs/app/a", delete = Some(true)))
    assert(SpecTree.applyTo(stale, cat).left.exists(_.contains("revision mismatch")))

    // Proper read-modify-write: re-read, then edit, then apply.
    val fresh = SpecTree.fromCatalog(cat)
      .patchIn(SpecNode("logs/app/a", delete = Some(true)))
    assert(SpecTree.applyTo(fresh, cat).isRight)
    assert(cat.get("logs/app/a").isEmpty)
  }

  test("fromCatalog on an empty catalog yields an empty tree; stores survive the round trip") {
    val cat = new JournalCatalog
    assert(SpecTree.fromCatalog(cat).terminals.isEmpty) // hoist must not reduce empty children
    cat.upsert(JournalSpec("topic/a", stores = Vector("file:///tmp/s1", "file:///tmp/s2")))
    val rt = SpecTree.fromCatalog(cat)
    assert(SpecTree.applyTo(rt, cat).isRight)
    assert(cat.get("topic/a").get.stores ==
      Vector("file:///tmp/s1", "file:///tmp/s2"),
      "fromCatalog -> applyTo must not wipe fragment stores")
  }

  test("retention and append-rate survive the fromCatalog -> applyTo round trip") {
    val cat = new JournalCatalog
    cat.upsert(JournalSpec("topic/r", stores = Vector("file:///tmp/s"),
      retentionMs = 3600000L, maxAppendRate = 4096L))
    // 0 is MEANINGFUL for both fields (retain forever / unlimited), so
    // the patch encodes unspecified as -1 — a 0-valued spec must also
    // round-trip unchanged.
    cat.upsert(JournalSpec("topic/z", stores = Vector("file:///tmp/s")))
    val rt = SpecTree.fromCatalog(cat)
    assert(SpecTree.applyTo(rt, cat).isRight)
    val r = cat.get("topic/r").get
    assert(r.retentionMs == 3600000L && r.maxAppendRate == 4096L,
      "fromCatalog -> applyTo must not wipe retention/append-rate")
    val z = cat.get("topic/z").get
    assert(z.retentionMs == 0L && z.maxAppendRate == 0L)
  }

  test("patchIn: prefix-sharing sibling splices; dir patch unions without recursion") {
    // "a/b" terminal + patch "a/bc": raw startsWith would descend into
    // the terminal and fail its name require; must splice a sibling.
    val t = SpecNode("a/", children = Vector(SpecNode("a/b")))
    val t1 = t.patchIn(SpecNode("a/bc", SpecPatch(replication = 3)))
    assert(t1.terminals.map(_.name) == Vector("a/b", "a/bc"))

    // Directory-named patch: config unions onto the dir (and flows to
    // descendants via pushDown) instead of recursing forever.
    val t2 = t.patchIn(SpecNode("a/", SpecPatch(codec = "none")))
    assert(t2.pushDown.terminals.find(_.name == "a/b").get.patch.codec == "none")
    // ...and splicing a NEW directory patch terminates too.
    val t3 = SpecNode("z/", children = Vector(SpecNode("z/x")))
      .patchIn(SpecNode("a/", SpecPatch(codec = "snappy")))
    assert(t3.children.map(_.name).contains("a/"))
  }

  test("sharedPrefix measures at '/' boundaries") {
    assert(SpecTree.sharedPrefix("root/foo/bar", "root/foo/baz") == "root/foo/".length)
    assert(SpecTree.sharedPrefix("root/foo", "root/bar") == "root/".length)
    assert(SpecTree.sharedPrefix("abc", "abd") == 0)
  }

  test("patchIn on a single-terminal ROOT splices string-prefix siblings") {
    // A one-journal catalog yields the terminal ITSELF as the tree
    // root. Patching a name that merely string-prefixes it must
    // re-wrap and splice a sibling — a raw startsWith at the root
    // walked into the terminal and threw on its name require.
    val root = SpecNode("topic/events")
    val t1 = root.patchIn(SpecNode("topic/events-dlq"))
    assert(t1.terminals.map(_.name).sorted ==
      Vector("topic/events", "topic/events-dlq"))
    val t2 = root.patchIn(SpecNode("topic/events/sub"))
    assert(t2.terminals.map(_.name).sorted ==
      Vector("topic/events", "topic/events/sub"))
    // Exact-name patch onto the terminal root still unions in place.
    val t3 = root.patchIn(SpecNode("topic/events", SpecPatch(codec = "zst")))
    assert(t3.name == "topic/events" && t3.patch.codec == "zst")
  }
}
