package graft

import graft.catalog.Catalog
import org.apache.spark.sql.functions._

/** Hierarchical catalog of encoded stores: put/get roundtrip, leaf-key
  * rules, traversal, user metadata, subtree delete, read-only mode.
  */
class CatalogSpec extends SparkTestBase {

  import spark.implicits._

  private def freshCatalog(): Catalog =
    new Catalog(spark, java.nio.file.Files.createTempDirectory("graft-cat").toString)

  private lazy val docs = (0 until 500).map(i => (i.toLong, s"text-$i", (i % 5).toString))
    .toDF("doc_id", "text", "lang")
  private lazy val emb = (0 until 100).map(i => (i.toLong, Array.fill(8)(i * 0.5f)))
    .toDF("vec_id", "embedding")

  test("put/get roundtrip through encoded stores at hierarchical keys") {
    val cat = freshCatalog()
    cat.put("/corpus/docs", docs, idCols = Seq("doc_id"), nShards = 4, nBatches = 1)
    cat.put("corpus/emb", emb, idCols = Seq("vec_id"), nShards = 4, nBatches = 1) // leading '/' implied
    cat.put("/models/v1/weights", emb, idCols = Seq("vec_id"), nShards = 4, nBatches = 1)

    assert(cat.contains("/corpus/docs") && cat.contains("/corpus/emb"))
    val back = cat.get("/corpus/docs")
    assert(back.count() == 500)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    assert(cat.entry("/corpus/docs").idCols == Seq("doc_id"))
    assert(cat.entry("/corpus/emb").schema.fieldNames.toSeq == Seq("vec_id", "embedding"))
  }

  test("traversal: children, descendants, walk") {
    val cat = freshCatalog()
    cat.put("/corpus/docs", docs, Seq("doc_id"), nShards = 2, nBatches = 1)
    cat.put("/corpus/emb", emb, Seq("vec_id"), nShards = 2, nBatches = 1)
    cat.put("/models/v1/weights", emb, Seq("vec_id"), nShards = 2, nBatches = 1)

    assert(cat.children("/").map(_._1) == Seq("/corpus", "/models"))
    assert(cat.children("/").forall(!_._2)) // interior nodes, not tables
    assert(cat.children("/corpus") == Seq(("/corpus/docs", true), ("/corpus/emb", true)))
    assert(cat.descendants("/") == Seq("/corpus/docs", "/corpus/emb", "/models/v1/weights"))
    val w = cat.walk("/")
    assert(w.head._1 == "/" && w.head._2 == Seq("/corpus", "/models"))
    assert(w.exists { case (d, _, tables) => d == "/corpus" && tables == Seq("/corpus/docs", "/corpus/emb") })
  }

  test("leaf-key rules: no table beneath a table, none on an interior node") {
    val cat = freshCatalog()
    cat.put("/corpus/docs", docs, Seq("doc_id"), nShards = 2, nBatches = 1)
    intercept[IllegalArgumentException] {
      cat.put("/corpus/docs/sub", emb, Seq("vec_id")) // beneath a table
    }
    intercept[IllegalArgumentException] {
      cat.put("/corpus", emb, Seq("vec_id")) // interior node with children
    }
    intercept[IllegalArgumentException](cat.normalize("/bad/_reserved"))
    intercept[IllegalArgumentException](cat.normalize("/bad/a=b"))
    intercept[IllegalArgumentException](cat.normalize("/../escape"))
  }

  test("re-put replaces; user metadata merges; subtree delete") {
    val cat = freshCatalog()
    cat.put("/t", docs, Seq("doc_id"), nShards = 2, nBatches = 1)
    cat.put("/t", docs.filter(col("doc_id") < 100), Seq("doc_id"), nShards = 2, nBatches = 1)
    assert(cat.get("/t").count() == 100)

    cat.setMeta("/t", Map("owner" -> "pipeline", "note" -> "v1"))
    cat.setMeta("/t", Map("note" -> "v2"))
    assert(cat.getMeta("/t") == Map("owner" -> "pipeline", "note" -> "v2"))
    // literal backslash followed by n/t must survive (single-pass unescape)
    cat.setMeta("/t", Map("win" -> "C:\\nightly\\tools", "nl" -> "a\nb"))
    assert(cat.getMeta("/t")("win") == "C:\\nightly\\tools")
    assert(cat.getMeta("/t")("nl") == "a\nb")

    cat.put("/tree/a", docs, Seq("doc_id"), nShards = 2, nBatches = 1)
    cat.put("/tree/b/c", emb, Seq("vec_id"), nShards = 2, nBatches = 1)
    assert(cat.delete("/tree"))
    assert(cat.descendants("/").forall(!_.startsWith("/tree")))
    assert(!cat.contains("/tree/a"))
  }

  test("read-only catalog refuses writes but serves reads") {
    val cat = freshCatalog()
    cat.put("/t", docs, Seq("doc_id"), nShards = 2, nBatches = 1)
    val ro = new Catalog(spark, cat.root, readOnly = true)
    assert(ro.get("/t").count() == 500)
    intercept[IllegalArgumentException](ro.put("/u", docs, Seq("doc_id")))
    intercept[IllegalArgumentException](ro.delete("/t"))
    intercept[IllegalArgumentException](ro.setMeta("/t", Map("a" -> "b")))
  }
}
