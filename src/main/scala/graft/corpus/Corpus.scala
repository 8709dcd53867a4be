package graft.corpus

import graft.encode.CodeFile
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Deterministic synthetic source-code corpus in the north-rule shape
  * `(repo, path, commit, lang, content)` — FIXTURES.md §1.
  *
  * Every row is a pure function of (seed, rowId): no partition-count or
  * retry sensitivity, the same pattern as the reference's chunk-parallel
  * seeded RNG (python-blosc2 `random.py`, per-chunk SeedSequence,
  * RELEASE_NOTES.md:166-171).
  *
  * Distributions: `lang` zipf-skewed over ~16 values, `repo` zipf-skewed,
  * `commit` 40-hex incompressible, `content` keyword-heavy synthetic
  * source whose length is lognormal-ish (~200 B .. 64 KB).
  */
object Corpus {

  val LANGS: Array[String] = Array(
    "c", "js", "py", "java", "cpp", "go", "ts", "rb",
    "rs", "php", "cs", "scala", "kt", "swift", "sh", "sql")

  private val KEYWORDS: Array[String] = Array(
    "return", "if", "else", "for", "while", "break", "continue", "switch",
    "case", "default", "static", "const", "void", "int", "long", "double",
    "float", "char", "struct", "class", "public", "private", "protected",
    "import", "package", "function", "def", "val", "var", "let", "new",
    "this", "self", "null", "true", "false", "try", "catch", "finally",
    "throw", "async", "await", "yield", "lambda", "match", "override")

  private val IDENT_ROOTS: Array[String] = Array(
    "buffer", "index", "count", "result", "value", "offset", "length",
    "config", "handler", "context", "request", "response", "parser",
    "writer", "reader", "stream", "cache", "queue", "node", "token")

  /** splitmix64 — public-domain mixing function (Steele et al. 2014). */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Zipf-ish index in [0, n): heavy head, long tail. */
  @inline private def zipf(h: Long, n: Int): Int = {
    val u = ((h >>> 11).toDouble / (1L << 53).toDouble) // [0,1)
    val x = math.pow(u, 3.0) // cube → heavy skew toward 0
    math.min(n - 1, (x * n).toInt)
  }

  def file(seed: Long, id: Long): CodeFile = file(seed, id, hotRepoFrac = 0.0)

  /** hotRepoFrac > 0 routes that fraction of rows to a single hot repo
    * (the skew fixture: FIXTURES.md §1 "one hot repo = 50% of rows").
    */
  def file(seed: Long, id: Long, hotRepoFrac: Double): CodeFile =
    file(seed, id, hotRepoFrac, 0.0, 0L)

  /** dupFrac > 0 draws that fraction of rows' CONTENT (and the lang it
    * implies) from a shared pool of `dupPool` popular files — the
    * vendored/forked-file model (public exact-dup estimates for code
    * corpora run 20-40% of files). Copies are exact and land at long
    * range from each other, which is the regime the codec layer's
    * dup-gated LDM targets. Repo/path/commit stay unique per row, like
    * the same file vendored into many repos. Still a pure per-row
    * function: no state, no partition sensitivity.
    */
  def file(seed: Long, id: Long, hotRepoFrac: Double,
           dupFrac: Double, dupPool: Long): CodeFile = {
    val h0 = mix(seed ^ id)
    val h1 = mix(h0)
    val h2 = mix(h1)
    val h3 = mix(h2)

    val h4 = mix(h3 ^ 0xd1b54a32d192ed03L)
    val dup = dupFrac > 0 && dupPool > 0 &&
      ((h4 >>> 11).toDouble / (1L << 53).toDouble) < dupFrac
    // all copies of pool file k share contentSeed → identical content+lang
    val contentSeed =
      if (dup) mix(seed ^ 0x5851f42d4c957f2dL ^ java.lang.Long.remainderUnsigned(mix(h4), dupPool))
      else h0 ^ h3

    val langIdx =
      if (dup) ((mix(contentSeed) & 0x7fffffffL) % LANGS.length).toInt
      else zipf(h0, LANGS.length)
    val lang = LANGS(langIdx)

    val hot = hotRepoFrac > 0 &&
      ((h3 >>> 11).toDouble / (1L << 53).toDouble) < hotRepoFrac
    val org = if (hot) 0 else zipf(h1, 200)
    val proj = if (hot) 0 else (mix(h1 ^ 7) & 0x1f).toInt
    val repo = s"org$org/proj-$proj"

    val depth = 1 + (h2 & 3).toInt
    val sb = new StringBuilder(64)
    sb.append("src")
    var d = 0
    var hp = h2
    while (d < depth) {
      hp = mix(hp)
      sb.append('/').append(IDENT_ROOTS((hp & 0x7fffffff).toInt % IDENT_ROOTS.length))
      d += 1
    }
    sb.append('/').append("File").append((h2 >>> 40) & 0xffff).append('.').append(lang)
    val path = sb.toString()

    val commit = {
      val c = new StringBuilder(40)
      var x = h3
      var i = 0
      while (i < 40) {
        if (i % 16 == 0) x = mix(x ^ i)
        c.append("0123456789abcdef".charAt(((x >>> ((i % 16) * 4)) & 0xf).toInt))
        i += 1
      }
      c.toString()
    }

    CodeFile(repo, path, commit, lang, content(contentSeed, lang))
  }

  /** Synthetic source text: keyword-heavy lines, indentation, repeated
    * identifiers — compressible like real code. Length ~200B..64KB,
    * lognormal-ish.
    */
  def content(seed: Long, lang: String): String = {
    var h = mix(seed)
    // length: exp2 of uniform(7.6 .. 16) → ~200 B .. 64 KiB target
    val u = (h >>> 11).toDouble / (1L << 53).toDouble
    val targetLen = math.pow(2.0, 7.6 + u * u * 8.4).toInt
    val sb = new StringBuilder(targetLen + 128)
    sb.append("// ").append(lang).append(" module\n")
    var indent = 0
    // a small per-file identifier pool → heavy repetition within the file
    val idents = new Array[String](8)
    var i = 0
    while (i < idents.length) {
      h = mix(h)
      idents(i) = IDENT_ROOTS((h & 0x7fffffff).toInt % IDENT_ROOTS.length) + ((h >>> 33) & 0xff)
      i += 1
    }
    while (sb.length < targetLen) {
      h = mix(h)
      val kind = (h & 7).toInt
      var s = 0
      while (s < indent) { sb.append("  "); s += 1 }
      kind match {
        case 0 =>
          sb.append(KEYWORDS((((h >>> 8) & 0x7fffffff) % KEYWORDS.length).toInt))
            .append(" (").append(idents(((h >>> 16) & 7).toInt))
            .append(" < ").append((h >>> 24) & 0xfff).append(") {\n")
          indent = math.min(indent + 1, 4)
        case 1 if indent > 0 =>
          sb.append("}\n")
          indent -= 1
        case 2 =>
          sb.append(idents(((h >>> 12) & 7).toInt)).append(" = ")
            .append(idents(((h >>> 20) & 7).toInt)).append(" + ")
            .append((h >>> 28) & 0xffff).append(";\n")
        case 3 =>
          sb.append("// ").append(KEYWORDS((((h >>> 5) & 0x7fffffff) % KEYWORDS.length).toInt))
            .append(" ").append(KEYWORDS((((h >>> 37) & 0x7fffffff) % KEYWORDS.length).toInt))
            .append(" handles ").append(idents(((h >>> 9) & 7).toInt)).append("\n")
        case 4 =>
          sb.append("return ").append(idents(((h >>> 14) & 7).toInt))
            .append(".").append(KEYWORDS((((h >>> 22) & 0x7fffffff) % KEYWORDS.length).toInt))
            .append("(").append((h >>> 30) & 0xff).append(");\n")
        case _ =>
          sb.append(KEYWORDS((((h >>> 3) & 0x7fffffff) % KEYWORDS.length).toInt)).append(" ")
            .append(idents(((h >>> 11) & 7).toInt)).append(" = \"")
            .append(java.lang.Long.toHexString(h >>> 16)).append("\";\n")
      }
    }
    while (indent > 0) { sb.append("}\n"); indent -= 1 }
    sb.toString()
  }

  /** Distributed generator: nRows over nParts partitions. */
  def generate(spark: SparkSession, nRows: Long, nParts: Int,
               seed: Long = 42L, hotRepoFrac: Double = 0.0,
               dupFrac: Double = 0.0, dupPool: Long = 0L): Dataset[CodeFile] = {
    implicit val enc: org.apache.spark.sql.Encoder[CodeFile] = Encoders.product[CodeFile]
    spark.range(0L, nRows, 1L, nParts).mapPartitions { ids =>
      ids.map(id => file(seed, id, hotRepoFrac, dupFrac, dupPool))
    }
  }
}
