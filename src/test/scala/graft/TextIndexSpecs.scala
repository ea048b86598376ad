package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextIndexQueries
import graft.queries.TpcdsShapeQueries

/** Pins for the text-indexing / tokenizer-induction operators and the
  * q88 single-scan rewrite:
  *  - llm_bpe_train equals an INDEPENDENT sequential BPE (classic
  *    Sennrich loop: zip-adjacency counts, argmax with (count DESC,
  *    pair ASC) tiebreak, left-to-right non-overlapping merge) run on
  *    the collected corpus — so the distributed fold provably
  *    implements textbook BPE, not a lookalike.
  *  - llm_inverted_index postings are sorted, df/total_tf consistent
  *    with the raw token stream.
  *  - ds_multi_band_scan plans as ONE scan of events and ZERO joins —
  *    the whole point of re-expressing q88's eight scalar subqueries
  *    as conditional aggregation.
  */
class TextIndexSpecs extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.01"
  private var spark: SparkSession = _

  private def q(name: String): DataFrame =
    TextIndexQueries.queries.find(_.name == name).get.run(spark, sfDir)

  override def beforeAll(): Unit = {
    spark = graft.engine.Engine.session("local[4]", shufflePartitions = 4)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential reference BPE: the textbook algorithm, no Spark. */
  private def seqBpe(words: Map[String, Long], k: Int): Seq[(Int, String, String, String, Long)] = {
    var v: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) => (w.map(_.toString).toVector, c) }
    (1 to k).map { step =>
      val counts = mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- v; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + c
      }
      val ((l, r), c) = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a + " " + b) }.head
      v = v.map { case (syms, cnt) =>
        val out = mutable.ArrayBuffer.empty[String]
        for (x <- syms) {
          if (out.nonEmpty && out.last == l && x == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += x
        }
        (out.toVector, cnt)
      }
      (step, l, r, l + r, c)
    }
  }

  test("bpe_train equals the sequential textbook BPE on the same corpus") {
    val got = q("llm_bpe_train")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
      .toSeq
    val tok = "[a-z]+".r
    val words = spark.table("documents").select("text").collect()
      .iterator.flatMap(r => tok.findAllIn(r.getString(0).toLowerCase))
      .foldLeft(Map.empty[String, Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1L) }
    val want = seqBpe(words, got.length)
    assert(got === want)
    // sanity: the learned table is nontrivial and includes at least one
    // second-order merge (a merged symbol used as a pair side)
    assert(got.length === 6)
    val syms = got.map(_._4).toSet
    assert(got.exists(m => syms.contains(m._2) || syms.contains(m._3)),
      "expected a merge whose side is itself a learned symbol")
  }

  test("inverted index: postings sorted by doc, df/total_tf consistent with the token stream") {
    val df = q("llm_inverted_index").cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val postings = r.getAs[String]("postings").split(" ").map { e =>
        val Array(d, t) = e.split(":"); (d.toLong, t.toLong)
      }
      assert(postings.map(_._1).toSeq === postings.map(_._1).sorted.toSeq)
      assert(postings.length === r.getAs[Long]("df"))
      assert(postings.map(_._2).sum === r.getAs[Long]("total_tf"))
    }
    // cross-check one term's tf against a direct count
    val term = rows.head.getAs[String]("term")
    val direct = spark.table("documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(col("w") === term).count()
    assert(direct === rows.head.getAs[Long]("total_tf"))
    df.unpersist()
  }

  test("bpe_encode: per-doc token counts equal a sequential merge application") {
    val got = q("llm_bpe_encode").collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_chars"))).toMap
    val tok = "[a-z]+".r
    val docs = spark.table("documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tok.findAllIn(r.getString(1).toLowerCase).toVector)
    val words = docs.iterator.flatMap(_._2)
      .foldLeft(Map.empty[String, Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1L) }
    val merges = seqBpe(words, 6)
    // Apply the learned merges to each distinct word once (the same
    // vocab-sized segmentation the engine joins with).
    def encode(w: String): Int = {
      var syms: Vector[String] = w.map(_.toString).toVector
      for ((_, l, r, _, _) <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (x <- syms) {
          if (out.nonEmpty && out.last == l && x == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += x
        }
        syms = out.toVector
      }
      syms.length
    }
    val nSub = words.keysIterator.map(w => w -> encode(w)).toMap
    for ((id, ws) <- docs if ws.nonEmpty) {
      val (nw, nt, nc) = got(id)
      assert(nw === ws.length, s"doc $id n_words")
      assert(nt === ws.map(nSub(_).toLong).sum, s"doc $id n_tokens")
      assert(nc === ws.map(_.length.toLong).sum, s"doc $id n_chars")
      assert(nt <= nc && nw <= nt)
    }
    // the learned merges genuinely compress: fewer tokens than chars overall
    val (tc, cc) = (got.values.map(_._2).sum, got.values.map(_._3).sum)
    assert(tc < cc)
  }

  test("bm25: scores equal a sequential BM25 with the same sorted-fold summation") {
    val got = q("llm_bm25_rank").collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("matched"), r.getAs[Double]("bm25")))
      .toMap
    val qTerms = Set("spark", "join", "window", "vector")
    val tok = "[a-z]+".r
    val docs = spark.table("documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tok.findAllIn(r.getString(1).toLowerCase).toVector)
    val dl = docs.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val nDocs = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / nDocs
    val tf = docs.iterator.flatMap { case (id, ws) => ws.filter(qTerms).map(w => (id, w)) }
      .toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df = tf.keys.toSeq.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val want = tf.toSeq.groupBy(_._1._1).map { case (id, entries) =>
      val contribs = entries.map { case ((_, t), f) =>
        math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5)) *
          (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
      }.sorted
      id -> (entries.size.toLong,
        BigDecimal(contribs.foldLeft(0.0)(_ + _)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    assert(got.keySet === want.keySet)
    for ((id, (m, s)) <- want) {
      assert(got(id)._1 === m, s"doc $id matched")
      assert(math.abs(got(id)._2 - s) < 1e-9, s"doc $id bm25: got ${got(id)._2} want $s")
    }
    // every query term drives at least one max-matched doc
    assert(want.values.exists(_._1 === qTerms.size.toLong))
  }

  test("phrase search: every hit is real, every occurrence is found (regex cross-check)") {
    import org.apache.spark.sql.functions.{col, concat, lit, regexp_count}
    val got = q("llm_phrase_search")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty, "the fixture corpus must contain the phrase")
    // independent recount: lookahead regex on space-padded text counts
    // overlapping-safe occurrences of the exact word sequence
    val expect = spark.table("documents")
      .select(col("doc_id"),
        regexp_count(concat(lit(" "), col("text"), lit(" ")),
          lit("(?= table scan merge )")).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, c) <- expect) {
      if (c == 0) assert(!got.contains(id), s"doc $id false positive")
      else assert(got.get(id).map(_._1).contains(c), s"doc $id count")
    }
    // first_pos really is the phrase start
    val texts = spark.table("documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    for ((id, (_, fp)) <- got) {
      val w = texts(id).split(" ", -1)
      assert(w(fp.toInt - 1) == "table" && w(fp.toInt) == "scan" && w(fp.toInt + 1) == "merge")
    }
  }

  test("ds_multi_band_scan: one scan of the fact, zero joins") {
    val df = TpcdsShapeQueries.queries.find(_.name == "ds_multi_band_scan").get.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "(?i)scan (parquet|existingrdd|inmemory)".r.findAllIn(plan).length +
      "FileScan".r.findAllIn(plan).length
    assert(scans <= 2, s"expected a single events scan, plan:\n$plan") // one scan node, possibly echoed
    assert(!plan.toLowerCase.contains("join"), s"q88 rewrite must not join:\n$plan")
    val row = df.collect()(0)
    assert((0 until 8).map(row.getLong).sum > 0)
  }

  test("pmi collocations: closed-form ppm scores, min-count filter, exact ordering") {
    // Planted corpus: 6 docs "strong coffee is good" + 4 docs
    // "weak tea is fine x". N_uni = 6*4 + 4*5 = 44, N_bi = 6*3 + 4*4 = 34.
    // Surviving bigrams (c_ab >= 5): "strong coffee" (6,6,6),
    // "coffee is" (6,6,10), "is good" (6,10,6). All "weak tea" bigrams
    // have c_ab = 4 and must be filtered. Closed forms:
    //   strong coffee: floor(6*44^2*1e6 / (34*6*6))  = 9490196
    //   coffee is:     floor(6*44^2*1e6 / (34*6*10)) = 5694117
    //   is good:       same denominator               = 5694117
    // Ordering: ppm DESC, bigram ASC -> coffee is before is good.
    val s = spark.newSession()
    graft.engine.Engine.registerTables(s, sfDir)
    import s.implicits._
    val docs = ((1 to 6).map(i => (i.toLong, "strong coffee is good")) ++
      (7 to 10).map(i => (i.toLong, "weak tea is fine x"))).toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents")
    val out = SparkEntry.queries("llm_pmi_collocations")(s, sfDir)
      .select("bigram", "c_ab", "c_a", "c_b", "pmi_ppm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("strong coffee", 6L, 6L, 6L, 9490196L),
      ("coffee is", 6L, 6L, 10L, 5694117L),
      ("is good", 6L, 10L, 6L, 5694117L)))
  }

  test("pmi collocations: docs with <2 latin tokens don't crash bigram assembly") {
    // Regression: slice(w, 1, size-1) threw "length must be >= 0" on any
    // doc whose token array was empty (digits/punct/non-Latin) or a
    // single token; the oracle's generate_series handled those docs
    // gracefully, so one bad doc failed the whole query engine-side only.
    val s = spark.newSession()
    graft.engine.Engine.registerTables(s, sfDir)
    import s.implicits._
    val docs = Seq(
      (1L, "12345 67890 !!!"),        // zero latin tokens
      (2L, "solo"),                    // one token — no bigram
      (3L, "москва 北京 42"),          // non-Latin — zero tokens
      (4L, "the cat"), (5L, "the cat"), (6L, "the cat"),
      (7L, "the cat"), (8L, "the cat")) // c_ab = 5 survives the filter
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents")
    val out = SparkEntry.queries("llm_pmi_collocations")(s, sfDir)
      .select("bigram", "c_ab").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("the cat", 5L)))
  }
}
