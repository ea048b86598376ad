package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.CurationQueries

/** Semantics pins for the corpus-curation operators (llm/CurationQueries):
  * Gopher rule battery, DSIR importance resampling, distributed k-means,
  * SemDeDup. The driver's DuckDB oracle already checks row-level equality;
  * these specs pin the PROPERTIES that make each operator meaningful —
  * rules fire on the documents constructed to trip them, DSIR separates
  * the target domain, k-means is partition-count invariant, SemDeDup
  * pairs really exceed the threshold — so a future refactor cannot
  * silently keep the row shape while losing the semantics.
  */
class CurationSpecs extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.01"
  private var spark: SparkSession = _

  private def q(name: String): DataFrame =
    CurationQueries.queries.find(_.name == name).get.run(spark, sfDir)

  override def beforeAll(): Unit = {
    spark = graft.engine.Engine.session("local[4]", shufflePartitions = 4)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("gopher battery: every rule fires on some docs and passes others; keep = AND of rules") {
    val df = q("llm_quality_gopher").cache()
    val n = df.count()
    val ruleCols = Seq("pass_word_count", "pass_symbol", "pass_bullet",
      "pass_ellipsis", "pass_alpha", "pass_stopwords")
    for (c <- ruleCols) {
      val passed = df.filter(col(c)).count()
      assert(passed > 0 && passed < n, s"$c should have mixed outcomes, got $passed/$n")
    }
    // keep is exactly the conjunction of the seven published flags
    val bad = df.filter(col("keep") =!= (col("pass_word_count") && col("pass_word_len") &&
      col("pass_symbol") && col("pass_bullet") && col("pass_ellipsis") &&
      col("pass_alpha") && col("pass_stopwords"))).count()
    assert(bad === 0)
    // the constructions trip their intended rule: a doc_id divisible by 7
    // but not 11 has 10 of 11 lines bulleted (> 0.9) -> fails pass_bullet
    val bulletOnly = df.filter(col("doc_id") % 7 === 0 && col("doc_id") % 11 =!= 0)
    assert(bulletOnly.count() > 0 && bulletOnly.filter(col("pass_bullet")).count() === 0)
    // a doc_id divisible by 11 but not 7 has 2 of 3 lines ellipsis-ended
    val ellOnly = df.filter(col("doc_id") % 11 === 0 && col("doc_id") % 7 =!= 0)
    assert(ellOnly.count() > 0 && ellOnly.filter(col("pass_ellipsis")).count() === 0)
    df.unpersist()
  }

  test("dsir: target-domain (en) docs score strictly higher on average; selection is nonempty and proper") {
    val docs = spark.table("documents").select(col("doc_id").cast("long").as("doc_id"), col("lang"))
    val joined = q("llm_importance_resample").join(docs, "doc_id").cache()
    val Array(enAvg, otherAvg) = joined
      .groupBy((col("lang") === "en").as("isEn"))
      .agg(avg("dsir_weight").as("w")).orderBy(col("isEn").desc)
      .collect().map(_.getDouble(1))
    assert(enAvg > otherAvg + 0.05,
      s"DSIR must separate the target domain: en=$enAvg other=$otherAvg")
    val sel = joined.filter(col("selected")).count()
    assert(sel > 0 && sel < joined.count())
    // selected docs skew heavily to the target domain
    val enShareSel = joined.filter(col("selected") && col("lang") === "en").count().toDouble / sel
    assert(enShareSel > 0.8, s"selected set should be mostly en, got $enShareSel")
    joined.unpersist()
  }

  test("k-means: total assignment, <=8 clusters, and partition-count invariance") {
    val a4 = q("llm_kmeans_cluster").cache()
    val n = spark.table("embeddings").count()
    assert(a4.count() === n) // every vector assigned exactly once
    assert(a4.select("vec_id").distinct().count() === n)
    val clusters = a4.select("cluster").distinct().collect().map(_.getLong(0)).sorted
    assert(clusters.length <= 8 && clusters.forall(c => c >= 0 && c < 8))
    // partition-count invariance: the distributed mean + broadcast
    // assignment must not depend on the physical split of the scan
    val spark2 = spark.newSession()
    spark2.conf.set("spark.sql.shuffle.partitions", "13")
    val b = CurationQueries.queries.find(_.name == "llm_kmeans_cluster").get.run(spark2, sfDir)
    val diff = a4.except(b).count() + b.except(a4).count()
    assert(diff === 0, s"assignment changed under a different partition count: $diff rows differ")
    a4.unpersist()
  }

  test("html extraction is lossless for every document and strips real boilerplate") {
    val df = q("llm_html_extract").cache()
    assert(df.filter(!col("lossless")).count() === 0) // extracted == original text, always
    // boilerplate genuinely removed: every doc sheds >25% of its html bytes
    assert(df.filter(col("boilerplate_frac") <= 0.25).count() === 0)
    df.unpersist()
  }

  test("semdedup: recorded pairs are same-cluster, lower-id, and genuinely over threshold") {
    val d = q("llm_cluster_semdedup")
    val e = spark.table("embeddings").select(
      col("vec_id").cast("long").as("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    val pairs = d.join(e.select(col("vec_id"), col("label").as("la"), col("e").as("ea")), "vec_id")
      .join(e.select(col("vec_id").as("dup_of"), col("label").as("lb"), col("e").as("eb")), "dup_of")
    assert(pairs.count() > 0)
    assert(pairs.filter(col("la") =!= col("lb")).count() === 0) // same cluster
    assert(pairs.filter(col("dup_of") >= col("vec_id")).count() === 0) // keeper has lower id
    val cs = (aggregate(zip_with(col("ea"), col("eb"), (x, y) => x * y), lit(0.0d), (a, x) => a + x) /
      (sqrt(aggregate(col("ea"), lit(0.0d), (a, x) => a + x * x)) *
        sqrt(aggregate(col("eb"), lit(0.0d), (a, x) => a + x * x))))
    assert(pairs.filter(cs < 0.35).count() === 0) // threshold truly met
  }

  test("pagerank: equals a sequential integer replay, conserves rank mass, partition-invariant") {
    val got = q("llm_pagerank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // Sequential replay of the EXACT fixed-point arithmetic.
    val n = spark.table("documents").count()
    var r = Array.fill(n.toInt)(1000000000000L / n)
    val base = 150000000000L / n
    for (_ <- 1 to 5) {
      val in = Array.fill(n.toInt)(0L)
      for (d <- 0 until n.toInt; off <- Seq(8L, 15L, 22L))
        in(((d * 31 + off) % n).toInt) += r(d) / 3
      r = Array.tabulate(n.toInt)(d => base + 85 * in(d) / 100)
    }
    assert(got.size === n.toInt)
    for (d <- 0 until n.toInt) assert(got(d.toLong) === r(d), s"doc $d")

    // Fixed-point mass conservation: floor losses are bounded by ~4N/round.
    val total = got.values.sum
    assert(total <= 1000000000000L && total >= 1000000000000L - 25 * n)

    // Bit-reproducible at any parallelism: rerun under a different
    // shuffle-partition count and require IDENTICAL integers.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val again = q("llm_pagerank").collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
      assert(again === got)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
