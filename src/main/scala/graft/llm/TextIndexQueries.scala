package graft.llm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Q, QueryModule}

/** Text-indexing and tokenizer-induction operators *(ext — beyond the
  * reference surface; the training-data-pipeline mandate)*:
  *
  *  - BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
  *    Translation of Rare Words with Subword Units"): learn the top-K
  *    byte-pair merges from the corpus. The classic map-reduce shape:
  *    the corpus collapses ONCE to a (word, count) vocabulary — after
  *    that every merge round runs over the vocabulary, whose size is
  *    corpus-independent (Heaps' law: ~10^6-10^7 rows at 100 TB, never
  *    the token stream). Per round: one codegen'd pair-explode +
  *    hash-agg over the vocab, a single-row argmax collect (bounded
  *    driver metadata), and a map-side fold that applies the merge
  *    left-to-right non-overlapping. Everything is Catalyst HOFs
  *    (`zip_with`/`aggregate`) — no UDF, no driver-side text.
  *
  *  - Inverted index build: term -> ordered (doc_id: tf) posting list
  *    with document frequency. One shuffle keyed on (term, doc) for tf,
  *    one on term for the posting assembly; partial aggregation absorbs
  *    hot-term skew map-side, and a df-cap (stop-term guard) is where a
  *    100 TB build would bound posting length — at this fixture's 31-term
  *    vocab every term survives, so the cap is exercised by value, not
  *    by pruning.
  *
  * Determinism: BPE tie-breaks are (count DESC, pair ASC) in both
  * engines — counts are integral so no float drift can flip an argmax;
  * the DuckDB oracle replays the merge as a recursive leftmost
  * literal-replace, which is provably the same left-to-right
  * non-overlapping semantics as the engine's fold (a replacement never
  * creates an earlier occurrence of the same pair, since merged != left
  * unless right is empty).
  */
object TextIndexQueries extends QueryModule {

  /** Merge rounds to learn. Vocab passes are cheap (vocab-sized); real
    * tokenizers run ~30-50k rounds of exactly this loop.
    */
  private val BpeRounds = 6

  /** Lowercased alpha word stream — the same `[a-z]+` token regex the
    * oracle uses (`regexp_extract_all` exists in both engines).
    */
  private def wordCol: Column =
    explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))

  /** Space-separated symbol string, space-padded on both ends — the
    * canonical BPE working form (' w o r d ').
    */
  private def charSpaced(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "))

  /** Adjacent symbol pairs of a padded symbol string, zip-counted (the
    * reference BPE implementation counts overlapping adjacencies the
    * same way). Empty for single-symbol words — no ANSI index risk.
    */
  private def pairsOf(s: Column): Column = {
    val syms = split(trim(s), " ")
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Apply one merge (l, r) -> l+r to a padded symbol string via a
    * left fold: identical to repeated leftmost replace, i.e. standard
    * BPE left-to-right non-overlapping application. Codegen'd HOF —
    * runs map-side over the vocabulary.
    */
  private def applyMerge(s: Column, l: String, r: String): Column = {
    val syms = split(trim(s), " ")
    val folded = aggregate(
      slice(syms, lit(2), size(syms) - 1),
      array(element_at(syms, 1)),
      (acc, x) =>
        when(element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))
    concat(lit(" "), array_join(folded, " "), lit(" "))
  }

  /** The DuckDB twin: unrolled rounds, each = pair-count agg + argmax +
    * a recursive CTE doing leftmost literal replace to fixpoint.
    */
  private def bpeOracle(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT l[i] || ' ' || l[i+1] AS pair, sum(cnt) AS c
         |  FROM (SELECT cnt, string_split(trim(s), ' ') AS l FROM v${i - 1}),
         |       unnest(range(1, len(l))) AS r(i)
         |  GROUP BY 1),
         |b$i AS (
         |  SELECT pair, c, string_split(pair, ' ')[1] AS lft, string_split(pair, ' ')[2] AS rgt
         |  FROM p$i ORDER BY c DESC, pair ASC LIMIT 1),
         |f$i(word, cnt, s) AS (
         |  SELECT word, cnt, s FROM v${i - 1}
         |  UNION ALL
  SELECT f.word, f.cnt, left(f.s, position((' ' || b.pair || ' ') IN f.s) - 1) || ' ' || b.lft || b.rgt || ' ' || substr(f.s, position((' ' || b.pair || ' ') IN f.s) + length(b.pair) + 2)
         |  FROM f$i f, b$i b
         |  WHERE position((' ' || b.pair || ' ') IN f.s) > 0),
         |v$i AS (
         |  SELECT f.word, f.cnt, f.s FROM f$i f, b$i b
         |  WHERE position((' ' || b.pair || ' ') IN f.s) = 0)""".stripMargin
    }
    val out = (1 to k)
      .map(i => s"SELECT $i AS step, lft, rgt, lft || rgt AS merged, c::BIGINT AS cnt FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE
       |words AS (
       |  SELECT w AS word, count(*)::BIGINT AS cnt
       |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t(w)
       |  GROUP BY 1),
       |v0 AS (SELECT word, cnt, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS s FROM words),
       |${rounds.mkString(",\n")}
       |SELECT * FROM (
       |$out) ORDER BY step""".stripMargin
  }

  def queries: Seq[Q] = Seq(

    Q("llm_bpe_train", bpeOracle(BpeRounds)) { (s, _) =>
      import s.implicits._
      // Corpus -> vocabulary: the ONLY pass whose cost scales with the
      // corpus. Everything after is vocab-sized.
      val v0 = s.table("documents")
        .select(wordCol.as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .select(col("cnt"), charSpaced(col("word")).as("s"))

      var vocab = v0.persist()
      val merges = ArrayBuffer.empty[(Int, String, String, String, Long)]
      val retired = ArrayBuffer.empty[DataFrame]
      try {
        for (step <- 1 to BpeRounds) {
          // One hash-agg over the vocab; argmax is a 1-row collect
          // (bounded driver metadata, like the k-means centroid pull).
          val best = vocab
            .select(col("cnt"), explode(pairsOf(col("s"))).as("pair"))
            .groupBy("pair").agg(sum("cnt").as("c"))
            .orderBy(col("c").desc, col("pair").asc)
            .limit(1).collect()(0)
          val pair = best.getString(0)
          val c = best.getLong(1)
          val Array(l, r) = pair.split(" ", 2)
          merges += ((step, l, r, l + r, c))
          // Materialize each round so lineage stays one fold deep
          // (six nested folds would still codegen, but a 50k-round
          // production run must truncate lineage every round).
          val next = vocab.select(col("cnt"), applyMerge(col("s"), l, r).as("s")).persist()
          next.count()
          retired += vocab
          vocab = next
        }
        merges.toSeq.toDF("step", "lft", "rgt", "merged", "cnt")
      } finally {
        retired.foreach(_.unpersist())
        vocab.unpersist()
      }
    },

    Q("llm_inverted_index",
      """WITH tf AS (
        |  SELECT w AS term, doc_id, count(*)::BIGINT AS tf
        |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t(w)
        |  GROUP BY 1, 2)
        |SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS total_tf,
        |       array_to_string(list(doc_id || ':' || tf ORDER BY doc_id), ' ') AS postings
        |FROM tf GROUP BY term
        |HAVING count(*) <= 10000
        |ORDER BY term""".stripMargin) { (s, _) =>
      val tf = s.table("documents")
        .select(col("doc_id").cast("long").as("doc_id"), wordCol.as("term"))
        .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      tf.groupBy("term")
        .agg(
          count(lit(1)).as("df"),
          sum("tf").as("total_tf"),
          array_join(
            transform(
              sort_array(collect_list(struct(col("doc_id"), col("tf")))),
              e => concat(e.getField("doc_id").cast("string"), lit(":"),
                e.getField("tf").cast("string"))),
            " ").as("postings"))
        // df-cap = the stop-term guard that bounds posting length at
        // scale (here every fixture term is under it).
        .filter(col("df") <= 10000)
        .orderBy("term")
    })
}
