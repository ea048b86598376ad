package graft.llm

import graft.engine.Engine.PinOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Q, QueryModule}

/** Training-data pipeline operators beyond dedup/ANN (BASELINE.json
  * north star): benchmark decontamination, PII redaction, repetition
  * quality signals, and greedy sequence packing. Each is a
  * deterministic, oracle-replayable pipeline over the `documents`
  * fixture, designed for the 100 TB shape first:
  *
  *  - decontaminate: eval-gram set is tiny vs the corpus -> broadcast
  *    semi-join on 8-byte gram hashes; one shuffle over training grams.
  *  - PII: pure per-row regexp chain, whole-stage codegen, no shuffle.
  *  - repetition: explode -> two-level hash agg, shuffle keyed on
  *    (doc, gram-hash) then doc — bounded by corpus token count.
  *  - packing: per-shard greedy fold via flatMapSortedGroups — one
  *    shuffle on the shard key, each shard streamed in sorted order
  *    with O(1) state (the same shape Spark uses for sessionization).
  */
object PipelineQueries extends QueryModule {

  /** (doc_id, 64-bit hash of each distinct word n-gram) — same kernel
    * family as LlmQueries' 5-gram shingles (mapPartitions, hashed keys
    * on the wire, not strings).
    */
  private[llm] def ngramHashRows(s: SparkSession, n: Int, distinct: Boolean): DataFrame = {
    import s.implicits._
    s.table("documents")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val w = text.split(" ", -1)
          if (w.length < n) Iterator.empty
          else {
            val seen = new scala.collection.mutable.HashSet[Long]
            val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](w.length - n + 1)
            var i = 0
            while (i <= w.length - n) {
              val sb = new java.lang.StringBuilder(w(i))
              var j = i + 1
              while (j < i + n) { sb.append('_').append(w(j)); j += 1 }
              val h = graft.functions.Hll.hashAny(
                org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
              if (!distinct || seen.add(h)) out += ((id, h))
              i += 1
            }
            out.iterator
          }
        }
      }.toDF("doc_id", "gh")
  }

  def queries: Seq[Q] = Seq(

    // Benchmark decontamination — the GPT-3 appendix-C procedure: a
    // training document is contaminated if it shares any 13-gram with
    // the eval set (here: every 20th doc stands in for the benchmark).
    // Engine joins on hashed grams (8 bytes/gram on the wire); the
    // eval side is corpus-fraction-small, so AQE broadcasts it and the
    // training grams are never shuffled — at 100 TB this is one scan +
    // one map-side semi join.
    Q("llm_decontaminate",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+12], '_')
        |        for i in generate_series(1, len(w)-12)])) AS s
        |      FROM toks WHERE len(w) >= 13),
        |ev AS (SELECT DISTINCT s FROM g WHERE doc_id % 20 = 0)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS shared_grams
        |FROM g JOIN ev USING (s) WHERE g.doc_id % 20 <> 0
        |GROUP BY g.doc_id""".stripMargin) { (s, _) =>
      val grams = ngramHashRows(s, 13, distinct = true)
      val ev = grams.filter(col("doc_id") % 20 === 0).select("gh").distinct()
      grams.filter(col("doc_id") % 20 =!= 0)
        .join(ev, "gh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("shared_grams"))
    },

    // Bloom-filter decontamination — the 100 TB-preferred physical plan
    // for the SAME logical result as llm_decontaminate (so it shares
    // that oracle): build a Bloom filter over the eval grams
    // (distributed agg, ~1.2 MB per 1M grams at 1% FPP, collected like
    // the reference's runtime filters in LocalDynamicFilter.java),
    // broadcast it, and kill ~99% of the training grams MAP-SIDE before
    // the exact semi-join — the training side's shuffle/probe volume
    // drops to the near-hit fraction, the one scan stays. The exact
    // join on survivors makes the output identical to the exact
    // procedure regardless of false positives.
    Q("llm_decontam_bloom",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+12], '_')
        |        for i in generate_series(1, len(w)-12)])) AS s
        |      FROM toks WHERE len(w) >= 13),
        |ev AS (SELECT DISTINCT s FROM g WHERE doc_id % 20 = 0)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS shared_grams
        |FROM g JOIN ev USING (s) WHERE g.doc_id % 20 <> 0
        |GROUP BY g.doc_id""".stripMargin) { (s, _) =>
      val grams = ngramHashRows(s, 13, distinct = true)
      val ev = grams.filter(col("doc_id") % 20 === 0).select("gh").distinct()
        .pinned() // bloom build + verify join reuse one materialization
      val nEval = ev.count()
      val bloom = ev.stat.bloomFilter("gh", math.max(1000L, nEval), 0.01)
      val bc = s.sparkContext.broadcast(bloom)
      val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
      grams.filter(col("doc_id") % 20 =!= 0)
        .filter(mightContain(col("gh")))
        .join(ev, "gh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("shared_grams"))
    },

    // PII detection/redaction — deterministic synthetic PII (derived
    // from doc_id so both engines construct identical text), then a
    // count + redact regexp chain. All three patterns are in the
    // Java-regex/RE2 common subset. Pure codegen'd per-row work: the
    // 100 TB cost is one scan, no shuffle.
    Q("llm_pii_redact",
      """WITH pii AS (SELECT doc_id,
        |    substr(text, 1, 40) || ' email user' || doc_id || '@example.com call 555-123-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.0.' ||
        |    CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
        |FROM pii""".stripMargin) { (s, _) =>
      val emailP = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneP = "\\d{3}-\\d{3}-\\d{4}"
      val ipP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val t = concat(
        substring(col("text"), 1, 40), lit(" email user"), col("doc_id").cast("string"),
        lit("@example.com call 555-123-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
        lit("."), (col("doc_id") * 7 % 256).cast("string"))
      val afterEmailPhone = regexp_replace(
        regexp_replace(t, emailP, "<EMAIL>"), phoneP, "<PHONE>")
      s.table("documents").select(
        col("doc_id"),
        regexp_count(t, lit(emailP)).as("n_email"),
        regexp_count(t, lit(phoneP)).as("n_phone"),
        regexp_count(afterEmailPhone, lit(ipP)).as("n_ip"),
        regexp_replace(afterEmailPhone, ipP, "<IP>").as("redacted"))
    },

    // Repetition quality signals — the Gopher/MassiveText repetition
    // filters: duplicate-word fraction and most-frequent-bigram
    // fraction per document. Bigrams flow as hashed keys through two
    // hash aggregations (doc×gram, then doc) — scale is bounded by
    // token count, no joins wider than the corpus itself.
    Q("llm_repetition_signals",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |words AS (SELECT doc_id, len(w) AS total, len(list_distinct(w)) AS uniq
        |          FROM toks WHERE len(w) >= 2),
        |bi AS (SELECT doc_id, unnest([w[i] || '_' || w[i+1]
        |         for i in generate_series(1, len(w)-1)]) AS b FROM toks WHERE len(w) >= 2),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bi GROUP BY 1, 2),
        |tb AS (SELECT doc_id, max(c) AS topc, sum(c) AS totc FROM bc GROUP BY 1)
        |SELECT w.doc_id,
        |  1.0 - uniq * 1.0 / total AS dup_word_frac,
        |  topc * 1.0 / totc AS top_bigram_frac
        |FROM words w JOIN tb ON w.doc_id = tb.doc_id""".stripMargin) { (s, _) =>
      val words = s.table("documents")
        .select(col("doc_id").cast("long").as("doc_id"), split(col("text"), " ", -1).as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), size(col("w")).as("total"),
          size(array_distinct(col("w"))).as("uniq"))
      val bigrams = ngramHashRows(s, 2, distinct = false)
        .groupBy("doc_id", "gh").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("topc"), sum("c").as("totc"))
      words.join(bigrams, "doc_id").select(
        col("doc_id"),
        (lit(1.0) - col("uniq") * lit(1.0) / col("total")).as("dup_word_frac"),
        (col("topc") * lit(1.0) / col("totc")).as("top_bigram_frac"))
    },

    // Greedy sequence packing — fill 512-token training sequences with
    // whole documents, per source shard in doc_id order (never
    // splitting a document; oversized docs get a bin alone). One
    // shuffle on the shard key; each shard is streamed sorted with
    // O(1) fold state (flatMapSortedGroups), so shard size is
    // unbounded. The oracle replays the identical greedy fold as a
    // recursive CTE.
    Q("llm_sequence_pack",
      """WITH RECURSIVE ord AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS n,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |pack AS (
        |  SELECT doc_id, source, rn, n,
        |         CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS tok_offset, n AS fill
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.doc_id, o.source, o.rn, o.n,
        |    CASE WHEN p.fill + o.n <= 512 THEN p.seq_id ELSE p.seq_id + 1 END,
        |    CASE WHEN p.fill + o.n <= 512 THEN p.fill ELSE CAST(0 AS BIGINT) END,
        |    CASE WHEN p.fill + o.n <= 512 THEN p.fill + o.n ELSE o.n END
        |  FROM ord o JOIN pack p ON o.source = p.source AND o.rn = p.rn + 1)
        |SELECT doc_id, source, seq_id, tok_offset,
        |  CAST(n AS BIGINT) AS n_tokens
        |FROM pack""".stripMargin) { (s, _) =>
      import s.implicits._
      val capacity = 512L
      s.table("documents")
        .select(col("doc_id").cast("long"), col("source"),
          size(split(col("text"), " ", -1)).cast("long").as("n"))
        .as[(Long, String, Long)]
        .groupByKey(_._2)
        .flatMapSortedGroups(col("doc_id")) { case (source, docs) =>
          var seqId = 0L
          var fill = -1L // -1 = no open sequence yet
          docs.map { case (docId, _, n) =>
            if (fill < 0 || fill + n > capacity) {
              if (fill >= 0) seqId += 1
              fill = 0L
            }
            val off = fill
            fill += n
            (docId, source, seqId, off, n)
          }
        }
        .toDF("doc_id", "source", "seq_id", "tok_offset", "n_tokens")
    },

    // Temperature-scaled domain mixing — the multilingual-LM sampling
    // scheme (XLM-R/mT5: sample domain i with probability proportional
    // to (n_i/N)^alpha, alpha<1 upweights low-resource domains). With a
    // fixed output budget B the per-domain keep rate is
    // r_i = min(1, B * q_i / n_i), q_i = n_i^alpha / sum n_j^alpha
    // (alpha = 0.5 here, so sqrt — bit-identical in both engines).
    // Per-doc keep is a DETERMINISTIC hash Bernoulli (Knuth
    // multiplicative on doc_id), so the sample is reproducible and
    // oracle-replayable at any scale: one tiny per-domain aggregate,
    // broadcast-joined back, then a map-side filter — no shuffle of the
    // corpus, no rand() nondeterminism.
    Q("llm_mixture_sample",
      """WITH stats AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |tot AS (SELECT sum(n) AS n_total, sum(sqrt(n)) AS z FROM stats),
        |rates AS (
        |  SELECT s.source,
        |         least(1.0, 0.3 * t.n_total * (sqrt(s.n) / t.z) / s.n) AS keep_rate
        |  FROM stats s, tot t)
        |SELECT d.doc_id, d.source, round(r.keep_rate, 6) AS keep_rate
        |FROM documents d JOIN rates r ON d.source = r.source
        |WHERE ((d.doc_id * 2654435761) % 1000000) / 1000000.0 < r.keep_rate""".stripMargin) { (s, _) =>
      val docs = s.table("documents").select(col("doc_id"), col("source"))
      val stats = docs.groupBy("source").agg(count(lit(1)).as("n"))
      val tot = stats.agg(sum("n").as("n_total"), sum(sqrt(col("n"))).as("z"))
      val rates = stats.crossJoin(broadcast(tot))
        .select(col("source"),
          least(lit(1.0), lit(0.3) * col("n_total") * (sqrt(col("n")) / col("z")) / col("n"))
            .as("keep_rate"))
      docs.join(broadcast(rates), "source")
        .filter((col("doc_id") * 2654435761L % 1000000L) / 1000000.0 < col("keep_rate"))
        .select(col("doc_id"), col("source"), round(col("keep_rate"), 6).as("keep_rate"))
    },

    // Token-budget corpus selection — keep the highest-quality documents
    // until a token budget is exhausted (the data-selection step before
    // training: rank by score, take the prefix that fits). The oracle is
    // a single global window cumsum; the engine side computes the SAME
    // prefix sum distributed: range-partition by the rank order, one
    // O(partitions) aggregate of per-partition token totals, broadcast
    // the exclusive prefix offsets back, then a partition-local
    // streaming cumsum — no single-partition window, no global sort
    // bottleneck (the 100 TB shape; partition count scales freely).
    // Score = mean word length (deterministic, exact in double); doc_id
    // breaks ties so the order — and thus the kept set — is total.
    Q("llm_token_budget_select",
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
        |         n_chars * 1.0 / len(string_split(text, ' ')) AS score
        |  FROM documents),
        |b AS (SELECT 0.25 * sum(n_tok) AS budget FROM t),
        |c AS (SELECT doc_id, n_tok, score,
        |        sum(n_tok) OVER (ORDER BY score DESC, doc_id) AS cum
        |      FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, round(score, 6) AS score
        |FROM c, b WHERE cum <= budget""".stripMargin) { (s, _) =>
      import s.implicits._
      val t = s.table("documents").select(
        col("doc_id").cast("long").as("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tok"),
        (col("n_chars") * 1.0 / size(split(col("text"), " ", -1))).as("score"))
      val budget = 0.25 * t.agg(sum("n_tok")).head().getLong(0)
      val parts = math.max(1, s.sparkContext.defaultParallelism / 2)
      // ONE RDD instance for both passes: the range boundaries are
      // sampled when this DAG is built, and the second pass reuses the
      // same shuffle (stage skipped), so offsets and data can't drift.
      val rankedRdd = t.repartitionByRange(parts, col("score").desc, col("doc_id"))
        .sortWithinPartitions(col("score").desc, col("doc_id"))
        .as[(Long, Long, Double)].rdd
      // exclusive prefix offset per partition: O(partitions) driver state
      val partTotals = rankedRdd
        .mapPartitionsWithIndex { case (pid, it) =>
          Iterator((pid, it.map(_._2).sum))
        }.collect().sortBy(_._1).map(_._2)
      val offsets = partTotals.scanLeft(0L)(_ + _)
      val bcOff = s.sparkContext.broadcast(offsets)
      val kept = rankedRdd.mapPartitionsWithIndex { case (pid, it) =>
        var cum = bcOff.value(pid)
        it.flatMap { case (id, n, sc) =>
          cum += n
          if (cum <= budget) Some((id, n, sc)) else None
        }
      }
      s.createDataFrame(kept).toDF("doc_id", "n_tok", "score")
        .select(col("doc_id"), col("n_tok"),
          round(col("score"), 6).as("score"))
    },

    // Deterministic stratified train/val/test split — the
    // reproducibility primitive every training pipeline needs: a doc's
    // split must be a pure function of its id (re-runs, backfills and
    // incremental ingests all see the same assignment; no shared state,
    // no coordination). Assignment: Knuth multiplicative scramble
    // h = ((doc_id mod 2^31) * 2654435761) mod 2^32 — the mod-2^31
    // reduction first keeps the product under 2^63 for ANY doc_id, so
    // the arithmetic is exact BIGINT on both engines (without it,
    // doc_id > ~3.47e9 wraps silently in Spark but errors in DuckDB) —
    // then h mod 10 -> 0-7 train / 8 val / 9 test, so
    // fractions converge to 80/10/10 per stratum without any per-domain
    // global rank — the exact-quota alternative is a per-lang window
    // sort, which funnels each stratum through one task at 100 TB
    // (the WindowQueries funnel rule) for a quota error the law of
    // large numbers already bounds at ~1/sqrt(n) per stratum. Output is
    // the per-(lang, split) census with min/max scrambled hash as the
    // determinism witness; the per-doc assignment is the same map-side
    // expression. Zero joins, one linear keyed agg.
    Q.sameSql("llm_train_val_split",
      """WITH a AS (
        |  SELECT doc_id, lang,
        |    ((doc_id % 2147483648) * 2654435761) % 4294967296 AS h,
        |    CASE WHEN ((doc_id % 2147483648) * 2654435761) % 4294967296 % 10 < 8
        |           THEN 'train'
        |         WHEN ((doc_id % 2147483648) * 2654435761) % 4294967296 % 10 = 8
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(h) AS BIGINT) AS min_h, CAST(max(h) AS BIGINT) AS max_h
        |FROM a GROUP BY lang, split""".stripMargin),

    // DoReMi-style domain reweighting (Xie et al. 2023): one
    // exponentiated-gradient update of the domain mixture — per-domain
    // excess loss (unigram-LM surprise vs the easiest domain, the
    // proxy-model role) exponentiated, normalized, then smoothed with
    // the uniform mixture (the paper's (1-c)·α + c·u step, c = 0.1).
    // Output is the per-domain sampling weight and its ppm token
    // budget — the numbers a mixture-sampling stage (llm_mixture_sample)
    // consumes. Determinism across engines: per-document surprise is
    // fixed to INTEGER micro-nats (half-up at 6dp), so the domain
    // average is an exact integer sum at any parallelism; exp() outputs
    // are quantized half-up at 6dp before normalizing (the repo's
    // libm-boundary policy). Scale shape: one vocab hash-agg + one
    // doc-keyed agg (both linear in corpus tokens), then everything is
    // |domains|-sized — two broadcasts, no driver state beyond scalars.
    Q("llm_doremi_reweight",
      """WITH toks AS (SELECT doc_id, lang, w
        |  FROM documents, unnest(string_split(text, ' ')) AS t(w) WHERE w <> ''),
        |vocab AS (SELECT w, count(*)::BIGINT AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS t FROM toks),
        |docsur AS (SELECT doc_id, lang,
        |    CAST(floor((-sum(ln(cnt::DOUBLE / t)) / count(*)) * 1000000 + 0.5) AS BIGINT) AS sur6
        |  FROM toks JOIN vocab USING (w) CROSS JOIN tot GROUP BY doc_id, lang),
        |dom AS (SELECT lang, count(*)::BIGINT AS n_docs,
        |    round(sum(sur6) * CAST(1 AS DOUBLE) / count(*) / 1000000, 6) AS avg_surprise
        |  FROM docsur GROUP BY lang),
        |mn AS (SELECT min(avg_surprise) AS m FROM dom),
        |e AS (SELECT lang, n_docs, avg_surprise,
        |    floor(exp(avg_surprise - m) * 1000000 + 0.5) / 1000000 AS ex FROM dom, mn),
        |z AS (SELECT sum(ex) AS z, count(*)::BIGINT AS nd FROM e)
        |SELECT lang, n_docs, avg_surprise,
        |  round(CAST(0.9 AS DOUBLE) * ex / z + CAST(0.1 AS DOUBLE) / nd, 6) AS weight,
        |  CAST(floor((CAST(0.9 AS DOUBLE) * ex / z + CAST(0.1 AS DOUBLE) / nd) * 1000000)
        |    AS BIGINT) AS token_budget_ppm
        |FROM e, z""".stripMargin) { (s, _) =>
      val toks = s.table("documents").select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ", -1)).as("w"))
        .filter(col("w") =!= "")
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      val tot = toks.agg(count(lit(1)).as("t"))
      // no broadcast hint on vocab — it grows with corpus vocabulary;
      // stats/AQE pick broadcast while it fits and shuffle at 100 TB
      // (`tot` is one row, safe to pin)
      val docsur = toks.join(vocab, "w").crossJoin(broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(floor((-sum(log(col("cnt").cast("double") / col("t"))) / count(lit(1)))
          * lit(1000000.0d) + lit(0.5d)).cast("long").as("sur6"))
      val dom = docsur.groupBy("lang").agg(count(lit(1)).as("n_docs"),
        round(sum("sur6").cast("double") / count(lit(1)) / lit(1000000.0d), 6)
          .as("avg_surprise"))
      val mn = dom.agg(min("avg_surprise").as("m"))
      val e = dom.crossJoin(broadcast(mn))
        .withColumn("ex",
          floor(exp(col("avg_surprise") - col("m")) * lit(1000000.0d) + lit(0.5d))
            / lit(1000000.0d))
      val z = e.agg(sum("ex").as("z"), count(lit(1)).as("nd"))
      val w = lit(0.9d) * col("ex") / col("z") + lit(0.1d) / col("nd")
      e.crossJoin(broadcast(z))
        .select(col("lang"), col("n_docs"), col("avg_surprise"),
          round(w, 6).as("weight"),
          floor(w * lit(1000000.0d)).cast("long").as("token_budget_ppm"))
    })
}
