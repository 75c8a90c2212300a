package graft.queries

import org.apache.spark.sql.functions._

import graft.QDef
import graft.ext.Pipeline
import graft.ext.TextHash.Sql
import graft.model.{Fixtures, Tables}

/** E17–E22: corpus-preparation operators (SURVEY §2.10 — splits,
  * samples, packing, decontamination, PII scrubbing). Every oracle is a
  * complete independent DuckDB twin built from the same portable
  * [[graft.ext.TextHash]] primitives; the packing oracle replays the
  * sequential next-fit fold as a recursive CTE.
  */
object PipelineQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, s"$dir/documents.parquet")

  private def h48doc(salt: String) =
    Sql.hash48("CAST(doc_id AS VARCHAR)", s"'$salt'")

  /** e28's declared target mixture (exact binary fractions; declared
    * BEFORE `defs`, which captures it at object init). */
  private val ReweightTargets: Map[String, Double] =
    Map("src0" -> 0.25, "src1" -> 0.25) ++
      (2 to 17).map(i => s"src$i" -> 0.03125).toMap

  /** Declared BPE merge-round count (e56 train / e62 encode). */
  private val BpeRounds = 3

  /** Shared oracle CTE chain for BPE training (e56/e62): word-freq
    * table w0 (double-space-delimited symbol strings), then per round
    * r: pair counts p_r, the winning pair win_r (max count, tie → pair
    * asc), and the merged word table w_r. */
  private def bpeCtes(rounds: Int): String = {
    val w0 =
      s"""w0 AS (
         |  SELECT CAST(cnt AS BIGINT) AS cnt,
         |         regexp_replace(tok, '(.)', ' \\1 ', 'g') AS sym
         |  FROM (SELECT tok, COUNT(*) AS cnt FROM (
         |          SELECT unnest(${Sql.tokens("COALESCE(text, '')")}) AS tok
         |          FROM documents) WHERE tok <> '' GROUP BY tok))""".stripMargin
    val stages = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT pr, CAST(SUM(cnt) AS BIGINT) AS n FROM (
         |    SELECT cnt, unnest(${Sql.shingles("syms", 2)}) AS pr
         |    FROM (SELECT cnt, string_split(trim(sym), '  ') AS syms FROM w${r - 1}))
         |  GROUP BY pr),
         |win$r AS (SELECT pr, n FROM p$r ORDER BY n DESC, pr LIMIT 1),
         |w$r AS (
         |  SELECT cnt, replace(sym, ' ' || replace(win$r.pr, ' ', '  ') || ' ',
         |                      ' ' || replace(win$r.pr, ' ', '') || ' ') AS sym
         |  FROM w${r - 1} CROSS JOIN win$r)""".stripMargin
    }
    (w0 +: stages).mkString(",\n")
  }

  /** Shared e62/e71 oracle: re-derive the merge table (same CTEs) and
    * apply the same nested delimiter-framed replaces to every word —
    * the store-backed encode (e71) is byte-identical to the in-session
    * encode (e62) on the training corpus, so both pin against this. */
  private lazy val BpeEncodeOracle: String = {
    val sym0 = "regexp_replace(tok, '(.)', ' \\1 ', 'g')"
    // a dried-up round (empty win_r) is a guarded NO-OP, mirroring the
    // Spark side's null-safe 1-row winner aggregates: LEFT JOIN keeps
    // the word stream, CASE skips the absent round's replace
    val applied = (1 to BpeRounds).foldLeft(sym0) { (acc, r) =>
      s"""CASE WHEN win$r.pr IS NULL THEN $acc
         |     ELSE replace($acc, ' ' || replace(win$r.pr, ' ', '  ') || ' ',
         |                  ' ' || replace(win$r.pr, ' ', '') || ' ') END""".stripMargin
    }
    val crosses = (1 to BpeRounds).map(r => s"LEFT JOIN win$r ON TRUE").mkString(" ")
    s"""WITH ${bpeCtes(BpeRounds)},
       |tk AS (SELECT doc_id, tok FROM (
       |         SELECT doc_id, unnest(${Sql.tokens("COALESCE(text, '')")}) AS tok
       |         FROM documents) WHERE tok <> ''),
       |enc AS (SELECT doc_id, tok, $applied AS sym FROM tk $crosses)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |       CAST(SUM(length(tok)) AS BIGINT) AS n_chars,
       |       CAST(SUM(len(string_split(trim(sym), '  '))) AS BIGINT) AS n_bpe
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QDef] = Seq(
    QDef(
      "e17_train_split",
      (s, dir) =>
        Pipeline.trainSplit(docs(s, dir))
          .select(col("doc_id"), col("bucket"), col("split"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, CAST(b AS INT) AS bucket,
              |       CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
              |            ELSE 'test' END AS split
              |FROM (SELECT doc_id, ${h48doc("split")} % 100 AS b FROM documents)
              |ORDER BY doc_id""".stripMargin)
    ),
    QDef(
      "e18_seq_packing",
      (s, dir) =>
        Pipeline.packSequences(docs(s, dir), capacity = 512, shards = 8)
          .orderBy("shard", "doc_id"),
      // the sequential next-fit fold, replayed as a recursive CTE that
      // advances one document per shard per iteration
      Some(s"""WITH RECURSIVE d0 AS (
              |  SELECT doc_id, CAST(${h48doc("shard")} % 8 AS INT) AS shard,
              |         CAST(len(${Sql.tokens("COALESCE(text, '')")}) AS BIGINT) AS n_tokens
              |  FROM documents
              |), d AS (
              |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM d0
              |), rec AS (
              |  SELECT shard, rn, doc_id, n_tokens,
              |         CAST(0 AS BIGINT) AS pack_id, n_tokens AS pack_fill
              |  FROM d WHERE rn = 1
              |  UNION ALL
              |  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
              |         CASE WHEN r.pack_fill + d.n_tokens > 512
              |              THEN r.pack_id + 1 ELSE r.pack_id END,
              |         CASE WHEN r.pack_fill + d.n_tokens > 512
              |              THEN d.n_tokens ELSE r.pack_fill + d.n_tokens END
              |  FROM rec r JOIN d ON d.shard = r.shard AND d.rn = r.rn + 1
              |)
              |SELECT shard, doc_id, n_tokens, pack_id, pack_fill
              |FROM rec ORDER BY shard, doc_id""".stripMargin)
    ),
    QDef(
      "e19_pii_scrub",
      (s, dir) =>
        Pipeline.piiScrub(Fixtures.eventsRaw(s, dir), "event_id", "props")
          .orderBy("event_id"),
      Some {
        def rep(src: String, re: String, to: String) =
          s"regexp_replace($src, '$re', '$to', 'g')"
        def cnt(src: String, re: String) =
          s"CAST(len(regexp_extract_all($src, '$re')) AS INT)"
        val s1 = rep("props", Pipeline.EmailRe, "<EMAIL>")
        val s2 = rep(s1, Pipeline.Ipv4Re, "<IP>")
        val s3 = rep(s2, Pipeline.NumRe, "<NUM>")
        s"""SELECT event_id, $s3 AS clean,
           |       ${cnt("props", Pipeline.EmailRe)} AS n_email,
           |       ${cnt(s1, Pipeline.Ipv4Re)} AS n_ip,
           |       ${cnt(s2, Pipeline.NumRe)} AS n_num
           |FROM events ORDER BY event_id""".stripMargin
      }
    ),
    QDef(
      "e20_decontamination",
      (s, dir) =>
        Pipeline.decontaminate(docs(s, dir), col("doc_id") % 50 === 0,
            n = 5, minShared = 2)
          .orderBy("train_id", "bench_id"),
      Some(s"""WITH sh5 AS (
              |  SELECT DISTINCT doc_id, unnest(${Sql.shingles("toks", 5)}) AS sh
              |  FROM (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents)
              |), hh AS (SELECT doc_id, ${Sql.hash48("sh", "'decon'")} AS h FROM sh5),
              |b AS (SELECT doc_id AS bench_id, h FROM hh WHERE doc_id % 50 = 0),
              |t AS (SELECT doc_id AS train_id, h FROM hh WHERE doc_id % 50 <> 0)
              |SELECT train_id, bench_id, COUNT(*) AS shared
              |FROM t JOIN b USING (h)
              |GROUP BY 1, 2 HAVING COUNT(*) >= 2
              |ORDER BY 1, 2""".stripMargin)
    ),
    QDef(
      "e21_stratified_sample",
      (s, dir) =>
        Pipeline.stratifiedSample(docs(s, dir), col("lang"), 0.2)
          .select(col("doc_id"), col("lang"))
          .orderBy("lang", "doc_id"),
      Some(s"""SELECT doc_id, lang FROM (
              |  SELECT doc_id, lang,
              |         row_number() OVER (PARTITION BY lang
              |           ORDER BY ${h48doc("sample")}, doc_id) AS rn,
              |         COUNT(*) OVER (PARTITION BY lang) AS n
              |  FROM documents
              |) WHERE rn <= CEIL(n * 0.2) ORDER BY lang, doc_id""".stripMargin)
    ),
    QDef(
      "e22_hash_sample",
      (s, dir) =>
        Pipeline.hashSample(docs(s, dir), 0.1)
          .select(col("doc_id"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id FROM documents
              |WHERE ${h48doc("sample")} < ${(0.1 * (1L << 48)).toLong}
              |ORDER BY doc_id""".stripMargin)
    ),
    QDef(
      "e23_repetition",
      (s, dir) =>
        graft.ext.TextAnalysis.repetitionSignals(docs(s, dir))
          .orderBy("doc_id"),
      Some(s"""WITH t AS (
              |  SELECT doc_id, ${Sql.tokens("COALESCE(text, '')")} AS toks FROM documents
              |), g AS (
              |  SELECT doc_id, toks,
              |         ${Sql.shingles("toks", 2)} AS g2,
              |         ${Sql.shingles("toks", 3)} AS g3
              |  FROM t
              |)
              |SELECT doc_id,
              |       CAST(len(toks) AS BIGINT) AS n_tokens,
              |       CAST(list_max(list_transform(list_distinct(toks),
              |         w -> len(list_filter(toks, x -> x = w)))) AS BIGINT) AS top_word_n,
              |       CAST(len(g2) - len(list_distinct(g2)) AS BIGINT) AS dup_2gram_n,
              |       CAST(len(g3) - len(list_distinct(g3)) AS BIGINT) AS dup_3gram_n
              |FROM g ORDER BY doc_id""".stripMargin)
    ),
    QDef(
      "e24_domain_cap",
      (s, dir) =>
        Pipeline.domainCap(docs(s, dir), col("source"), cap = 50)
          .select(col("doc_id"), col("source"))
          .orderBy("source", "doc_id"),
      // single-window oracle: the two-level Spark plan selects the same
      // top-cap rows per domain (level 1 only pre-prunes within buckets)
      Some(s"""SELECT doc_id, source FROM (
              |  SELECT doc_id, source,
              |         row_number() OVER (PARTITION BY source
              |           ORDER BY ${h48doc("cap")}, doc_id) AS rn
              |  FROM documents
              |) WHERE rn <= 50 ORDER BY source, doc_id""".stripMargin)
    ),
    QDef(
      "e25_unigram_logprob",
      (s, dir) =>
        graft.ext.TextAnalysis.unigramLogProb(docs(s, dir))
          .orderBy("doc_id"),
      // FLOOR(ln p * 1e6) integer sums — order-independent, same
      // quantization as the Spark side (and the k-means oracle)
      Some(s"""WITH p AS (
              |  SELECT doc_id, unnest(${Sql.tokens("text")}) AS tok FROM documents
              |), v AS (
              |  SELECT tok, COUNT(*) AS cnt FROM p GROUP BY tok
              |), tt AS (SELECT SUM(cnt) AS tot FROM v)
              |SELECT p.doc_id, COUNT(*) AS n_tokens,
              |       ROUND(SUM((CAST(FLOOR(1000.0 * ln(CAST(v.cnt AS DOUBLE)) + 0.5) AS BIGINT) - CAST(FLOOR(1000.0 * ln(CAST(tt.tot AS DOUBLE)) + 0.5) AS BIGINT)) * 1000)
              |             / (COUNT(*) * 1000000.0), 4) AS avg_logp
              |FROM p JOIN v USING (tok) CROSS JOIN tt
              |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin)
    ),
    QDef(
      "e27_bigram_logprob",
      (s, dir) =>
        graft.ext.TextAnalysis.bigramLogProb(docs(s, dir))
          .orderBy("doc_id"),
      Some(s"""WITH t AS (
              |  SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents
              |), g AS (
              |  SELECT doc_id, unnest(${Sql.shingles("toks", 2)}) AS bg FROM t
              |), g2 AS (
              |  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM g
              |), b AS (SELECT bg, COUNT(*) AS c2 FROM g2 GROUP BY bg),
              |u AS (SELECT w1, COUNT(*) AS c1 FROM g2 GROUP BY w1)
              |SELECT doc_id, COUNT(*) AS n_bigrams,
              |       ROUND(SUM((CAST(FLOOR(1000.0 * ln(CAST(c2 AS DOUBLE)) + 0.5) AS BIGINT) - CAST(FLOOR(1000.0 * ln(CAST(c1 AS DOUBLE)) + 0.5) AS BIGINT)) * 1000)
              |             / (COUNT(*) * 1000000.0), 4) AS avg_logp
              |FROM g2 JOIN b USING (bg) JOIN u USING (w1)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    QDef(
      "e28_domain_reweight",
      // target mixture: src0/src1 at 25% each, src2..src17 at 3.125%
      // (exact binary fractions — the SQL literals are bit-exact
      // doubles); src18/src19 unweighted and therefore dropped
      (s, dir) =>
        Pipeline.domainReweight(docs(s, dir), ReweightTargets)
          .select(col("doc_id"), col("source"))
          .orderBy("source", "doc_id"),
      Some {
        val vals = ReweightTargets.toSeq.sortBy(_._1)
          .map { case (d, w) => s"('$d', CAST($w AS DOUBLE))" }.mkString(", ")
        s"""WITH w(source, w) AS (VALUES $vals),
           |c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
           |cw AS (SELECT c.source, c.n, w.w FROM c JOIN w USING (source)),
           |k AS (SELECT MIN(n / w) AS k FROM cw),
           |f AS (SELECT source, LEAST(CAST(1.0 AS DOUBLE), w * k.k / n) AS f
           |      FROM cw CROSS JOIN k)
           |SELECT d.doc_id, d.source FROM documents d JOIN f USING (source)
           |WHERE ${h48doc("reweight")} < CAST(FLOOR(f * 281474976710656.0) AS BIGINT)
           |ORDER BY d.source, d.doc_id""".stripMargin
      }
    ),
    QDef(
      // Fixed-width overlapping token chunking (RAG / context-window
      // prep): width 64, stride 48 — consecutive chunks overlap by 16
      // tokens; chunk_hash is the downstream dedup/join key. Map-side
      // tokenize + per-doc index-range explode; linear in corpus size.
      "e35_doc_chunking",
      (s, dir) =>
        Pipeline.chunkDocs(docs(s, dir), width = 64, stride = 48)
          .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH t AS (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents),
              |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t),
              |c AS (SELECT doc_id, toks, 1 + (GREATEST(n - 64, 0) + 47) // 48 AS n_chunks FROM n),
              |x AS (SELECT doc_id, toks, UNNEST(range(n_chunks)) AS i FROM c),
              |s AS (SELECT doc_id, i AS chunk_idx,
              |             list_slice(toks, i * 48 + 1, i * 48 + 64) AS chunk FROM x)
              |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS chunk_len,
              |       md5(array_to_string(chunk, ' ')) AS chunk_hash
              |FROM s ORDER BY doc_id, chunk_idx""".stripMargin)
    ),
    QDef(
      // URL canonicalization + URL-level dedup (the Common-Crawl-style
      // pre-text dedup pass). The messy URL fixture is derived
      // deterministically from (source, doc_id): uppercase scheme/host
      // noise, www., explicit default port, a utm_ tracking param, a
      // trailing slash — distinct docs collapse when they share
      // (source, doc_id%25, doc_id%100) after normalization, which the
      // oracle reproduces with the same canonicalization in SQL.
      "e36_url_dedup",
      (s, dir) => {
        val url = format_string(
          "HTTPS://WWW.%s.Example.COM:443/p/%d/?utm_source=s%d&id=%d",
          col("source"), pmod(col("doc_id"), lit(25)),
          pmod(col("doc_id"), lit(3)), pmod(col("doc_id"), lit(100)))
        Pipeline.urlDedup(docs(s, dir).withColumn("url", url), col("url"))
          .orderBy("canon_url")
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |         printf('HTTPS://WWW.%s.Example.COM:443/p/%d/?utm_source=s%d&id=%d',
             |                source, doc_id % 25, doc_id % 3, doc_id % 100) AS url
             |  FROM documents),
             |p AS (
             |  SELECT doc_id,
             |         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\??([^#]*).*$', 1)) AS scheme,
             |         regexp_replace(lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\??([^#]*).*$', 2)), '^www\.', '') AS bare,
             |         regexp_replace(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\??([^#]*).*$', 3), '/+$', '') AS path,
             |         regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\??([^#]*).*$', 4) AS q
             |  FROM u),
             |c AS (
             |  SELECT doc_id,
             |         scheme || '://' ||
             |         (CASE WHEN scheme = 'https' THEN regexp_replace(bare, ':443$', '')
             |               WHEN scheme = 'http' THEN regexp_replace(bare, ':80$', '')
             |               ELSE bare END) || path ||
             |         (CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) AS canon_url
             |  FROM (SELECT *, array_to_string(list_sort(list_filter(string_split(q, '&'),
             |                    x -> x <> '' AND NOT regexp_matches(x, '^utm_'))), '&') AS cq
             |        FROM p))
             |SELECT canon_url, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
             |FROM c GROUP BY canon_url ORDER BY canon_url""".stripMargin)
    ),
    QDef(
      // deterministic global training shuffle + sharding: salted-hash
      // position, shard = hash mod n, within-shard (hash, id) order —
      // reproducible across runs, independent across salts
      // (Pipeline.shardShuffle scaladoc).
      "e40_shard_shuffle",
      (s, dir) =>
        Pipeline.shardShuffle(docs(s, dir), nShards = 8)
          .select("doc_id", "shard", "pos")
          .orderBy("shard", "pos"),
      Some(s"""SELECT doc_id, shard, pos FROM (
              |  SELECT doc_id, shard,
              |         row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
              |  FROM (SELECT doc_id, h, CAST(h % 8 AS INT) AS shard
              |        FROM (SELECT doc_id, ${h48doc("shuffle")} AS h FROM documents)))
              |ORDER BY shard, pos""".stripMargin)
    ),
    QDef(
      // quality-ranked token budgeting: per source, keep the best
      // prefix (quality desc, id) whose running token sum fits the
      // budget (Pipeline.tokenBudget scaladoc).
      "e41_token_budget",
      (s, dir) =>
        Pipeline.tokenBudget(docs(s, dir), budgetTokens = 600L)
          .orderBy("doc_id"),
      Some {
        val stop = graft.ext.TextAnalysis.profiles.flatMap(_._2).map { t =>
          s"CAST((length(p) - length(replace(p, '$t', ''))) / ${t.length} AS BIGINT)"
        }.mkString(" + ")
        s"""WITH q AS (
           |  SELECT doc_id, source, n_tokens,
           |         ROUND(LEAST(1.0, n_tokens / 100.0) * (1 - stop_hits * 1.0 / n_tokens), 4) AS quality
           |  FROM (
           |    SELECT doc_id, source,
           |           CAST(len(${Sql.tokens("COALESCE(text, '')")}) AS BIGINT) AS n_tokens,
           |           $stop AS stop_hits
           |    FROM (SELECT doc_id, source, text, ' ' || ${Sql.normText("text")} || ' ' AS p FROM documents))),
           |r AS (
           |  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY quality DESC, doc_id
           |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
           |  FROM q)
           |SELECT doc_id, source, quality, n_tokens, cum_tokens, cum_tokens <= 600 AS kept
           |FROM r ORDER BY doc_id""".stripMargin
      }
    ),
    QDef(
      // the Gopher-rules quality bundle: five integer-exact rule
      // verdicts + the composite keep (TextAnalysis.gopherRules
      // scaladoc) — the production filter stack as ONE declared query.
      "e42_gopher_rules",
      (s, dir) =>
        graft.ext.TextAnalysis.gopherRules(docs(s, dir), minWords = 20)
          .orderBy("doc_id"),
      Some {
        val stop = graft.ext.TextAnalysis.profiles.flatMap(_._2).map { t =>
          s"CAST((length(p) - length(replace(p, '$t', ''))) / ${t.length} AS BIGINT)"
        }.mkString(" + ")
        s"""WITH t AS (
           |  SELECT doc_id, ${Sql.tokens("COALESCE(text, '')")} AS toks,
           |         ' ' || ${Sql.normText("text")} || ' ' AS p,
           |         CAST(length(regexp_replace(${Sql.normText("COALESCE(text, '')")}, '[^a-z0-9]', '', 'g')) AS BIGINT) AS alpha
           |  FROM documents
           |), g AS (
           |  SELECT doc_id, toks, alpha, CAST(len(toks) AS BIGINT) AS n,
           |         ${Sql.shingles("toks", 2)} AS g2, $stop AS stop_hits
           |  FROM t
           |), v AS (
           |  SELECT doc_id, n AS n_tokens,
           |         n BETWEEN 20 AND 100000 AS r_words,
           |         3 * n <= alpha AND alpha <= 10 * n AS r_mean_len,
           |         CAST(list_max(list_transform(list_distinct(toks),
           |           w -> len(list_filter(toks, x -> x = w)))) AS BIGINT) * 5 <= n AS r_top,
           |         CAST(len(g2) - len(list_distinct(g2)) AS BIGINT) * 5 <= CAST(len(g2) AS BIGINT) AS r_dup2,
           |         stop_hits >= 2 AS r_stop
           |  FROM g)
           |SELECT *, r_words AND r_mean_len AND r_top AND r_dup2 AND r_stop AS keep
           |FROM v ORDER BY doc_id""".stripMargin
      }
    ),
    QDef(
      // per-source corpus report card: doc/token volume, exact-dup
      // rate, language mix, FLOOR-quantized mean quality
      // (TextAnalysis.corpusReport scaladoc).
      "e43_corpus_report",
      (s, dir) =>
        graft.ext.TextAnalysis.corpusReport(docs(s, dir))
          .orderBy("source"),
      Some {
        val stop = graft.ext.TextAnalysis.profiles.flatMap(_._2).map { t =>
          s"CAST((length(p) - length(replace(p, '$t', ''))) / ${t.length} AS BIGINT)"
        }.mkString(" + ")
        s"""WITH q AS (
           |  SELECT doc_id, ROUND(LEAST(1.0, n_tokens / 100.0) * (1 - stop_hits * 1.0 / n_tokens), 4) AS quality
           |  FROM (
           |    SELECT doc_id, CAST(len(${Sql.tokens("text")}) AS BIGINT) AS n_tokens, $stop AS stop_hits
           |    FROM (SELECT doc_id, text, ' ' || ${Sql.normText("text")} || ' ' AS p FROM documents))),
           |b AS (
           |  SELECT d.source, d.lang, q.quality,
           |         CAST(len(${Sql.tokens("COALESCE(d.text, '')")}) AS BIGINT) AS tok,
           |         md5(${Sql.normText("d.text")}) AS fp
           |  FROM documents d JOIN q ON q.doc_id = d.doc_id)
           |SELECT source, COUNT(*) AS n_docs,
           |       CAST(SUM(tok) AS BIGINT) AS n_tokens,
           |       COUNT(DISTINCT fp) AS uniq_docs,
           |       COUNT(*) - COUNT(DISTINCT fp) AS dups,
           |       COUNT(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
           |       COUNT(CASE WHEN lang <> 'en' THEN 1 END) AS n_other,
           |       ROUND(CAST(SUM(CAST(FLOOR(quality * 10000) AS BIGINT)) AS DOUBLE)
           |             / (COUNT(*) * 10000.0), 4) AS mean_quality
           |FROM b GROUP BY source ORDER BY source""".stripMargin
      }
    ),
    QDef(
      // bloom-prescreened decontamination (large-benchmark variant of
      // e20): a fixed-size Bloom filter of bench shingle hashes prunes
      // the corpus stream map-side; the exact verify join (pinned
      // shuffle-hash — the bench side need not broadcast) removes
      // false positives, so the verdict is exact and the oracle is
      // plain SQL with no bloom in it.
      "e51_bloom_decontam",
      (s, dir) =>
        Pipeline.decontaminateBloom(docs(s, dir), col("doc_id") % 40 === 1,
            n = 3, minShared = 2)
          .orderBy("train_id"),
      Some(s"""WITH sh3 AS (
              |  SELECT DISTINCT doc_id, unnest(${Sql.shingles("toks", 3)}) AS sh
              |  FROM (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents)
              |), hh AS (SELECT doc_id, ${Sql.hash48("sh", "'decon'")} AS h FROM sh3),
              |b AS (SELECT doc_id AS bench_id, h FROM hh WHERE doc_id % 40 = 1),
              |t AS (SELECT doc_id AS train_id, h FROM hh WHERE doc_id % 40 <> 1),
              |pairs AS (
              |  SELECT train_id, bench_id, COUNT(*) AS shared
              |  FROM t JOIN b USING (h)
              |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
              |SELECT train_id, COUNT(*) AS n_bench_docs, MAX(shared) AS max_shared
              |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    QDef(
      // windowed LM quality: worst/best 32-token window per doc under
      // the corpus unigram LM — local-quality detection a whole-doc
      // mean averages away (TextAnalysis.windowPpl scaladoc).
      "e67_window_ppl",
      (s, dir) =>
        graft.ext.TextAnalysis.windowPpl(docs(s, dir), width = 32)
          .orderBy("doc_id"),
      Some(s"""WITH p AS (
              |  SELECT doc_id, u.pos // 32 AS win, u.tok AS tok FROM (
              |    SELECT doc_id, unnest(list_transform(range(len(toks)),
              |      i -> struct_pack(pos := i, tok := toks[CAST(i+1 AS BIGINT)]))) AS u
              |    FROM (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents))),
              |v AS (SELECT tok, COUNT(*) AS cnt FROM p GROUP BY tok),
              |tt AS (SELECT SUM(cnt) AS tot FROM v),
              |ws AS (
              |  SELECT p.doc_id, win, COUNT(*) AS n_tokens,
              |         ROUND(SUM((CAST(FLOOR(1000.0 * ln(CAST(cnt AS DOUBLE)) + 0.5) AS BIGINT) - CAST(FLOOR(1000.0 * ln(CAST(tot AS DOUBLE)) + 0.5) AS BIGINT)) * 1000)
              |               / (COUNT(*) * 1000000.0), 4) AS win_logp
              |  FROM p JOIN v USING (tok) CROSS JOIN tt GROUP BY 1, 2),
              |r AS (
              |  SELECT *,
              |         row_number() OVER (PARTITION BY doc_id ORDER BY win_logp ASC, win ASC) AS rw,
              |         row_number() OVER (PARTITION BY doc_id ORDER BY win_logp DESC, win ASC) AS rb
              |  FROM ws)
              |SELECT doc_id, COUNT(*) AS n_windows,
              |       CAST(MAX(CASE WHEN rw = 1 THEN win END) AS BIGINT) AS worst_win,
              |       MAX(CASE WHEN rw = 1 THEN win_logp END) AS worst_logp,
              |       MAX(CASE WHEN rb = 1 THEN win_logp END) AS best_logp
              |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    QDef(
      // n-gram novelty scoring: per-doc novel-vs-shared distinct
      // shingle counts + integer novelty ratio (TextAnalysis
      // .noveltyScore scaladoc).
      "e64_novelty",
      (s, dir) =>
        graft.ext.TextAnalysis.noveltyScore(docs(s, dir), n = 3)
          .orderBy("doc_id"),
      Some(s"""WITH sh AS (
              |  SELECT DISTINCT doc_id, unnest(${Sql.shingles("toks", 3)}) AS sh
              |  FROM (SELECT doc_id, ${Sql.tokens("COALESCE(text, '')")} AS toks FROM documents)
              |), hh AS (SELECT doc_id, ${Sql.hash48("sh", "'novelty'")} AS h FROM sh),
              |df AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM hh GROUP BY h)
              |SELECT doc_id, n_shingles, n_shared,
              |       n_shingles - n_shared AS n_novel,
              |       ((n_shingles - n_shared) * 1000000) // n_shingles AS novelty_q
              |FROM (SELECT doc_id, COUNT(*) AS n_shingles,
              |             COUNT(CASE WHEN df >= 2 THEN 1 END) AS n_shared
              |      FROM hh JOIN df USING (h) GROUP BY doc_id)
              |ORDER BY doc_id""".stripMargin)
    ),
    QDef(
      // epoch-weighted dataset mixing: the UPSAMPLING complement of
      // e28 — one materialized training epoch hitting the same target
      // mixture by repeating docs (floor(r) copies + deterministic
      // hash-fractional extra), anchored so the most over-represented
      // domain is used exactly once.
      "e54_epoch_mix",
      (s, dir) =>
        Pipeline.epochMix(docs(s, dir), ReweightTargets)
          .orderBy("doc_id", "copy"),
      Some {
        val vals = ReweightTargets.toSeq.sortBy(_._1)
          .map { case (d, w) => s"('$d', CAST($w AS DOUBLE))" }.mkString(", ")
        s"""WITH w(source, w) AS (VALUES $vals),
           |c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
           |cw AS (SELECT c.source, c.n, w.w FROM c JOIN w USING (source)),
           |k AS (SELECT MAX(n / w) AS k FROM cw),
           |r AS (SELECT source, w * k.k / n AS r FROM cw CROSS JOIN k),
           |cp AS (
           |  SELECT d.doc_id, d.source,
           |         CAST(FLOOR(r.r) AS BIGINT) +
           |           CASE WHEN ${h48doc("mix")} <
           |                CAST(FLOOR((r.r - FLOOR(r.r)) * 281474976710656.0) AS BIGINT)
           |                THEN 1 ELSE 0 END AS copies
           |  FROM documents d JOIN r USING (source))
           |SELECT doc_id, source, unnest(range(copies)) AS copy
           |FROM cp WHERE copies >= 1 ORDER BY doc_id, copy""".stripMargin
      }
    ),
    QDef(
      // chunk-then-pack (Pipeline.chunkPack scaladoc): overlong docs
      // split to 128-token chunks first, chunks packed next-fit into
      // 512-token windows — the e35 chunk CTE feeding e18's recursive
      // replay, keyed on (doc_id, chunk_idx).
      "e74_chunk_pack",
      (s, dir) =>
        Pipeline.chunkPack(docs(s, dir), maxLen = 128, capacity = 512,
            shards = 8)
          .orderBy("shard", "doc_id", "chunk_idx"),
      Some(s"""WITH RECURSIVE c0 AS (
              |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
              |  FROM (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents)),
              |ch AS (
              |  SELECT doc_id, i AS chunk_idx,
              |         CAST(len(list_slice(toks, i * 128 + 1, i * 128 + 128)) AS BIGINT) AS chunk_len
              |  FROM (SELECT doc_id, toks,
              |               UNNEST(range(1 + (GREATEST(n - 128, 0) + 127) // 128)) AS i
              |        FROM c0)),
              |d0 AS (
              |  SELECT doc_id, chunk_idx,
              |         CAST(${h48doc("shard")} % 8 AS INT) AS shard, chunk_len
              |  FROM ch),
              |d AS (
              |  SELECT *, row_number() OVER (PARTITION BY shard
              |           ORDER BY doc_id, chunk_idx) AS rn FROM d0),
              |rec AS (
              |  SELECT shard, rn, doc_id, chunk_idx, chunk_len,
              |         CAST(0 AS BIGINT) AS pack_id, chunk_len AS pack_fill
              |  FROM d WHERE rn = 1
              |  UNION ALL
              |  SELECT d.shard, d.rn, d.doc_id, d.chunk_idx, d.chunk_len,
              |         CASE WHEN r.pack_fill + d.chunk_len > 512
              |              THEN r.pack_id + 1 ELSE r.pack_id END,
              |         CASE WHEN r.pack_fill + d.chunk_len > 512
              |              THEN d.chunk_len ELSE r.pack_fill + d.chunk_len END
              |  FROM rec r JOIN d ON d.shard = r.shard AND d.rn = r.rn + 1)
              |SELECT shard, doc_id, chunk_idx, chunk_len, pack_id, pack_fill
              |FROM rec ORDER BY shard, doc_id, chunk_idx""".stripMargin)
    ),
    QDef(
      // dataset version diff (Pipeline.datasetDiff scaladoc): v2 is
      // derived deterministically from v1 — drop id%37=0, append a
      // token where id%41=0, add fresh ids (+1000000) for id%53=0 —
      // and the diff must classify every id exactly.
      "e73_dataset_diff",
      (s, dir) => {
        val v1 = docs(s, dir).select("doc_id", "text")
        val v2 = v1.filter(pmod(col("doc_id"), lit(37)) =!= 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(41)) === 0,
              concat(col("text"), lit(" changedtoken")))
              .otherwise(col("text")))
          .unionByName(v1.filter(pmod(col("doc_id"), lit(53)) === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        Pipeline.datasetDiff(v1, v2).orderBy("doc_id")
      },
      Some(s"""WITH v1 AS (SELECT doc_id, text FROM documents),
              |v2 AS (
              |  SELECT doc_id,
              |         CASE WHEN doc_id % 41 = 0 THEN text || ' changedtoken'
              |              ELSE text END AS text
              |  FROM v1 WHERE doc_id % 37 <> 0
              |  UNION ALL
              |  SELECT doc_id + 1000000 AS doc_id, text FROM v1 WHERE doc_id % 53 = 0),
              |fa AS (SELECT doc_id, md5(${Sql.normText("COALESCE(text, '')")}) AS fa FROM v1),
              |fb AS (SELECT doc_id, md5(${Sql.normText("COALESCE(text, '')")}) AS fb FROM v2)
              |SELECT doc_id,
              |       CASE WHEN fa IS NULL THEN 'added'
              |            WHEN fb IS NULL THEN 'removed'
              |            WHEN fa = fb THEN 'same'
              |            ELSE 'changed' END AS status
              |FROM fa FULL OUTER JOIN fb USING (doc_id)
              |ORDER BY doc_id""".stripMargin)
    ),
    QDef(
      // temperature-scaled mixture sampling at α = 0.5 (the mT5-style
      // flattening rule): one epoch at weights ∝ n^α — rare sources
      // repeat, hot sources thin (Pipeline.temperatureMix scaladoc).
      "e72_temperature_mix",
      (s, dir) =>
        Pipeline.temperatureMix(docs(s, dir), alpha = 0.5)
          .orderBy("doc_id", "copy"),
      Some(s"""WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
              |          FROM documents GROUP BY source),
              |a AS (SELECT source, n,
              |             CAST(FLOOR(exp(0.5 * ln(CAST(n AS DOUBLE))) * 1000000.0) AS BIGINT) AS na
              |      FROM c),
              |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(na) AS BIGINT) AS wt FROM a),
              |r AS (SELECT source,
              |             CAST(nt AS DOUBLE) * CAST(na AS DOUBLE)
              |               / CAST(wt AS DOUBLE) / CAST(n AS DOUBLE) AS r
              |      FROM a CROSS JOIN t),
              |cp AS (
              |  SELECT d.doc_id, d.source,
              |         CAST(FLOOR(r.r) AS BIGINT) +
              |           CASE WHEN ${h48doc("temp")} <
              |                CAST(FLOOR((r.r - FLOOR(r.r)) * 281474976710656.0) AS BIGINT)
              |                THEN 1 ELSE 0 END AS copies
              |  FROM documents d JOIN r USING (source))
              |SELECT doc_id, source, unnest(range(copies)) AS copy
              |FROM cp WHERE copies >= 1 ORDER BY doc_id, copy""".stripMargin)
    ),
    QDef(
      // BPE tokenizer training — the first 3 merge rules (the
      // merges.txt artifact). The oracle replays the same rounds as
      // staged CTEs: pair counts over the word-frequency table, winner
      // = (max count, tie → pair asc), merge = the SAME left-to-right
      // literal replace (TextAnalysis.bpeMerges scaladoc).
      "e56_bpe_merges",
      (s, dir) => graft.ext.TextAnalysis.bpeMerges(docs(s, dir), rounds = 3),
      Some {
        val heads = (1 to BpeRounds).map { r =>
          s"""SELECT CAST($r AS INT) AS round, pr AS pair,
             |       replace(pr, ' ', '') AS merged, n FROM win$r""".stripMargin
        }
        s"""WITH ${bpeCtes(BpeRounds)}
           |${heads.mkString("\nUNION ALL\n")}
           |ORDER BY round""".stripMargin
      }
    ),
    QDef(
      // the ENCODE half of BPE: the learned merges applied in order to
      // every word, per-doc symbol counts before/after
      // (TextAnalysis.bpeEncode scaladoc). The oracle re-derives the
      // same merge table (shared CTEs) and applies the same nested
      // delimiter-framed replaces.
      "e62_bpe_encode",
      (s, dir) => graft.ext.TextAnalysis.bpeEncode(docs(s, dir), rounds = 3)
        .orderBy("doc_id"),
      Some(BpeEncodeOracle)
    ),
    QDef(
      // the PERSISTED tokenizer artifact (TokenizerStore scaladoc):
      // merges + vocab land as parquet tables, then the corpus is
      // encoded FROM THE STORE — learned pairs as plan literals, pure
      // map-side. Output is byte-identical to e62 on the training
      // corpus, so the oracle is e62's.
      "e71_bpe_store",
      (s, dir) => {
        val d = docs(s, dir)
        val store = graft.Queries.scratchDir("bpe_store_q")
        graft.ext.TokenizerStore.build(d, store, rounds = 3)
        graft.ext.TokenizerStore.encode(s, store, d).orderBy("doc_id")
      },
      Some(BpeEncodeOracle)
    ),
    QDef(
      // tokenizer vocabulary with a 95% coverage cutoff: frequency
      // rank + running token mass over the vocab table; membership is
      // the integer cross-multiplied prefix test
      // (TextAnalysis.vocabCoverage scaladoc).
      "e57_vocab_coverage",
      (s, dir) =>
        graft.ext.TextAnalysis.vocabCoverage(docs(s, dir), coveragePct = 95)
          .orderBy("rank"),
      Some(s"""WITH c AS (
              |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
              |    SELECT unnest(${Sql.tokens("COALESCE(text, '')")}) AS tok
              |    FROM documents) WHERE tok <> '' GROUP BY tok),
              |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM c),
              |r AS (
              |  SELECT tok, cnt, tot,
              |         CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rank,
              |         CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok
              |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              |  FROM c CROSS JOIN t)
              |SELECT tok, cnt, rank, cum, (cum - cnt) * 100 < tot * 95 AS in_vocab
              |FROM r ORDER BY rank""".stripMargin)
    ),
    QDef(
      // CCNet end-to-end keep verdict: language gate × LM tercile gate
      // × exact-dedup keeper, every signal exposed plus the composite
      // keep (Pipeline.ccnetVerdict scaladoc). The oracle recomposes
      // the e08/e38/e01 oracle fragments over the same doc set.
      "e63_ccnet_verdict",
      (s, dir) => Pipeline.ccnetVerdict(docs(s, dir), exactNtile = true)
        .orderBy("doc_id"),
      Some {
        val profiles = graft.ext.TextAnalysis.profiles
        val scores = profiles.map { case (l, ts) =>
          val cnt = ts.map { t =>
            s"CAST((length(p) - length(replace(p, '$t', ''))) / ${t.length} AS BIGINT)"
          }.mkString(" + ")
          s"$cnt AS s_$l"
        }.mkString(", ")
        s"""WITH tkn AS (SELECT doc_id, unnest(${Sql.tokens("text")}) AS tok FROM documents),
           |v AS (SELECT tok, COUNT(*) AS cnt FROM tkn GROUP BY tok),
           |tt AS (SELECT SUM(cnt) AS tot FROM v),
           |sc AS (
           |  SELECT tkn.doc_id,
           |         ROUND(SUM((CAST(FLOOR(1000.0 * ln(CAST(v.cnt AS DOUBLE)) + 0.5) AS BIGINT) - CAST(FLOOR(1000.0 * ln(CAST(tt.tot AS DOUBLE)) + 0.5) AS BIGINT)) * 1000)
           |               / (COUNT(*) * 1000000.0), 4) AS avg_logp
           |  FROM tkn JOIN v USING (tok) CROSS JOIN tt GROUP BY tkn.doc_id),
           |b AS (
           |  SELECT doc_id, avg_logp,
           |         CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
           |  FROM (SELECT *, ntile(3) OVER (ORDER BY avg_logp DESC, doc_id) AS t FROM sc)),
           |lp AS (SELECT doc_id, ' ' || ${Sql.normText("text")} || ' ' AS p FROM documents),
           |ls AS (SELECT doc_id, $scores FROM lp),
           |lg AS (
           |  SELECT doc_id,
           |         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
           |              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
           |              WHEN s_fr >= s_es THEN 'fr'
           |              ELSE 'es' END AS pred_lang
           |  FROM ls),
           |k AS (
           |  SELECT doc_id,
           |         doc_id = MIN(doc_id) OVER (PARTITION BY md5(${Sql.normText("text")})) AS is_keeper
           |  FROM documents)
           |SELECT b.doc_id, pred_lang, avg_logp, ppl_bucket, is_keeper,
           |       pred_lang = 'en' AND ppl_bucket <> 'tail' AND is_keeper AS keep
           |FROM b JOIN lg USING (doc_id) JOIN k USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      }
    ),
    QDef(
      // DSIR-style importance resampling toward the src0 target
      // domain: hashed-unigram log-likelihood-ratio scores
      // (FLOOR(·1e6)-quantized integer sums), exact top-100
      // (Pipeline.dsirSample scaladoc).
      "e58_dsir_sample",
      (s, dir) =>
        Pipeline.dsirSample(docs(s, dir), col("source") === "src0",
            buckets = 256, k = 100)
          .orderBy("rank"),
      Some(s"""WITH tk AS (
              |  SELECT doc_id, is_t, ${Sql.hash48("tok", "'dsir'")} % 256 AS b
              |  FROM (SELECT doc_id, source = 'src0' AS is_t,
              |               unnest(${Sql.tokens("COALESCE(text, '')")}) AS tok
              |        FROM documents) WHERE tok <> ''),
              |tc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tk WHERE is_t GROUP BY b),
              |rc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tk GROUP BY b),
              |tt AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt FROM tc),
              |rt AS (SELECT CAST(SUM(cr) AS BIGINT) AS rt FROM rc),
              |s AS (
              |  SELECT tk.doc_id, COUNT(*) AS n_tokens,
              |         CAST(SUM((CAST(FLOOR(1000.0 * ln(COALESCE(ct, 0) + CAST(1 AS DOUBLE)) + 0.5) AS BIGINT)
              |           - CAST(FLOOR(1000.0 * ln(tt + CAST(256 AS DOUBLE)) + 0.5) AS BIGINT)
              |           - CAST(FLOOR(1000.0 * ln(cr + CAST(1 AS DOUBLE)) + 0.5) AS BIGINT)
              |           + CAST(FLOOR(1000.0 * ln(rt + CAST(256 AS DOUBLE)) + 0.5) AS BIGINT)) * 1000) AS BIGINT) AS logw_q
              |  FROM tk LEFT JOIN tc USING (b) JOIN rc USING (b)
              |       CROSS JOIN tt CROSS JOIN rt
              |  WHERE NOT is_t GROUP BY tk.doc_id)
              |SELECT doc_id, n_tokens, logw_q, rank FROM (
              |  SELECT *, CAST(row_number() OVER (ORDER BY logw_q DESC, doc_id) AS BIGINT) AS rank
              |  -- empty-target degenerate config: scores go NULL -> no
              |  -- sample, same guard as the engine (dsirSample scaladoc)
              |  FROM s WHERE logw_q IS NOT NULL)
              |WHERE rank <= 100 ORDER BY rank""".stripMargin)
    )
  )
}
