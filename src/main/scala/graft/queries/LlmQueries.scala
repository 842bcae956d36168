package graft.queries

import graft.contracts.SchemaPolicy
import graft.llmops._
import graft.model.Tables.DocumentRow
import graft.pipeline.PipelineBuilder
import graft.sources.{TypedSink, TypedSource}
import org.apache.spark.sql.functions._

/** Driver-verifiable queries for the LLM-training-data operator family
  * (dedup / similarity / text analysis / multimodal — SURVEY.md §7.2.9 and
  * the north-star brief). Oracles are exact ANSI SQL where the semantics
  * allow; hash-based ops (simhash, LSH internals) get rows-only checks, but
  * their *verified outputs* (exact Jaccard / cosine) are oracled.
  */
object LlmQueries {

  import QueryDef._

  // Contracts for the pinned llmops pipelines (SURVEY §7.2.9: each llm op
  // runs as a pinned transform so the contract layer still enforces the
  // boundaries).
  final case class DocDeduped(doc_id: Long, lang: String, n_chars: Long)
  final case class DocStats(
      doc_id: Long,
      n_chars_calc: Long,
      n_tokens: Long,
      n_distinct_tokens: Long,
      avg_token_len: Double,
      distinct_ratio: Double
  )
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      mime: String,
      content_md5: String,
      fake_width: Long,
      fake_height: Long,
      fake_duration_s: Double
  )

  // DuckDB list literal for a stopword set — single source of truth with
  // the Spark-side TextStats.stopwords.
  private def swList(lang: String): String =
    TextStats.stopwords.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  private def hitsSql(lang: String): String =
    s"len(list_intersect(string_split(text, ' '), ${swList(lang)}))"

  /** Exact k=3 shingle-pair CTE prefix (shared by the jaccard oracles). */
  private val shingleCte =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
      |        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS sh FROM t),
      |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
      |p AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)""".stripMargin

  private def jaccardPairsSql(tau: Double): String =
    s"""$shingleCte
       |SELECT p.a, p.b, CAST(p.inter AS DOUBLE)/(na.n + nb.n - p.inter) AS jaccard
       |FROM p JOIN n na ON na.doc_id = p.a JOIN n nb ON nb.doc_id = p.b
       |WHERE CAST(p.inter AS DOUBLE)/(na.n + nb.n - p.inter) >= $tau""".stripMargin

  def all: Seq[QueryDef] = Seq(
    // Exact dedup: smallest doc_id survives per identical text.
    QueryDef(
      "llm_dedup_exact",
      Some(
        "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)"
      ),
      (spark, sf) => {
        // full pinned pipeline: typed scan → dedup transform → policy sink
        val out = tmpDir("llm_dedup_exact")
        val run = PipelineBuilder[Nothing]("llm_dedup_exact")
          .addSource(TypedSource[DocumentRow]("parquet", s"$sf/documents.parquet"))
          .transformAs[DocDeduped]("exact dedup")(df =>
            Dedup
              .dedupExact(df, Fingerprints.contentKeyMd5(col("text")), col("doc_id"))
              .select("doc_id", "lang", "n_chars")
          )
          .addSink[DocDeduped, SchemaPolicy.ExactT](TypedSink[DocDeduped](s"$out/d"))
          .build
        run(spark)
        spark.read.parquet(s"$out/d")
      }
    ),
    // Per-document text stats (built-in expressions only).
    QueryDef(
      "llm_text_stats",
      Some(
        """SELECT doc_id,
          |  CAST(length(text) AS BIGINT) AS n_chars_calc,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
          |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
          |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS distinct_ratio
          |FROM documents""".stripMargin
      ),
      (spark, sf) =>
        PipelineBuilder[Nothing]("llm_text_stats")
          .addSource(TypedSource[DocumentRow]("parquet", s"$sf/documents.parquet"))
          .transformAs[DocStats]("text stats")(df =>
            TextStats
              .withStats(df)
              .select("doc_id", "n_chars_calc", "n_tokens", "n_distinct_tokens", "avg_token_len", "distinct_ratio")
          )
          .addSink[DocStats, SchemaPolicy.ExactT](TypedSink[DocStats](s"${tmpDir("llm_text_stats")}/s"))
          .build(implicitly)(spark)
    ),
    // Token counting rollup per language (whitespace + BPE-ish regex).
    QueryDef(
      "llm_token_count",
      Some(
        """SELECT lang,
          |  count(*) AS n_docs,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
          |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpeish
          |FROM documents GROUP BY lang""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "documents")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(size(TextStats.tokens(col("text")))).as("total_tokens"),
            sum(TextStats.bpeishTokenCount(col("text"))).as("total_bpeish")
          )
    ),
    // Language-ID heuristic: stopword-hit argmax with deterministic ties.
    QueryDef(
      "llm_lang_id",
      Some(
        s"""WITH h AS (SELECT doc_id, lang,
           |  ${hitsSql("en")} AS en, ${hitsSql("de")} AS de, ${hitsSql("fr")} AS fr,
           |  ${hitsSql("es")} AS es, ${hitsSql("zh")} AS zh
           |FROM documents)
           |SELECT doc_id, lang,
           |  CASE WHEN greatest(en, de, fr, es, zh) = 0 THEN 'und'
           |       WHEN en >= greatest(de, fr, es, zh) THEN 'en'
           |       WHEN de >= greatest(fr, es, zh) THEN 'de'
           |       WHEN fr >= greatest(es, zh) THEN 'fr'
           |       WHEN es >= zh THEN 'es'
           |       ELSE 'zh' END AS lang_pred
           |FROM h""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "documents")
          .select(col("doc_id"), col("lang"), TextStats.langId(col("text")).as("lang_pred"))
    ),
    // Composite quality score.
    QueryDef(
      "llm_quality_score",
      Some(
        s"""SELECT doc_id, round(
           |  0.4 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 64.0, 1.0) +
           |  0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' '))) +
           |  0.2 * least(CAST(${hitsSql("en")} AS DOUBLE) / 4.0, 1.0), 6) AS quality
           |FROM documents""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "documents")
          .select(col("doc_id"), TextStats.qualityScore(col("text")).as("quality"))
    ),
    // Content fingerprint (cross-engine md5).
    QueryDef(
      "llm_fingerprint",
      Some("SELECT doc_id, md5(text) AS content_md5 FROM documents"),
      (spark, sf) =>
        table(spark, sf, "documents")
          .select(col("doc_id"), Fingerprints.contentKeyMd5(col("text")).as("content_md5"))
    ),
    // Hash fingerprints (xxhash64/simhash/rolling): Spark-only hash
    // functions — rows-only check.
    QueryDef(
      "llm_simhash",
      None,
      (spark, sf) =>
        table(spark, sf, "documents")
          .select(
            col("doc_id"),
            Fingerprints.contentKey64(col("text")).as("content_xxh64"),
            Fingerprints.simhash64(col("text")).as("simhash"),
            Fingerprints.rollingFingerprint(col("text")).as("rolling_fp")
          )
    ),
    // MinHash-LSH near-dup pairs, exact-Jaccard verified: output must equal
    // the exact all-pairs oracle (recall at tau=0.8 is 1-5e-8; precision is
    // exact because candidates are re-verified).
    QueryDef(
      "llm_dedup_minhash",
      Some(jaccardPairsSql(0.8)),
      (spark, sf) =>
        Dedup.minhashNearDupPairs(
          table(spark, sf, "documents"),
          "doc_id",
          "text",
          k = 3,
          numHashes = 128,
          bands = 32,
          tau = 0.8
        )
    ),
    // Exact n-gram Jaccard pairs via the inverted-index join (lower tau:
    // exercises the exact path on a wider candidate set).
    QueryDef(
      "llm_dedup_ngram",
      Some(jaccardPairsSql(0.05)),
      (spark, sf) =>
        Dedup.ngramJaccardPairs(table(spark, sf, "documents"), "doc_id", "text", k = 3, tau = 0.05)
    ),
    // Greedy near-dup removal: survivors after dropping docs with a smaller
    // similar neighbor.
    QueryDef(
      "llm_dedup_docs",
      Some(
        s"""$shingleCte,
           |pairs AS (SELECT p.a, p.b FROM p JOIN n na ON na.doc_id = p.a JOIN n nb ON nb.doc_id = p.b
           |          WHERE CAST(p.inter AS DOUBLE)/(na.n + nb.n - p.inter) >= 0.8)
           |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT b FROM pairs)""".stripMargin
      ),
      (spark, sf) => {
        val docs = table(spark, sf, "documents")
        val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 3, 128, 32, 0.8)
        Dedup.dropNearDuplicates(docs, "doc_id", pairs).select("doc_id")
      }
    ),
    // SimHash near-dup pairs (Hamming <= 3 over 4 bands): Spark-only hash —
    // rows-only.
    QueryDef(
      "llm_simhash_pairs",
      None,
      (spark, sf) =>
        Dedup.simhashNearDupPairs(table(spark, sf, "documents"), "doc_id", "text", bands = 4, maxHamming = 3)
    ),
    // Brute-force cosine top-1 neighbor (ids only; cosine computed in
    // double on both sides).
    QueryDef(
      "llm_ann_top1",
      Some(
        """SELECT a.vec_id AS qid, b.vec_id AS nid
          |FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
          |QUALIFY row_number() OVER (PARTITION BY a.vec_id
          |  ORDER BY list_cosine_similarity(
          |    list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
          |    list_transform(b.embedding, x -> CAST(x AS DOUBLE))) DESC, b.vec_id) = 1""".stripMargin
      ),
      (spark, sf) =>
        Similarity
          .bruteTopK(table(spark, sf, "embeddings"), "vec_id", "embedding", k = 1)
          .select("qid", "nid")
    ),
    // LSH-bucketed approximate top-5 (the 100 TB path): rows-only —
    // approximate by design.
    QueryDef(
      "llm_ann_lsh",
      None,
      (spark, sf) =>
        Similarity
          .lshTopK(table(spark, sf, "embeddings"), "vec_id", "embedding", k = 5, tables = 8, planesPerTable = 6)
          .select("qid", "nid", "rank")
    ),
    // IVF-bucketed approximate top-5 (alternative scale path to LSH):
    // rows-only — approximate by design.
    QueryDef(
      "llm_ann_ivf",
      None,
      (spark, sf) =>
        Similarity
          .ivfTopK(table(spark, sf, "embeddings"), "vec_id", "embedding", k = 5, cells = 16, nprobe = 2)
          .select("qid", "nid", "rank")
    ),
    // Embedding-cosine near-dup pairs at tau=0.4 (ids only).
    QueryDef(
      "llm_cosine_neardup",
      Some(
        """SELECT a.vec_id AS a, b.vec_id AS b
          |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          |WHERE list_cosine_similarity(
          |    list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
          |    list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.4""".stripMargin
      ),
      (spark, sf) =>
        Similarity
          .cosineNearDupPairs(table(spark, sf, "embeddings"), "vec_id", "embedding", tau = 0.4)
          .select("a", "b")
    ),
    // Overlapping token-window chunking (chunkSize=32, overlap=8).
    QueryDef(
      "llm_chunking",
      Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
          |  array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk
          |FROM t, unnest(range((len(toks) + 23) // 24)) AS u(i)""".stripMargin
      ),
      (spark, sf) =>
        Corpus
          .chunkTokens(table(spark, sf, "documents"), "text", chunkSize = 32, overlap = 8)
          .select("doc_id", "chunk_id", "chunk")
    ),
    // Deterministic content-hash train/validation split.
    QueryDef(
      "llm_train_split",
      Some(
        """SELECT doc_id,
          |  CASE WHEN CAST(concat('0x', substr(md5(text), 1, 8)) AS UBIGINT) % 100 < 90
          |       THEN 'train' ELSE 'valid' END AS split
          |FROM documents""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "documents")
          .select(col("doc_id"), Corpus.splitByContentHash(col("text"), trainPercent = 90).as("split"))
    ),
    // Multimodal plumbing: binary payload + typed metadata through the
    // contract, stub feature extraction (see Multimodal scaladoc).
    QueryDef(
      "llm_multimodal",
      Some(
        """SELECT doc_id,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
          |  'text/plain' AS mime,
          |  md5(text) AS content_md5,
          |  CAST(octet_length(encode(text)) % 1024 + 1 AS BIGINT) AS fake_width,
          |  CAST(octet_length(encode(text)) % 768 + 1 AS BIGINT) AS fake_height,
          |  CAST(octet_length(encode(text)) AS DOUBLE) / 1024.0 AS fake_duration_s
          |FROM documents""".stripMargin
      ),
      (spark, sf) =>
        PipelineBuilder[Nothing]("llm_multimodal")
          .addSource(TypedSource[DocumentRow]("parquet", s"$sf/documents.parquet"))
          .transformAs[MediaFeatures]("attach binary + stub decode")(df =>
            Multimodal.extractFeaturesStub(Multimodal.attachBinary(df))
          )
          .addSink[MediaFeatures, SchemaPolicy.ExactT](TypedSink[MediaFeatures](s"${tmpDir("llm_multimodal")}/m"))
          .build(implicitly)(spark)
    )
  )
}
