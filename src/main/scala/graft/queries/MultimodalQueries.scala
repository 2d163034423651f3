package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.{Multimodal, VectorFunctions}

/** Multimodal surface: binary + text + vector in one frame. q49 runs
  * the decode seam (rows-only: the decoder is the engine's, not SQL);
  * q50 aggregates across all three modalities with a DuckDB oracle.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // q49: decode/feature-extract over the opaque blob column through
    // the partition-scoped decoder seam, joined back to the embedding
    // modality. The stub decoder's features are byte-level stats, so
    // the DuckDB oracle recomputes them from the same blob bytes
    // (hex-pair extraction) — checking the seam's output end to end,
    // not just rows. MultimodalSpec pins the decoder semantics.
    Q("q49_media_features",
      (s, d) => {
        val mm = Multimodal.table(s, d)
        val feats = Multimodal.extractFeatures(mm)
        mm.select(col("doc_id"), col("lang"),
            col("media_meta.n_bytes").cast("bigint").as("n_bytes"),
            VectorFunctions.normNative(col("embedding").cast("array<double>")).as("nrm"))
          .join(feats, "doc_id")
          .select(col("doc_id"), col("lang"), col("n_bytes"),
            element_at(col("feature"), 1).cast("bigint").as("decoded_bytes"),
            floor(element_at(col("feature"), 2) * 100).as("byte_mean_e2"),
            floor(col("nrm") * 1000).as("emb_norm_e3"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH mm AS (
          SELECT d.doc_id, d.lang, encode(d.text) AS blob,
                 sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
                                              x -> x * x))) AS nrm
          FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        ), b AS (
          SELECT doc_id, lang, nrm, octet_length(blob) AS len,
                 CAST(list_sum(list_transform(range(1, octet_length(blob) + 1),
                   i -> CAST('0x' || substring(hex(blob), 2*i - 1, 2) AS INT)))
                   AS BIGINT) AS bsum
          FROM mm
        )
        SELECT doc_id, lang,
               CAST(len AS BIGINT) AS n_bytes,
               CAST(len AS BIGINT) AS decoded_bytes,
               CAST(floor(CAST(COALESCE(bsum, 0) AS DOUBLE)
                          / greatest(len, 1) * 100) AS BIGINT) AS byte_mean_e2,
               CAST(floor(nrm * 1000) AS BIGINT) AS emb_norm_e3
        FROM b ORDER BY doc_id
      """), bench = false),

    // ---------------------------------------------------------------
    // q67: frame sampling — the video-shaped decode: every 4th 32-byte
    // "frame" of each blob decoded independently (partition-scoped
    // codec, lazy per-row fan-out), per-frame features resized to a
    // fixed width by bucket means INSIDE the same partition loop (one
    // seam crossing: no ScalaUDF node downstream), then a per-doc
    // aggregate over the sampled frames.
    //
    // The per-frame resized feature f2 = (byteMean + fold)/2 is exactly
    // representable at 6 binary fractional digits (byteMean = sum/32),
    // so f2*64 is an exact integer and the doc aggregate runs in the
    // integer domain — order-independent AND cross-engine: the DuckDB
    // oracle re-slices the same frames from the blob's hex pairs and
    // must reproduce every value bit-for-bit. MultimodalSpec pins
    // sampling + resize semantics and the no-UDF plan.
    Q("q67_frame_sample",
      (s, d) => {
        Multimodal.sampleFrames(
            Multimodal.table(s, d), frameBytes = 32, every = 4,
            resizeTo = Some(2))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum((element_at(col("feature"), 2) * 64).cast("bigint")).as("__s64"))
          .select(col("doc_id"), col("n_frames"),
            floor(col("__s64").cast("double") / 64 / col("n_frames") * 100)
              .as("mean_f2_e2"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH mm AS (
          SELECT d.doc_id, encode(d.text) AS blob
          FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        ), fr AS (
          SELECT doc_id, hex(blob) AS hx,
                 unnest(range(0, octet_length(blob) // 32, 4)) AS fidx
          FROM mm
        ), fb AS (
          SELECT doc_id, fidx,
                 list_transform(range(0, 32),
                   k -> CAST('0x' || substring(hx, 2*(fidx*32 + k) + 1, 2)
                             AS BIGINT)) AS bytes
          FROM fr
        ), fv AS (
          SELECT doc_id,
                 CAST(list_sum(bytes) AS BIGINT)
                   + 32 * list_reduce(bytes,
                       (acc, b) -> (acc * 31 + b) & 16777215) AS v64
          FROM fb
        )
        SELECT doc_id, COUNT(*) AS n_frames,
               CAST(floor(CAST(SUM(v64) AS DOUBLE) / 64 / COUNT(*) * 100)
                    AS BIGINT) AS mean_f2_e2
        FROM fv GROUP BY doc_id ORDER BY doc_id
      """), bench = false),

    // ---------------------------------------------------------------
    // q50: cross-modality aggregate — per language: docs, total payload
    // bytes (binary), exact-decimal mean embedding norm (vector), mean
    // token-ish chars (text). Oracle-checked.
    Q("q50_multimodal_stats",
      (s, d) => {
        val mm = Multimodal.table(s, d)
        mm.select(col("lang"),
            col("media_meta.n_bytes").as("n_bytes"),
            VectorFunctions.normNative(col("embedding").cast("array<double>")).as("nrm"),
            col("n_chars"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_bytes")).as("total_bytes"),
            floor((sum(col("nrm").cast("decimal(18,9)")).cast("double")
              / count(lit(1))) * 1000).as("avg_norm_e3"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH mm AS (
          SELECT d.lang,
                 octet_length(encode(d.text)) AS n_bytes,
                 sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
                                              x -> x * x))) AS nrm,
                 d.n_chars
          FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(floor((CAST(SUM(CAST(nrm AS DECIMAL(18,9))) AS DOUBLE)
                           / COUNT(*)) * 1000) AS BIGINT) AS avg_norm_e3,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM mm GROUP BY lang ORDER BY lang
      """)),

    // ---------------------------------------------------------------
    // q87: modality-integrity audit — the referential/shape gate a
    // multimodal table needs before training: every document should
    // carry its embedding (and vice versa), and every embedding must
    // have the declared dimension. One full-outer join keyed by the
    // shared identity + one conditional aggregate; emitted as (metric,
    // n) rows like q77's profile. At 100 TB both sides are bucketed on
    // the id and the join is shuffle-free; nothing here reads the
    // text or the vector payload except the dimension check.
    Q("q87_modality_integrity",
      (s, d) => {
        val docs = graft.Tables.documents(s, d).select(col("doc_id"))
        val embs = graft.Tables.embeddings(s, d)
          .select(col("vec_id"), size(col("embedding")).as("dim"))
        val joined = docs.join(embs, col("doc_id") === col("vec_id"), "full_outer")
        val wide = joined.agg(
          sum(when(col("doc_id").isNotNull, 1L).otherwise(0L)).as("docs_total"),
          sum(when(col("vec_id").isNotNull, 1L).otherwise(0L)).as("embeddings_total"),
          sum(when(col("doc_id").isNotNull && col("vec_id").isNotNull, 1L)
            .otherwise(0L)).as("matched"),
          sum(when(col("vec_id").isNull, 1L).otherwise(0L)).as("doc_without_embedding"),
          sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("embedding_without_doc"),
          sum(when(col("vec_id").isNotNull && col("dim") =!= 64, 1L)
            .otherwise(0L)).as("dim_violations"))
        val metrics = Seq("docs_total", "embeddings_total", "matched",
          "doc_without_embedding", "embedding_without_doc", "dim_violations")
        wide.selectExpr(s"stack(${metrics.size}, " +
            metrics.map(m => s"'$m', cast($m as bigint)").mkString(", ") +
            ") as (metric, n)")
          .orderBy(col("metric"))
      },
      Some("""
        WITH j AS (
          SELECT d.doc_id, e.vec_id, len(e.embedding) AS dim
          FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
        ),
        w AS (
          SELECT SUM(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END) AS docs_total,
                 SUM(CASE WHEN vec_id IS NOT NULL THEN 1 ELSE 0 END) AS embeddings_total,
                 SUM(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
                          THEN 1 ELSE 0 END) AS matched,
                 SUM(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS doc_without_embedding,
                 SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS embedding_without_doc,
                 SUM(CASE WHEN vec_id IS NOT NULL AND dim <> 64
                          THEN 1 ELSE 0 END) AS dim_violations
          FROM j
        )
        SELECT metric, n FROM (
          SELECT 'docs_total' AS metric, CAST(docs_total AS BIGINT) AS n FROM w
          UNION ALL SELECT 'embeddings_total', CAST(embeddings_total AS BIGINT) FROM w
          UNION ALL SELECT 'matched', CAST(matched AS BIGINT) FROM w
          UNION ALL SELECT 'doc_without_embedding', CAST(doc_without_embedding AS BIGINT) FROM w
          UNION ALL SELECT 'embedding_without_doc', CAST(embedding_without_doc AS BIGINT) FROM w
          UNION ALL SELECT 'dim_violations', CAST(dim_violations AS BIGINT) FROM w
        ) ORDER BY metric
      """))
  )
}
