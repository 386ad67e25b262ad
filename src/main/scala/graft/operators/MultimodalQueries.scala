package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._

/** Oracle-checkable slice of the multimodal plumbing (full pipeline in
  * graft.multimodal.Media): binary-column construction, byte-level
  * metadata, and digests — the parts both engines can compute on the
  * same synthetic blobs. The stub decode pass is exercised in
  * MediaSpec (no SQL oracle for a codec).
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    Q("mm_blob_meta",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id").as("media_id"),
            element_at(array(lit("image"), lit("audio"), lit("video")),
              (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
            encode(concat(lit("HDR;"), col("text")), "UTF-8").as("content"))
          .select(col("media_id"), col("kind"),
            length(col("content")).as("n_bytes"),
            md5(col("content")).as("digest"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind,
             octet_length(encode('HDR;' || text)) AS n_bytes,
             md5('HDR;' || text) AS digest
             FROM documents ORDER BY media_id""")),

    // ----------------------------------------------------------------
    // Perceptual-hash (dHash) image near-dup — the oracle-checkable
    // twin of graft.multimodal.Media.phashDedup (whose real-codec
    // path — ImageIO decode → grayscale → 9×8 nearest resize →
    // gradient-sign bits — is pinned by MediaSpec's planted-duplicate
    // test; no binary media exists in the driver testdata to oracle
    // it against). Here the decoded 9×8 grayscale raster is DERIVED
    // RELATIONALLY — pixel (r,c) = ascii(text[(r·9+c) mod len]) — so
    // the ENTIRE sketch construction (gradient bits, 16-bit chunk
    // packing, chunk-bucketed candidate join, Hamming filter) replays
    // verbatim in DuckDB, the doc_decontaminate_bloom discipline: the
    // hash is relational data, not an opaque UDF. The pair machinery
    // is byte-identical to phashDedup's (same chunk layout, same
    // pigeonhole coverage trade as doc_simhash). Scale: only the
    // 4-int sketch shuffles; candidates ∝ bucket occupancy.
    Q("mm_phash_dedup",
      (s, d) => {
        val px = (0 until 72).map(i =>
          expr(s"ascii(substring(text, ($i % length(text)) + 1, 1))").as(s"p$i"))
        val rast = Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id").as("media_id") +: px: _*)
        def chunk(c: Int) = (0 until 16).map { k =>
          val j = c * 16 + k; val r = j / 8; val cc = j % 8
          when(col(s"p${r * 9 + cc}") > col(s"p${r * 9 + cc + 1}"), lit(1 << k))
            .otherwise(lit(0))
        }.reduce(_ + _).as(s"c$c")
        val sketch = rast.select(col("media_id"),
          chunk(0), chunk(1), chunk(2), chunk(3))
        val ex = sketch.select(col("media_id"), col("c0"), col("c1"),
          col("c2"), col("c3"),
          posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
            .as(Seq("c", "chunk")))
        val hamming = (0 until 4).map(i =>
          bit_count(expr(s"x.c$i ^ y.c$i"))).reduce(_ + _).cast("int")
        ex.as("x").join(ex.as("y"), Seq("c", "chunk"))
          .filter(col("x.media_id") < col("y.media_id"))
          .select(col("x.media_id").as("media_a"),
            col("y.media_id").as("media_b"), hamming.as("hamming"))
          .filter(col("hamming") <= 6)
          .distinct()
          .orderBy("media_a", "media_b")
      },
      Some {
        val pxSql = (0 until 72).map(i =>
          s"ascii(substr(text, ($i % length(text)) + 1, 1)) AS p$i").mkString(", ")
        val chunkSql = (0 until 4).map { c =>
          val bits = (0 until 16).map { k =>
            val j = c * 16 + k; val r = j / 8; val cc = j % 8
            s"CASE WHEN p${r * 9 + cc} > p${r * 9 + cc + 1} THEN ${1 << k} ELSE 0 END"
          }.mkString(" + ")
          s"($bits) AS c$c"
        }.mkString(", ")
        val hammingSql = (0 until 4).map(i =>
          s"bit_count(xor(x.c$i, y.c$i))").mkString(" + ")
        s"""WITH px AS (
             SELECT doc_id AS media_id, $pxSql
             FROM documents WHERE length(text) > 0),
           chunks AS (SELECT media_id, $chunkSql FROM px),
           ex AS (SELECT media_id, c0, c1, c2, c3, g.c,
                         CASE g.c WHEN 0 THEN c0 WHEN 1 THEN c1
                                  WHEN 2 THEN c2 ELSE c3 END AS chunk
                  FROM chunks, (SELECT unnest([0, 1, 2, 3]) AS c) g),
           pairs AS (
             SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
                    CAST($hammingSql AS INTEGER) AS hamming
             FROM ex x JOIN ex y ON x.c = y.c AND x.chunk = y.chunk
                               AND x.media_id < y.media_id)
           SELECT media_a, media_b, hamming FROM pairs
           WHERE hamming <= 6 ORDER BY media_a, media_b"""
      })
  )
}
