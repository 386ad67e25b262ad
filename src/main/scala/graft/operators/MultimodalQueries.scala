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
             FROM documents ORDER BY media_id"""))
  )
}
