package graft.operators

import graft.Tables
import graft.store.ZOrderLayout
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-path clustering decisions a
  * 100 TB deployment makes once so every later scan prunes. The
  * registry entry hash-verifies the full morton construction
  * (bounds → quantization → bit interleave) cross-engine; the layout
  * EFFECT (footer min/max tightness, row-group pruning for 2-d range
  * predicates) is pinned by ZOrderLayoutSpec on real written files.
  */
object LayoutQueries {

  val all: Seq[Q] = Seq(

    Q("es_zorder_morton",
      (s, d) => {
        ZOrderLayout.withMorton(
            Tables.events(s, d).select("event_id", "user_id", "value"),
            "user_id", "value")
          .select(col("event_id"), col("xq"), col("yq"), col("morton"))
          .orderBy("morton", "event_id")
      },
      Some {
        val m = (1 << ZOrderLayout.Bits) - 1
        s"""WITH st AS (
             SELECT CAST(min(user_id) AS DOUBLE) AS xmn,
                    CAST(max(user_id) AS DOUBLE) AS xmx,
                    CAST(min(value) AS DOUBLE) AS ymn,
                    CAST(max(value) AS DOUBLE) AS ymx
             FROM events),
           q AS (
             SELECT e.event_id,
                    CASE WHEN st.xmx > st.xmn
                         THEN CAST(floor(((CAST(e.user_id AS DOUBLE) - st.xmn) * $m.0)
                                         / (st.xmx - st.xmn)) AS BIGINT)
                         ELSE 0 END AS xq,
                    CASE WHEN st.ymx > st.ymn
                         THEN CAST(floor(((CAST(e.value AS DOUBLE) - st.ymn) * $m.0)
                                         / (st.ymx - st.ymn)) AS BIGINT)
                         ELSE 0 END AS yq
             FROM events e CROSS JOIN st)
           SELECT event_id, xq, yq,
                  ${ZOrderLayout.mortonSql("xq", "yq")} AS morton
           FROM q ORDER BY morton, event_id"""
      })
  )
}
