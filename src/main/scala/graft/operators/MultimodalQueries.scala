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

  /** The shared 9×8 pseudo-raster + dHash chunk SQL fragments, used by
    * the mm_phash_dedup (image near-dup) and mm_text_image_pairs
    * (cross-modal pairing) ORACLES: pixel (r,c) =
    * ascii(text[(r·9+c) mod len]), chunk k = 16 gradient-sign bits.
    * The Spark side computes the same sketch in one pass via the
    * `dhash_chunks` kernel (graft.functions.DhashChunks, which carries
    * the exactness argument). `src` names the column/expression
    * holding the source text.
    */
  private def pxSqlFrag(src: String): String =
    (0 until 72).map(i =>
      s"ascii(substr($src, ($i % length($src)) + 1, 1)) AS p$i").mkString(", ")
  private val chunkSqlFrag: String =
    (0 until 4).map { c =>
      val bits = (0 until 16).map { k =>
        val j = c * 16 + k; val r = j / 8; val cc = j % 8
        s"CASE WHEN p${r * 9 + cc} > p${r * 9 + cc + 1} THEN ${1 << k} ELSE 0 END"
      }.mkString(" + ")
      s"($bits) AS c$c"
    }.mkString(", ")

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
        // one-pass sketch kernel (graft.functions.DhashChunks) — the
        // 72-column ascii(substring(...)) raster + 64 CASE gradient
        // bits the oracle keeps, fused; values bit-identical (that
        // file's exactness argument)
        graft.GraftExtensions.register(s)
        val sketch = Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id").as("media_id"),
            call_function("dhash_chunks", col("text")).as("ch"))
          .select(col("media_id"),
            element_at(col("ch"), 1).as("c0"), element_at(col("ch"), 2).as("c1"),
            element_at(col("ch"), 3).as("c2"), element_at(col("ch"), 4).as("c3"))
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
        val hammingSql = (0 until 4).map(i =>
          s"bit_count(xor(x.c$i, y.c$i))").mkString(" + ")
        s"""WITH px AS (
             SELECT doc_id AS media_id, ${pxSqlFrag("text")}
             FROM documents WHERE length(text) > 0),
           chunks AS (SELECT media_id, $chunkSqlFrag FROM px),
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
      }),

    // ----------------------------------------------------------------
    // Cross-modal (text ↔ image) pairing — the CLIP-style curation
    // join every image-text training pipeline runs: encode both
    // modalities into ONE shared feature space, bucket-join for
    // candidates, score, keep each image's best text above threshold.
    // Here both encoders are deterministic relational functions into
    // the shared dHash sketch space (the mm_phash_dedup discipline —
    // the sketch replays verbatim in DuckDB): the IMAGE side decodes
    // its pseudo-raster to a 4-chunk sketch (docs with
    // doc_id % 3 = 0, mm_blob_meta's image kind), the TEXT side maps
    // captions (the other docs) through the same sketch construction.
    // Candidates exist only where a 16-bit chunk collides (the
    // pigeonhole trade documented at mm_phash_dedup / doc_simhash);
    // multi-chunk collisions duplicate pairs but cannot change the
    // packed MIN that picks each image's best match (hamming asc,
    // doc_id asc — the annLshTop1 no-distinct lesson). Scale: only
    // 4-int sketches shuffle, candidates ∝ bucket occupancy, the
    // ranking is a map-side-combined hash aggregate — never
    // images × texts.
    Q("mm_text_image_pairs",
      (s, d) => {
        // same one-pass sketch kernel as mm_phash_dedup
        graft.GraftExtensions.register(s)
        val sk = Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"),
            call_function("dhash_chunks", col("text")).as("ch"))
          .select(col("doc_id"),
            element_at(col("ch"), 1).as("c0"), element_at(col("ch"), 2).as("c1"),
            element_at(col("ch"), 3).as("c2"), element_at(col("ch"), 4).as("c3"))
        def sideEx(df: org.apache.spark.sql.DataFrame) =
          df.select(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
            posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
              .as(Seq("c", "chunk")))
        val imgs = sideEx(sk.filter(pmod(col("doc_id"), lit(3)) === 0))
        val txts = sideEx(sk.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        val hamming = (0 until 4).map(i =>
          bit_count(expr(s"x.c$i ^ y.c$i"))).reduce(_ + _).cast("int")
        val enc = (col("hamming").cast("long") * lit(1L << 43) + col("doc_id"))
        imgs.as("x").join(txts.as("y"), Seq("c", "chunk"))
          .select(col("x.doc_id").as("media_id"), col("y.doc_id").as("doc_id"),
            hamming.as("hamming"))
          .filter(col("hamming") <= 6)
          .groupBy("media_id").agg(min(enc).as("m"))
          .select(col("media_id"),
            (col("m") - shiftright(col("m"), 43) * lit(1L << 43)).as("doc_id"),
            shiftright(col("m"), 43).cast("int").as("hamming"))
          .orderBy("media_id")
      },
      Some {
        val hammingSql = (0 until 4).map(i =>
          s"bit_count(xor(x.c$i, y.c$i))").mkString(" + ")
        s"""WITH px AS (
             SELECT doc_id, ${pxSqlFrag("text")}
             FROM documents WHERE length(text) > 0),
           chunks AS (SELECT doc_id, $chunkSqlFrag FROM px),
           ex AS (SELECT doc_id, c0, c1, c2, c3, g.c,
                         CASE g.c WHEN 0 THEN c0 WHEN 1 THEN c1
                                  WHEN 2 THEN c2 ELSE c3 END AS chunk
                  FROM chunks, (SELECT unnest([0, 1, 2, 3]) AS c) g),
           pairs AS (
             SELECT DISTINCT x.doc_id AS media_id, y.doc_id AS doc_id,
                    CAST($hammingSql AS INTEGER) AS hamming
             FROM ex x JOIN ex y ON x.c = y.c AND x.chunk = y.chunk
             WHERE x.doc_id % 3 = 0 AND y.doc_id % 3 <> 0),
           best AS (
             SELECT media_id, doc_id, hamming,
                    row_number() OVER (PARTITION BY media_id
                      ORDER BY hamming ASC, doc_id ASC) AS rn
             FROM pairs WHERE hamming <= 6)
           SELECT media_id, doc_id, hamming FROM best
           WHERE rn = 1 ORDER BY media_id"""
      }),

    // ----------------------------------------------------------------
    // Per-clip audio feature extraction — the scalar features a real
    // audio pipeline computes per clip (duration, RMS energy, peak
    // amplitude, zero-crossing count). The real-codec path is
    // Media.extractFeatures (WAV PCM decode, MediaSpec-pinned); here
    // the PCM signal is DERIVED RELATIONALLY — sample[i] =
    // ascii(text[i mod len]) − 96, so lowercase text oscillates in
    // 1..26 and spaces swing to −64, giving sign changes at word
    // boundaries — and every feature is computed by both engines from
    // the same integer samples (sums exact; the only doubles are one
    // final sqrt/divide, rounded to 6dp). Scale: higher-order
    // functions over a bounded (≤2048-sample) per-row array — a pure
    // scan, zero shuffle, no explode row-blowup; at 100 TB this is
    // embarrassingly parallel over whatever partitioning the blobs
    // already have.
    Q("mm_audio_features",
      (s, d) => {
        graft.GraftExtensions.register(s)
        Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          // CODE-POINT sampler, both engines: Spark's split(text, '')
          // keeps surrogate pairs whole (Java regex zero-width matches
          // never split a pair), length() counts code points
          // (UTF8String.numChars), and ascii() returns the full code
          // point of the first character — all verified against this
          // Spark build; DuckDB's substr/length/ascii are code-point
          // functions too, so sample[i] agrees on multi-byte corpora
          // (MultimodalOpsSpec pins a non-BMP fixture). The round-11
          // ASCII assert guarded a UTF-16-unit divergence that this
          // Spark version does not have.
          .select(col("doc_id").as("media_id"),
            least(length(col("text")) * 2, lit(2048)).cast("int").as("n_samples"),
            col("text"))
          // fused one-pass integer kernel (graft.functions.AudioFeatures)
          // — same integer sums as the prior higher-order-function
          // spelling (which the oracle SQL keeps), without
          // materializing the char/sample arrays or paying ~5
          // interpreted Expression evals per sample; only the final
          // sqrt/divide/round is double, unchanged below. The array
          // peak was Int-typed via transform(abs); the kernel's is
          // LONG, cast back — values are equal (abs of a code point
          // − 96 fits int by construction). zero_crossings likewise.
          .withColumn("af", expr("audio_features(text)"))
          .select(col("media_id"), col("n_samples"),
            round(sqrt(col("af").getItem(0)
              .cast("double") / col("n_samples")), 6).as("rms"),
            col("af").getItem(1).cast("int").as("peak"),
            col("af").getItem(2).cast("int").as("zero_crossings"))
          .orderBy("media_id")
      },
      Some("""WITH pcm AS (
             SELECT doc_id AS media_id,
                    CAST(least(length(text) * 2, 2048) AS INTEGER) AS n_samples,
                    list_transform(
                      range(0, CAST(least(length(text) * 2, 2048) AS INTEGER)),
                      i -> ascii(substr(text, CAST(i % length(text) AS INTEGER) + 1, 1)) - 96
                    ) AS samples
             FROM documents WHERE length(text) > 0)
           SELECT media_id, n_samples,
                  round(sqrt(CAST(list_sum(list_transform(samples,
                    x -> CAST(x AS BIGINT) * x)) AS DOUBLE) / n_samples), 6) AS rms,
                  list_max(list_transform(samples, x -> abs(x))) AS peak,
                  CAST(length(list_filter(range(1, n_samples),
                    i -> CAST(samples[CAST(i AS INTEGER)] AS BIGINT) * samples[CAST(i AS INTEGER) + 1] < 0))
                    AS INTEGER) AS zero_crossings
           FROM pcm ORDER BY media_id""")),

    // ----------------------------------------------------------------
    // Uniform-stride video frame sampling — pick k ≤ 4 evenly-spaced
    // frames per clip and emit each frame's index + content digest,
    // the shape every video-training pipeline runs before per-frame
    // featurization (Media.extractFeatures does the same maxFrames
    // selection over real AVI/synthetic decode; MediaSpec pins it).
    // Frames are derived relationally: the clip has
    // n_frames = ⌊len/64⌋ + 1 64-byte frames, frame j's bytes are
    // text[64j .. 64j+63], and the sampled indices are
    // ⌊jj·n_frames/k⌋ for jj < k = min(4, n_frames) — strictly
    // increasing (no duplicate frames) since n_frames ≥ k. Scale: a
    // generate bounded at 4 rows per clip then a pure projection —
    // no shuffle, fanout capped by construction, the digest is the
    // only thing that leaves the scan.
    Q("mm_frame_sample",
      (s, d) => {
        Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(3)) === 2 && length(col("text")) > 0)
          .select(col("doc_id").as("media_id"), col("text"),
            (floor(length(col("text")) / 64) + 1).cast("int").as("n_frames"))
          .withColumn("k", least(col("n_frames"), lit(4)))
          .select(col("media_id"), col("text"), col("n_frames"),
            explode(sequence(lit(0), col("k") - 1)).as("jj"))
          .select(col("media_id"), col("text"), col("n_frames"),
            expr("CAST((jj * n_frames) div least(n_frames, 4) AS INT)")
              .as("frame_idx"))
          .withColumn("frame_digest", expr(
            "md5(substring(text, frame_idx * 64 + 1, 64))"))
          .select("media_id", "n_frames", "frame_idx", "frame_digest")
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH clips AS (
             SELECT doc_id AS media_id, text,
                    CAST(length(text) // 64 + 1 AS INTEGER) AS n_frames,
                    CAST(least(length(text) // 64 + 1, 4) AS INTEGER) AS k
             FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0)
           SELECT media_id, n_frames,
                  CAST(jj * n_frames // k AS INTEGER) AS frame_idx,
                  md5(substr(text, CAST(jj * n_frames // k AS INTEGER) * 64 + 1, 64))
                    AS frame_digest
           FROM clips, LATERAL unnest(range(0, k)) AS t(jj)
           ORDER BY media_id, frame_idx"""))
    ,

    // ----------------------------------------------------------------
    // Shot-boundary (scene-cut) detection — the temporal segmentation
    // pass a video-training pipeline runs before clip extraction:
    // per-frame content histogram, L1 distance between CONSECUTIVE
    // frame histograms (one lag window per clip), cut where the
    // distance clears a threshold. Real detectors diff color
    // histograms of decoded frames (Media's decode path); here the
    // frame is the clip's j-th 64-byte block (mm_frame_sample's
    // layout, full frames only) and the "color" histogram is the
    // 4-bin ascii%4 profile — so the whole detector (binning, lag
    // diff, threshold) replays verbatim in DuckDB. Threshold 18 sits
    // at the ~P75 of the observed L1 distribution (range 0–32 on this
    // corpus), sparse-but-nonempty by construction. Scale: frame
    // explode is len/64 rows per clip (linear in bytes), the ONLY
    // shuffle is the per-clip window partitioning (media_id keys,
    // frames co-located), per-frame work O(frame bytes) — the same
    // shape as decoding real frames and diffing their histograms.
    Q("mm_scene_cuts",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.GraftExtensions.register(s)
        val clips = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(3)) === 2 && length(col("text")) >= 128)
          .select(col("doc_id").as("media_id"), col("text"))
        // fused one-pass kernel (graft.functions.FrameHists): all
        // ⌊len/64⌋ per-frame 4-bin histograms in one loop per clip,
        // posexploded and unpacked — same integer counts as the prior
        // explode + per-frame substring + 4 interpreted filter()
        // lambdas (which the oracle SQL keeps)
        val hist = clips
          .select(col("media_id"), posexplode(expr("frame_hists(text)")))
          .select(col("media_id") +: col("pos").as("frame_idx") +:
            (0 until 4).map(b =>
              shiftright(col("col"), 8 * b).bitwiseAND(lit(255L)).as(s"h$b")): _*)
        val w = Window.partitionBy("media_id").orderBy("frame_idx")
        val l1 = (0 until 4)
          .map(b => abs(col(s"h$b") - lag(col(s"h$b"), 1).over(w)))
          .reduce(_ + _)
        hist.withColumn("l1", l1)
          .filter(col("l1") >= 18)
          .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
            col("l1").cast("int").as("l1"))
          .orderBy("media_id", "frame_idx")
      },
      Some {
        val histSql = (0 until 4).map(b =>
          s"length(list_filter(range(1, 65), i -> ascii(substr(frame, CAST(i AS INTEGER), 1)) % 4 = $b)) AS h$b")
          .mkString(",\n                    ")
        s"""WITH clips AS (
             SELECT doc_id AS media_id, text,
                    CAST(length(text) // 64 AS INTEGER) AS n_frames
             FROM documents WHERE doc_id % 3 = 2 AND length(text) >= 128),
           frames AS (
             SELECT media_id, CAST(j AS INTEGER) AS frame_idx,
                    substr(text, CAST(j AS INTEGER) * 64 + 1, 64) AS frame
             FROM clips, LATERAL unnest(range(0, n_frames)) AS t(j)),
           hist AS (
             SELECT media_id, frame_idx,
                    $histSql
             FROM frames),
           d AS (
             SELECT media_id, frame_idx,
                    abs(h0 - lag(h0) OVER w) + abs(h1 - lag(h1) OVER w)
                  + abs(h2 - lag(h2) OVER w) + abs(h3 - lag(h3) OVER w) AS l1
             FROM hist WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx))
           SELECT media_id, frame_idx, CAST(l1 AS INTEGER) AS l1
           FROM d WHERE l1 >= 18 ORDER BY media_id, frame_idx"""
      }),

    // ----------------------------------------------------------------
    // Voice-activity segments — the silence-trimming pass an audio
    // training pipeline runs before transcription/feature extraction:
    // frame the PCM into 64-sample windows, per-window energy
    // (integer sum of squares — exact in both engines), threshold,
    // then contiguous voiced windows merge into segments via the
    // gaps-and-islands pattern (w − row_number() over voiced windows
    // is constant within a run). The PCM is mm_audio_features'
    // relational derivation (sample[i] = ascii(text[i mod len]) − 96
    // over the same audio-kind clips); threshold 58000 ≈ the median
    // window energy of this corpus, giving real segment structure
    // (≈420 segments / 149 clips at sf0.01, runs up to 5 windows).
    // Scale: window explode is n_samples/64 rows per clip (bounded at
    // 32 by the 2048-sample cap), per-window work O(64) over the
    // pre-split char array (never substring-seek — the
    // mm_audio_features O(len²) lesson); the only shuffles are the
    // per-clip window partitioning and the segment groupBy, both
    // keyed media_id — co-located.
    Q("mm_voice_segments",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.GraftExtensions.register(s)
        val clips = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(3)) === 1 && length(col("text")) > 0)
          // same code-point PCM derivation as mm_audio_features —
          // split/length/ascii are code-point functions in BOTH
          // engines (see the note there; non-BMP fixture pinned in
          // MultimodalOpsSpec)
          .select(col("doc_id").as("media_id"),
            least(length(col("text")) * 2, lit(2048)).cast("int").as("n_samples"),
            col("text"))
          .filter(col("n_samples") >= 64)
        // fused one-pass integer kernel (graft.functions.WindowEnergies):
        // all n_samples/64 window energies in one loop per clip, then
        // posexplode — same integer sums as the prior per-window
        // aggregate() lambda (which the oracle SQL keeps) that paid
        // TWO interpreted element_at+ascii evals per sample
        val wins = clips
          .select(col("media_id"),
            posexplode(expr("window_energies(text)")))
          .select(col("media_id"), col("pos").as("w"), col("col").as("sum_sq"))
        val wv = Window.partitionBy("media_id").orderBy("w")
        wins.filter(col("sum_sq") >= 58000)
          .withColumn("rn", row_number().over(wv))
          .groupBy(col("media_id"), (col("w") - col("rn")).as("grp"))
          .agg(min(col("w")).cast("int").as("start_w"),
            max(col("w")).cast("int").as("end_w"),
            count(lit(1)).cast("int").as("n_windows"),
            sum(col("sum_sq")).as("energy"))
          .select("media_id", "start_w", "end_w", "n_windows", "energy")
          .orderBy("media_id", "start_w")
      },
      Some("""WITH clips AS (
             SELECT doc_id AS media_id, text,
                    CAST(least(length(text) * 2, 2048) AS INTEGER) AS n_samples
             FROM documents
             WHERE doc_id % 3 = 1 AND length(text) > 0
               AND least(length(text) * 2, 2048) >= 64),
           wins AS (
             SELECT media_id, CAST(w AS INTEGER) AS w,
                    list_sum(list_transform(
                      range(CAST(w AS INTEGER) * 64, CAST(w AS INTEGER) * 64 + 64),
                      i -> CAST(ascii(substr(text, CAST(i % length(text) AS INTEGER) + 1, 1)) - 96 AS BIGINT)
                         * (ascii(substr(text, CAST(i % length(text) AS INTEGER) + 1, 1)) - 96))) AS sum_sq
             FROM clips, LATERAL unnest(range(0, n_samples // 64)) AS t(w)),
           voiced AS (
             SELECT media_id, w, sum_sq,
                    row_number() OVER (PARTITION BY media_id ORDER BY w) AS rn
             FROM wins WHERE sum_sq >= 58000)
           SELECT media_id, CAST(min(w) AS INTEGER) AS start_w,
                  CAST(max(w) AS INTEGER) AS end_w,
                  CAST(count(*) AS INTEGER) AS n_windows,
                  CAST(sum(sum_sq) AS BIGINT) AS energy
           FROM voiced GROUP BY media_id, w - rn
           ORDER BY media_id, start_w"""))
  )
}
