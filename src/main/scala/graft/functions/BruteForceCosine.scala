package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Blocked brute-force exact-cosine kernels: the candidate side is
  * broadcast once as primitive arrays and every query partition scans
  * it with a tight fused loop — the execution-layer form of the
  * declarative all-pairs plans in
  * [[graft.operators.EmbeddingQueries]].
  *
  * Why `mapPartitions` here (normally the last resort): the inner loop
  * of exact brute-force similarity is a dense GEMV. In the declarative
  * form each of the |q|·|c| pairs materializes a joined row, evaluates
  * the dot-product expression through codegen, and then pays an
  * ObjectHashAggregate buffer update (the typed top-k Aggregator's
  * per-row encode path) — at sf0.1 that row machinery is ~15× the cost
  * of the arithmetic. Here the pair space never becomes rows: each
  * query scans the broadcast block in-cache and only the ≤ k winners
  * (or the ≥ threshold pairs) are emitted. This mirrors MLlib's
  * blocked-BLAS designs (ALS, BlockMatrix), not a driver-side loop —
  * queries stay fully distributed.
  *
  * Determinism (oracle-grade): dots are sequential ascending-index
  * folds with both elements cast to double before multiplying —
  * bit-identical to the `aggregate(zip_with(...))` fold, the
  * `dot_product` codegen expression, and the DuckDB
  * `list_sum(list_transform(...))` oracle. Rounding replicates
  * Catalyst's `Round` on DoubleType exactly:
  * `java.math.BigDecimal.valueOf(d).setScale(s, HALF_UP)` with
  * NaN/Infinity passed through. Equality with the declarative twins is
  * asserted row-for-row in EmbeddingNearDupSpec / CosineTopKSpec.
  *
  * Scale: broadcasting the candidate side is inherent to single-pass
  * exact brute force (every query must see every candidate); the block
  * bound is `maxCandidates` (default 4M rows ≈ 1 GiB at dim 64), past
  * which this method refuses and the caller should either switch to
  * the ANN paths (`emb_ann_lsh` / `emb_ann_ivf` — the declared scale
  * path) or generalize to block-pairs: partition BOTH sides, cross the
  * block ids, run this kernel per block pair, and merge per-query
  * partial top-ks with [[TopKByScore]] (which stays associative for
  * exactly that use).
  */
object BruteForceCosine {

  /** Candidate block in primitive form: ids ascending, row-major
    * float matrix, precomputed L2 norms (same sequential fold).
    */
  final class Block(val ids: Array[Long], val mat: Array[Float],
                    val norms: Array[Double], val dim: Int) extends Serializable {
    def n: Int = ids.length
  }

  /** Catalyst `Round(_, scale)` on DoubleType, exactly. */
  def roundLikeSpark(d: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Ascending-index double-accumulated dot of row `r` of `m` with `q`. */
  @inline private def dotRow(m: Array[Float], r: Int, q: Array[Float], dim: Int): Double = {
    var acc = 0.0
    var i = 0
    val base = r * dim
    while (i < dim) {
      acc += m(base + i).toDouble * q(i).toDouble
      i += 1
    }
    acc
  }

  /** Fill `out(j) = dot(row j, q) / (qn · norms(j))` for every row of
    * the block from `from` on. Four candidate rows are interleaved per
    * dim-loop pass: each row's fold is STILL the ascending-index
    * sequential double accumulation (bit-identical to [[dotRow]] —
    * the four accumulators are independent chains, nothing is
    * reassociated within a chain), but the four independent chains
    * hide the FP-add latency the single-chain loop is bound by
    * (~4-cycle add latency × dim beats throughput by ~4× — measured
    * as the dominant arithmetic cost of the exact twins once the
    * per-pair rounding moved to the boundary pool).
    */
  private def fillSims(b: Block, q: Array[Float], qn: Double,
                       from: Int, out: Array[Double]): Unit = {
    val m = b.mat
    val dim = b.dim
    val n = b.n
    var j = from
    val lim = from + ((n - from) & ~3)
    while (j < lim) {
      val b0 = j * dim; val b1 = b0 + dim; val b2 = b1 + dim; val b3 = b2 + dim
      var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
      var i = 0
      while (i < dim) {
        val qi = q(i).toDouble
        a0 += m(b0 + i).toDouble * qi
        a1 += m(b1 + i).toDouble * qi
        a2 += m(b2 + i).toDouble * qi
        a3 += m(b3 + i).toDouble * qi
        i += 1
      }
      out(j) = a0 / (qn * b.norms(j))
      out(j + 1) = a1 / (qn * b.norms(j + 1))
      out(j + 2) = a2 / (qn * b.norms(j + 2))
      out(j + 3) = a3 / (qn * b.norms(j + 3))
      j += 4
    }
    while (j < n) {
      out(j) = dotRow(m, j, q, dim) / (qn * b.norms(j))
      j += 1
    }
  }

  @inline private def selfNorm(q: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < q.length) { acc += q(i).toDouble * q(i).toDouble; i += 1 }
    math.sqrt(acc)
  }

  private def collectBlock(emb: DataFrame, maxCandidates: Int): Block = {
    val rows = emb.select("vec_id", "embedding").collect()
    require(rows.length <= maxCandidates,
      s"brute-force candidate side has ${rows.length} rows > $maxCandidates; " +
        "use the ANN paths or a block-pair merge (see scaladoc)")
    val sorted = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val n = sorted.length
    val dim = if (n == 0) 0 else sorted(0)._2.length
    val ids = new Array[Long](n)
    val mat = new Array[Float](n * dim)
    val norms = new Array[Double](n)
    var j = 0
    while (j < n) {
      ids(j) = sorted(j)._1
      System.arraycopy(sorted(j)._2, 0, mat, j * dim, dim)
      norms(j) = selfNorm(sorted(j)._2)
      j += 1
    }
    new Block(ids, mat, norms, dim)
  }

  /** Per-cell best-match kernel for the IVF re-rank: the inverted
    * file (cid, embedding, norm, cell) is collected into per-cell
    * [[Block]]s and broadcast once; each probe row (qid, qe, qn, cell)
    * scans ITS cell's block in one tight loop and emits only the
    * cell-local winner. The declarative join form materializes every
    * (query, member) pair as a row — at the 100× operating point
    * ~3 B rows whose join/row machinery costs ~15× the dot-product
    * arithmetic (the same measurement that justifies [[topK]]); here
    * the pair space never becomes rows and the downstream top-1 sees
    * ≤ nProbes rows per query.
    *
    * Determinism (oracle-grade): dots are the shared ascending-index
    * double fold; the winner comparison uses the ROUND-6 sim (
    * [[roundLikeSpark]]) with ascending-cid scan order and
    * strictly-greater replacement, so ties go to the lowest cid —
    * exactly the (sim desc, cid asc) contract of the declarative
    * top-1. Self-pairs (cid == qid) are skipped in-kernel.
    *
    * Scale: bounded by the same corpus ceiling as the vector
    * broadcasts (the caller guards); past it the declarative
    * shuffle-join form is the fallback, same as every other
    * broadcast-kernel in this file.
    */
  def ivfBestInCell(s: SparkSession, assigned: DataFrame,
                    probes: DataFrame, maxCandidates: Int = 4 << 20): DataFrame = {
    import s.implicits._
    val rows = assigned.select("cell", "cid", "ce").collect()
    require(rows.length <= maxCandidates,
      s"IVF kernel corpus side has ${rows.length} rows > $maxCandidates; " +
        "fall back to the declarative join form")
    val byCell: Map[Int, Block] = rows
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1)
      .map { case (cell, members) =>
        val sorted = members.sortBy(_._2)
        val n = sorted.length
        val dim = if (n == 0) 0 else sorted(0)._3.length
        val ids = new Array[Long](n)
        val mat = new Array[Float](n * dim)
        val norms = new Array[Double](n)
        var j = 0
        while (j < n) {
          ids(j) = sorted(j)._2
          System.arraycopy(sorted(j)._3, 0, mat, j * dim, dim)
          norms(j) = selfNorm(sorted(j)._3)
          j += 1
        }
        cell -> new Block(ids, mat, norms, dim)
      }
    val bc = s.sparkContext.broadcast(byCell)
    probes.select("qid", "qe", "cell")
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        // scratch buffer reused across probe rows — raw sims per
        // member, so the BigDecimal round (which allocates) runs only
        // on the handful of near-ties, never per pair: round-6 is
        // MONOTONE, so max(round(x)) = round(max(x)), and only
        // candidates within one rounding step of the raw max can
        // share the rounded max (ties go to the lowest cid, which is
        // ascending scan order here)
        var scratch = new Array[Double](0)
        it.flatMap { case (qid, qe, cell) =>
          bc.value.get(cell) match {
            case None => Iterator.empty
            case Some(b) =>
              if (scratch.length < b.n) scratch = new Array[Double](b.n)
              val qn = selfNorm(qe)
              var rawMax = Double.NegativeInfinity
              var any = false
              var r = 0
              while (r < b.n) {
                if (b.ids(r) != qid) {
                  val sim = dotRow(b.mat, r, qe, b.dim) / (qn * b.norms(r))
                  scratch(r) = sim
                  if (sim > rawMax) { rawMax = sim; any = true }
                } else scratch(r) = Double.NegativeInfinity
                r += 1
              }
              if (!any) Iterator.empty
              else {
                val roundedMax = roundLikeSpark(rawMax, 6)
                var bestCid = -1L
                var r2 = 0
                while (r2 < b.n && bestCid < 0) {
                  // only near-ties can round up to roundedMax
                  if (scratch(r2) > roundedMax - 1e-6 &&
                    roundLikeSpark(scratch(r2), 6) == roundedMax)
                    bestCid = b.ids(r2)
                  r2 += 1
                }
                Iterator.single((qid, bestCid, roundedMax))
              }
          }
        }
      }
      .toDF("qid", "cid", "sim")
  }

  /** Per-cell top-k kernel — [[ivfBestInCell]] generalized from the
    * single winner to the k best: each probe row emits its cell's
    * ≤ k best candidates by (round-6 sim DESC, cid ASC), and the
    * downstream [[TopKByScore]] aggregate merges the per-cell partial
    * top-ks per query (top-k is distributive over any partition of
    * the candidate set, so per-cell-then-global equals global). The
    * declarative form materializes every probed (query, member) pair
    * as a row (~3 B at the 100× operating point, measured 125.7 s for
    * emb_ann_ivf_topk); here the pair space stays in-cache and at most
    * nProbes·k rows per query reach the aggregate.
    *
    * Determinism (oracle-grade): the kept set and its order are
    * decided on ROUNDED sims exactly as the declarative twin ranks
    * them, but the allocating round-6 runs only on a near-boundary
    * pool, never per pair: with kthRaw the k-th largest raw sim in
    * the cell, any candidate whose rounded sim could tie or beat the
    * rounded k-th must have raw > kthRaw − 1e-6 (HALF_UP rounding to
    * 6 dp moves a value by ≤ 5·10⁻⁷, so two sims rounding to the same
    * grid point differ by < 10⁻⁶ raw) — the pool keeps a 2e-6 margin
    * on top. Pool members are rounded, sorted (rounded DESC, cid
    * ASC), and the first k emitted.
    */
  def ivfTopKInCell(s: SparkSession, assigned: DataFrame,
                    probes: DataFrame, k: Int,
                    maxCandidates: Int = 4 << 20): DataFrame = {
    import s.implicits._
    require(k >= 1, "k must be >= 1")
    val rows = assigned.select("cell", "cid", "ce").collect()
    require(rows.length <= maxCandidates,
      s"IVF kernel corpus side has ${rows.length} rows > $maxCandidates; " +
        "fall back to the declarative join form")
    val byCell: Map[Int, Block] = rows
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1)
      .map { case (cell, members) =>
        val sorted = members.sortBy(_._2)
        val n = sorted.length
        val dim = if (n == 0) 0 else sorted(0)._3.length
        val ids = new Array[Long](n)
        val mat = new Array[Float](n * dim)
        val norms = new Array[Double](n)
        var j = 0
        while (j < n) {
          ids(j) = sorted(j)._2
          System.arraycopy(sorted(j)._3, 0, mat, j * dim, dim)
          norms(j) = selfNorm(sorted(j)._3)
          j += 1
        }
        cell -> new Block(ids, mat, norms, dim)
      }
    val bc = s.sparkContext.broadcast(byCell)
    probes.select("qid", "qe", "cell")
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        var scratch = new Array[Double](0)
        // raw k-th-largest selection buffer (insertion-ordered, size k)
        val sel = new Array[Double](k)
        it.flatMap { case (qid, qe, cell) =>
          bc.value.get(cell) match {
            case None => Iterator.empty
            case Some(b) =>
              if (scratch.length < b.n) scratch = new Array[Double](b.n)
              val qn = selfNorm(qe)
              var selN = 0
              var r = 0
              while (r < b.n) {
                if (b.ids(r) != qid) {
                  val sim = dotRow(b.mat, r, qe, b.dim) / (qn * b.norms(r))
                  scratch(r) = sim
                  // keep the k largest raws seen (ascending in sel)
                  if (selN < k) {
                    var i = selN
                    sel(i) = sim
                    while (i > 0 && sel(i - 1) > sel(i)) {
                      val t = sel(i - 1); sel(i - 1) = sel(i); sel(i) = t; i -= 1
                    }
                    selN += 1
                  } else if (sim > sel(0)) {
                    sel(0) = sim
                    var i = 0
                    while (i < k - 1 && sel(i) > sel(i + 1)) {
                      val t = sel(i); sel(i) = sel(i + 1); sel(i + 1) = t; i += 1
                    }
                  }
                } else scratch(r) = Double.NegativeInfinity
                r += 1
              }
              if (selN == 0) Iterator.empty
              else {
                // near-boundary pool: everything whose ROUNDED sim
                // could reach the rounded k-th (see scaladoc margin)
                val kthRaw = sel(0)
                val pool = new scala.collection.mutable.ArrayBuffer[(Double, Long)](k + 4)
                var r2 = 0
                while (r2 < b.n) {
                  if (b.ids(r2) != qid && scratch(r2) > kthRaw - 2e-6)
                    pool += ((roundLikeSpark(scratch(r2), 6), b.ids(r2)))
                  r2 += 1
                }
                pool.sortInPlace()(Ordering.Tuple2(
                  Ordering.Double.TotalOrdering.reverse, Ordering.Long))
                pool.take(k).iterator.map { case (sim, cid) => (qid, cid, sim) }
              }
          }
        }
      }
      .toDF("qid", "cid", "sim")
  }

  /** Whole-pipeline LSH top-1 kernel for the under-broadcast-ceiling
    * regime — [[ivfPqTopKKernel]]'s banded-LSH sibling: one input row
    * per QUERY carries its full multi-probe signature array (the
    * band_probes kernel output, never exploded), and the kernel walks
    * each probed bucket of the broadcast inverted signature file
    * in-cache, dots the members against the raw vector Block, and
    * emits ONE winner row. The declarative form materializes ~2 rows
    * per probe (bucket occupancy ~2 at the sized bits) — 410 M
    * candidate rows at the 100× operating point, each paying two
    * broadcast-hash lookups (qid→qe, cid→ce), a pair-row write, and a
    * hash-aggregate update; LshProfile attributed 43 s of the 55 s
    * wall to the HashedRelation probe alone. Here a probe is one
    * open-addressed lookup into a primitive long table and the
    * candidates never become rows: measured 55.0 → 38.1 s at 100×
    * with a Spark-side signature job, → 32.5 s with the driver-side
    * signing below.
    *
    * Determinism (oracle-grade): dots are the shared ascending-index
    * fold over precomputed norms; the winner rule is
    * [[ivfBestInCell]]'s — round-6 of the raw max, candidates within
    * 1e-6 re-rounded, ties to the LOWEST cid (accumulation order is
    * probe order, so the selection scans the collected candidate list
    * rather than relying on scan order). Duplicate (qid, cid)
    * collisions across bands re-score the same pair to the same sim —
    * a max cannot change, the dedup=false contract of the declarative
    * path.
    *
    * `rawVecs`: (vec_id, embedding); `planesM`: the literal hyperplane
    * matrix (nBands·bits rows — the SAME family the band_probes query
    * side and the oracle replay use); `qSide`: (qid, qe, sigs
    * array<long> — slot i probes band i/nProbes with signature
    * sigs(i)). Output: (qid, cid, sim) ordered by qid — one row per
    * query with ≥ 1 candidate.
    *
    * The inverted signature file is computed ON THE DRIVER from the
    * already-collected block (a parallel loop replicating
    * BandSignatures.nullSafeEval's fold exactly: ascending-index
    * double dot, bit set iff dot ≥ 0) — the first drafts ran a Spark
    * job for n·bands signature rows and collected them (12.8 M boxed
    * rows at the 100× operating point), which cost more than the
    * signing arithmetic itself.
    */
  def lshTop1Kernel(s: SparkSession, rawVecs: DataFrame,
                    planesM: Seq[Seq[Float]],
                    qSide: DataFrame, bits: Int, nProbes: Int,
                    maxCandidates: Int = 4 << 20): DataFrame = {
    import s.implicits._
    val raw = collectBlock(rawVecs, maxCandidates)
    val pl = planesM.map(_.toArray).toArray
    val nPlanes = pl.length
    val nBands = nPlanes / bits
    // CSR bucket layout over the distinct bs keys + an open-addressed
    // primitive long hash table for the probe lookup (a boxed Map
    // would pay an allocation per probe; binary search would pay ~24
    // dependent branches per probe over 205 M probes). Each (bs,
    // member) pair packs into ONE primitive long — bs < bands·2^bits
    // (≤ 2^30 at the caps), block index < 2^22 at maxCandidates — so
    // the sort is a parallel primitive sort.
    val nRows = raw.n * nBands
    val packed = new Array[Long](nRows)
    java.util.stream.IntStream.range(0, raw.n).parallel().forEach { v =>
      val sigs = new Array[Long](nBands)
      var p = 0
      while (p < nPlanes) {
        val plane = pl(p)
        var dot = 0.0
        var j = 0
        val base = v * raw.dim
        while (j < raw.dim) {
          dot += raw.mat(base + j).toDouble * plane(j).toDouble
          j += 1
        }
        if (dot >= 0.0) sigs(p / bits) |= (1L << (p % bits))
        p += 1
      }
      var b = 0
      while (b < nBands) {
        val bs = b.toLong * (1L << bits) + sigs(b)
        packed(v * nBands + b) = (bs << 22) | v.toLong
        b += 1
      }
    }
    java.util.Arrays.parallelSort(packed)
    val bsKeys = new Array[Long](nRows)
    val bucketStart = new Array[Int](nRows + 1)
    val members = new Array[Int](nRows)
    var nKeys = 0
    var r = 0
    while (r < nRows) {
      val bs = packed(r) >>> 22
      if (nKeys == 0 || bsKeys(nKeys - 1) != bs) {
        bsKeys(nKeys) = bs
        bucketStart(nKeys) = r
        nKeys += 1
      }
      members(r) = (packed(r) & ((1L << 22) - 1)).toInt
      r += 1
    }
    bucketStart(nKeys) = nRows
    var cap = 4
    while (cap < nKeys * 2) cap <<= 1
    val htKeys = new Array[Long](cap)
    java.util.Arrays.fill(htKeys, -1L)
    val htSlot = new Array[Int](cap)
    @inline def mix(x0: Long): Int = {
      var x = x0
      x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
      ((x ^ (x >>> 33)) & (cap - 1)).toInt
    }
    var ki = 0
    while (ki < nKeys) {
      var h = mix(bsKeys(ki))
      while (htKeys(h) >= 0) h = (h + 1) & (cap - 1)
      htKeys(h) = bsKeys(ki)
      htSlot(h) = ki
      ki += 1
    }
    val bcRaw = s.sparkContext.broadcast(raw)
    val bcIdx = s.sparkContext.broadcast((bsKeys, bucketStart, members, htKeys, htSlot))
    qSide.select("qid", "qe", "sigs")
      .as[(Long, Array[Float], Array[Long])]
      .mapPartitions { it =>
        var sims = new Array[Double](256)
        var cids = new Array[Long](256)
        it.flatMap { case (qid, qe, sigs) =>
          val b = bcRaw.value
          val (keys, starts, mem, hk, hs) = bcIdx.value
          val qn = selfNorm(qe)
          var nc = 0
          var rawMax = Double.NegativeInfinity
          var i = 0
          while (i < sigs.length) {
            val bs = (i / nProbes).toLong * (1L << bits) + sigs(i)
            var h = mix(bs)
            var slot = -1
            var cont = true
            while (cont) {
              val k = hk(h)
              if (k == bs) { slot = hs(h); cont = false }
              else if (k < 0) cont = false
              else h = (h + 1) & (cap - 1)
            }
            if (slot >= 0) {
              var m = starts(slot)
              val end = starts(slot + 1)
              while (m < end) {
                val idx = mem(m)
                val cid = b.ids(idx)
                if (cid != qid) {
                  val sim = dotRow(b.mat, idx, qe, b.dim) / (qn * b.norms(idx))
                  if (nc == sims.length) {
                    sims = java.util.Arrays.copyOf(sims, nc * 2)
                    cids = java.util.Arrays.copyOf(cids, nc * 2)
                  }
                  sims(nc) = sim; cids(nc) = cid; nc += 1
                  if (sim > rawMax) rawMax = sim
                }
                m += 1
              }
            }
            i += 1
          }
          if (nc == 0) Iterator.empty
          else {
            val roundedMax = roundLikeSpark(rawMax, 6)
            var best = Long.MaxValue
            var j = 0
            while (j < nc) {
              if (cids(j) < best && sims(j) > roundedMax - 1e-6 &&
                roundLikeSpark(sims(j), 6) == roundedMax)
                best = cids(j)
              j += 1
            }
            Iterator.single((qid, best, roundedMax))
          }
        }
      }
      .toDF("qid", "cid", "sim")
      .orderBy("qid")
  }

  /** Whole-pipeline IVF-PQ kernel for the under-broadcast-ceiling
    * regime: per query row, scan the probed cells' PQ blocks with the
    * ADC lookup sum, keep a primitive top-`rerank` heap in (adc desc,
    * cid asc) order, exact-re-rank the survivors against the raw
    * vector Block, and emit ONE winner row. The declarative form
    * materializes the candidate matrix as rows twice (ADC pass +
    * shortlist explode) and exchanges n·rerank partial heaps; here
    * nothing between the probe row and its winner becomes a row.
    *
    * Determinism (oracle-grade, each step replicates its declarative
    * twin exactly): ADC sum is [[AdcSum.eval]]'s ascending-subspace
    * fold over the SAME Spark-computed per-query tables (read from
    * `qSide`, never recomputed); adc_sim = adcSum / (qnrm · nrm) with
    * the stored exact norms; the heap keeps the (score desc, id asc)
    * top-k with [[TopKByScore]]'s boundary semantics (kept set is
    * insertion-order independent); the exact re-rank sorts survivors
    * by ascending cid and applies the monotone-round winner rule of
    * [[ivfBestInCell]]. Past the corpus ceiling the declarative
    * join + aggregate form is the design (coded file still
    * broadcasts ~20× further than raw vectors — that regime keeps the
    * declarative path).
    *
    * Unlike the per-cell IVF kernel, one input row here sees ALL of
    * its query's probed cells, so the top-`emitK` emitted per row is
    * already the FINAL ranking — no downstream merge aggregate. The
    * k-th-boundary rounding pool follows [[ivfTopKInCell]]'s margin
    * argument.
    *
    * `qSide`: (qid, pcells array<int>, adc array<array<double>>,
    * qnrm, qe); `pqCells`: (cell, cid, codes array<int>, nrm);
    * `rawVecs`: (vec_id, embedding). Output: (qid, rnk 1-based, cid,
    * sim) — ≤ emitK rows per query with ≥1 candidate, ordered
    * (qid, rnk); emitK = 1 reproduces the historical top-1 winner
    * bit-for-bit (the pool's first element IS the monotone-round
    * winner rule).
    */
  def ivfPqTopKKernel(s: SparkSession, qSide: DataFrame, pqCells: DataFrame,
                      rawVecs: DataFrame, rerank: Int, emitK: Int = 1,
                      maxCandidates: Int = 4 << 20): DataFrame = {
    import s.implicits._
    val pqRows = pqCells.select("cell", "cid", "codes", "nrm").collect()
    require(pqRows.length <= maxCandidates,
      s"IVF-PQ kernel corpus side has ${pqRows.length} rows > $maxCandidates")
    val byCell: Map[Int, (Array[Long], Array[Int], Array[Double])] = pqRows
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Int](2).toArray, r.getDouble(3)))
      .groupBy(_._1)
      .map { case (cell, members) =>
        val sorted = members.sortBy(_._2)
        val n = sorted.length
        val m = if (n == 0) 0 else sorted(0)._3.length
        val ids = new Array[Long](n)
        val codes = new Array[Int](n * m)
        val nrms = new Array[Double](n)
        var j = 0
        while (j < n) {
          ids(j) = sorted(j)._2
          System.arraycopy(sorted(j)._3, 0, codes, j * m, m)
          nrms(j) = sorted(j)._4
          j += 1
        }
        cell -> ((ids, codes, nrms))
      }
    val raw = collectBlock(rawVecs, maxCandidates)
    val bcPq = s.sparkContext.broadcast(byCell)
    val bcRaw = s.sparkContext.broadcast(raw)
    qSide.select("qid", "pcells", "adc", "qnrm", "qe")
      .as[(Long, Seq[Int], Seq[Seq[Double]], Double, Array[Float])]
      .mapPartitions { it =>
        // primitive (score desc, id asc) bounded min-heap — the
        // TopKByScore order, allocation-free per candidate
        val hs = new Array[Double](rerank)
        val hi = new Array[Long](rerank)
        var hn = 0
        @inline def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
          sa < sb || (sa == sb && ia > ib)
        def offer(score: Double, id: Long): Unit = {
          if (hn < rerank) {
            var i = hn; hs(i) = score; hi(i) = id; hn += 1
            while (i > 0) {
              val p = (i - 1) >> 1
              if (worse(hs(i), hi(i), hs(p), hi(p))) {
                val ts = hs(i); val ti = hi(i)
                hs(i) = hs(p); hi(i) = hi(p); hs(p) = ts; hi(p) = ti; i = p
              } else i = 0
            }
          } else if (worse(hs(0), hi(0), score, id)) {
            hs(0) = score; hi(0) = id
            var i = 0
            var cont = true
            while (cont) {
              val l = 2 * i + 1; val r = l + 1; var w = i
              if (l < hn && worse(hs(l), hi(l), hs(w), hi(w))) w = l
              if (r < hn && worse(hs(r), hi(r), hs(w), hi(w))) w = r
              if (w == i) cont = false
              else {
                val ts = hs(i); val ti = hi(i)
                hs(i) = hs(w); hi(i) = hi(w); hs(w) = ts; hi(w) = ti; i = w
              }
            }
          }
        }
        it.flatMap { case (qid, pcells, adcSeq, qnrm, qe) =>
          val pq = bcPq.value
          val adc = adcSeq.map(_.toArray).toArray
          val m = adc.length
          hn = 0
          var pi = 0
          while (pi < pcells.length) {
            pq.get(pcells(pi)) match {
              case None => ()
              case Some((ids, codes, nrms)) =>
                var r = 0
                while (r < ids.length) {
                  val cid = ids(r)
                  if (cid != qid) {
                    // AdcSum.eval's ascending fold
                    var acc = 0.0
                    var mm = 0
                    val base = r * m
                    while (mm < m) { acc += adc(mm)(codes(base + mm)); mm += 1 }
                    offer(acc / (qnrm * nrms(r)), cid)
                  }
                  r += 1
                }
            }
            pi += 1
          }
          if (hn == 0) Iterator.empty
          else {
            // exact re-rank of the survivors, ascending cid; final
            // top-emitK on ROUNDED sims via the near-boundary pool
            // (see ivfTopKInCell — emitK = 1 degenerates to the
            // monotone-round winner rule)
            val surv = java.util.Arrays.copyOf(hi, hn)
            java.util.Arrays.sort(surv)
            val b = bcRaw.value
            val sims = new Array[Double](hn)
            // k largest raws seen, ascending in sel
            val sel = new Array[Double](emitK)
            var selN = 0
            var si = 0
            while (si < hn) {
              val idx = java.util.Arrays.binarySearch(b.ids, surv(si))
              val sim = dotRow(b.mat, idx, qe, b.dim) / (qnrm * b.norms(idx))
              sims(si) = sim
              if (selN < emitK) {
                var i = selN
                sel(i) = sim
                while (i > 0 && sel(i - 1) > sel(i)) {
                  val t = sel(i - 1); sel(i - 1) = sel(i); sel(i) = t; i -= 1
                }
                selN += 1
              } else if (sim > sel(0)) {
                sel(0) = sim
                var i = 0
                while (i < emitK - 1 && sel(i) > sel(i + 1)) {
                  val t = sel(i); sel(i) = sel(i + 1); sel(i + 1) = t; i += 1
                }
              }
              si += 1
            }
            val kthRaw = sel(0)
            val pool = new scala.collection.mutable.ArrayBuffer[(Double, Long)](emitK + 4)
            var s2 = 0
            while (s2 < hn) {
              if (sims(s2) > kthRaw - 2e-6)
                pool += ((roundLikeSpark(sims(s2), 6), surv(s2)))
              s2 += 1
            }
            pool.sortInPlace()(Ordering.Tuple2(
              Ordering.Double.TotalOrdering.reverse, Ordering.Long))
            pool.take(emitK).iterator.zipWithIndex.map {
              case ((sim, cid), i) => (qid, i + 1, cid, sim)
            }
          }
        }
      }
      .toDF("qid", "rnk", "cid", "sim")
      .orderBy("qid", "rnk")
  }

  /** Per-query top-k over raw sims with the allocating round-6
    * confined to a near-boundary pool — [[ivfTopKInCell]]'s margin
    * argument, shared by [[topK]] and [[topKUnordered]]. The naive
    * form rounded EVERY pair sim through BigDecimal (n² allocations —
    * the dominant cost of the exact twins at sf0.1: 400 M rounds for
    * 20 k vectors); here the k-th largest RAW sim bounds the pool
    * (HALF_UP to 6 dp moves a value ≤ 5·10⁻⁷, so two sims rounding to
    * the same grid point differ < 10⁻⁶ raw; the pool keeps a 2e-6
    * margin) and only pool members are rounded. Returned rows are the
    * first ≤ k of the pool sorted (rounded DESC, cid ASC) — exactly
    * the rounded-sim ranking the declarative twin computes
    * (CosineTopKSpec asserts row-for-row equality, ties included).
    */
  @inline private def topKRowsFor(b: Block, qid: Long, qe: Array[Float],
                                  k: Int, scratch: Array[Double],
                                  sel: Array[Double]): Seq[(Long, Double)] = {
    val n = b.n
    val qn = selfNorm(qe)
    fillSims(b, qe, qn, 0, scratch)
    // self-exclusion: ids are ascending, locate qid once
    val selfIdx = java.util.Arrays.binarySearch(b.ids, qid)
    if (selfIdx >= 0) scratch(selfIdx) = Double.NegativeInfinity
    var selN = 0
    var j = 0
    while (j < n) {
      if (j != selfIdx) {
        val sim = scratch(j)
        // keep the k largest raws seen (ascending in sel)
        if (selN < k) {
          var i = selN
          sel(i) = sim
          while (i > 0 && sel(i - 1) > sel(i)) {
            val t = sel(i - 1); sel(i - 1) = sel(i); sel(i) = t; i -= 1
          }
          selN += 1
        } else if (sim > sel(0)) {
          sel(0) = sim
          var i = 0
          while (i < k - 1 && sel(i) > sel(i + 1)) {
            val t = sel(i); sel(i) = sel(i + 1); sel(i + 1) = t; i += 1
          }
        }
      }
      j += 1
    }
    if (selN == 0) Seq.empty
    else {
      val kthRaw = sel(0)
      val pool = new scala.collection.mutable.ArrayBuffer[(Double, Long)](k + 4)
      var j2 = 0
      while (j2 < n) {
        if (b.ids(j2) != qid && scratch(j2) > kthRaw - 2e-6)
          pool += ((roundLikeSpark(scratch(j2), 6), b.ids(j2)))
        j2 += 1
      }
      pool.sortInPlace()(Ordering.Tuple2(
        Ordering.Double.TotalOrdering.reverse, Ordering.Long))
      pool.take(k).toSeq.map { case (sim, cid) => (cid, sim) }
    }
  }

  /** Exact cosine top-k of every vector against all others (self
    * excluded), ties by ascending candidate id — row-for-row equal to
    * the declarative crossJoin + TopKByScore plan. Raw-sim selection
    * with the round-6 confined to the near-boundary pool (see
    * [[topKRowsFor]]).
    * Output: (qid, rnk 1..k, cid, sim round-6) ordered by (qid, rnk).
    */
  def topK(s: SparkSession, emb: DataFrame, k: Int,
           maxCandidates: Int = 4 << 20): DataFrame = {
    import s.implicits._
    val block = collectBlock(emb, maxCandidates)
    val bc = s.sparkContext.broadcast(block)
    val out = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val b = bc.value
        var scratch = new Array[Double](0)
        val sel = new Array[Double](k)
        it.flatMap { case (qid, qe) =>
          if (scratch.length < b.n) scratch = new Array[Double](b.n)
          topKRowsFor(b, qid, qe, k, scratch, sel).zipWithIndex.map {
            case ((cid, sim), r) => (qid, r + 1, cid, sim)
          }
        }
      }
      .toDF("qid", "rnk", "cid", "sim")
    out.orderBy("qid", "rnk")
  }

  /** Block-nested-loop form of [[topK]] for candidate sides too large
    * to broadcast at once: candidates split into `nBlocks` disjoint
    * hash blocks (pmod of vec_id — membership needs no global sort),
    * the kernel runs once per block against that block's bounded
    * broadcast, and the ≤ k·nBlocks partial winners per query merge
    * through the associative [[TopKByScore]] aggregate (map-side
    * combine; the merge shuffle carries O(queries · k · nBlocks) rows,
    * never a pair matrix). nBlocks passes over the query table is
    * inherent to exact brute force once candidates exceed memory —
    * that IS the block-nested-loop; the ANN paths remain the answer
    * when even that is too much. Row-for-row equal to [[topK]]
    * (CosineTopKSpec asserts it, ties included).
    */
  def topKBlocked(s: SparkSession, emb: DataFrame, k: Int, nBlocks: Int,
                  maxCandidates: Int = 4 << 20): DataFrame = {
    import org.apache.spark.sql.functions._
    TopKByScore.tuneForManyGroups(s)
    val cand = emb.select(col("vec_id"), col("embedding"))
    val partials = (0 until nBlocks).map { b =>
      val block = cand.filter(pmod(col("vec_id"), lit(nBlocks)) === b)
      topKUnordered(s, emb, block, k, maxCandidates)
    }.reduce(_.union(_))
    partials
      .groupBy("qid")
      .agg(TopKByScore.topK(k)(col("sim"), col("cid")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rnk"),
        col("sc.id").as("cid"), col("sc.score").as("sim"))
      .orderBy("qid", "rnk")
  }

  /** One kernel pass of `queries` against the broadcast of `cands`,
    * emitting unranked (qid, cid, sim) partials for a downstream
    * merge.
    */
  private def topKUnordered(s: SparkSession, queries: DataFrame, cands: DataFrame,
                            k: Int, maxCandidates: Int): DataFrame = {
    import s.implicits._
    val block = collectBlock(cands, maxCandidates)
    val bc = s.sparkContext.broadcast(block)
    queries.select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val b = bc.value
        var scratch = new Array[Double](0)
        val sel = new Array[Double](k)
        it.flatMap { case (qid, qe) =>
          if (scratch.length < b.n) scratch = new Array[Double](b.n)
          topKRowsFor(b, qid, qe, k, scratch, sel).map {
            case (cid, sim) => (qid, cid, sim)
          }
        }
      }
      .toDF("qid", "cid", "sim")
  }

  /** Exact cosine near-dup pairs at `threshold` (vid_a < vid_b) —
    * row-for-row equal to the declarative all-pairs plan. Each pair is
    * computed once, on the partition holding its smaller id.
    */
  def nearDupPairs(s: SparkSession, emb: DataFrame, threshold: Double,
                   maxCandidates: Int = 4 << 20): DataFrame = {
    import s.implicits._
    val block = collectBlock(emb, maxCandidates)
    val bc = s.sparkContext.broadcast(block)
    val out = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val b = bc.value
        val n = b.n
        var scratch = new Array[Double](0)
        it.flatMap { case (qid, qe) =>
          if (scratch.length < n) scratch = new Array[Double](n)
          val qn = selfNorm(qe)
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          // ids are sorted ascending: start past qid so only qid < cid
          // pairs are scanned at all.
          val from = java.util.Arrays.binarySearch(b.ids, qid) match {
            case neg if neg < 0 => -neg - 1
            case pos => pos + 1
          }
          fillSims(b, qe, qn, from, scratch)
          var j = from
          while (j < n) {
            // round-6 only near the threshold: HALF_UP to 6 dp moves
            // a value ≤ 5·10⁻⁷, so raw < t − 1e-6 cannot round up to
            // ≥ t — the BigDecimal allocation runs only on the
            // accepted-or-boundary pairs, never per pair (the topK
            // pool argument, threshold edition)
            val raw = scratch(j)
            if (raw >= threshold - 1e-6) {
              val sim = roundLikeSpark(raw, 6)
              if (sim >= threshold) buf += ((qid, b.ids(j), sim))
            }
            j += 1
          }
          buf
        }
      }
      .toDF("vid_a", "vid_b", "sim")
    out.orderBy("vid_a", "vid_b")
  }
}
