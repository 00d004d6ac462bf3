package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency/membership sketches as plain DataFrames.
  *
  * Both sketches here answer questions a 100 TB pipeline cannot afford
  * to answer exactly in one pass:
  *
  *  - [[cmsBuild]]/[[cmsEstimate]] — Count-Min (Cormode & Muthukrishnan
  *    2005): heavy hitters / point frequency estimates in `depth×width`
  *    counters instead of a counter per distinct key. The sketch IS a
  *    tiny DataFrame of (row, bucket, cnt), so it merges across
  *    partitions/batches by summing per cell — Spark's map-side combine
  *    does the partial-sketch merge for free, and a streaming job can
  *    keep it as running state.
  *  - [[bloomBuild]]/[[bloomProbe]] — Bloom membership over 63-bit
  *    words: a broadcastable pre-filter that drops most non-matching
  *    rows BEFORE an expensive shuffle join (the manual analog of the
  *    runtime bloom injection pinned in ScaleTechniquesSpec, but
  *    buildable once and reusable across queries/batches).
  *
  * Hash family mirrors [[Dedup]]: `Md5Hash` derives every hash from an
  * md5 slice (`('0x'||substr(md5(r||':'||x),1,14))::BIGINT`), so the
  * whole sketch — build, merge, estimate — re-derives bit-identically
  * in a SQL oracle; `XxHash` is the cheaper production family with the
  * same shape. Reference scope: the reference engine has no sketches
  * (SURVEY.md §2.13) — this is part of the beyond-reference
  * training-data surface.
  */
object Sketches {

  import Dedup.{HashMode, Md5Hash, XxHash}

  /** Row-`r` hash of an item, in [0, width). */
  private def bucketOf(item: Column, r: Column, width: Int,
      mode: HashMode): Column = mode match {
    case Md5Hash =>
      graft.functions.VectorExpressions
        .hexSliceToLong(md5(concat_ws(":", r, item)), 1, 14) % width
    case XxHash => pmod(xxhash64(r, item), lit(width.toLong))
  }

  /** Build a Count-Min sketch over one item per input row: `depth×width`
    * cells `(r, bucket, cnt)`. Cost is `depth` hashes per row folded by
    * one partially-aggregated groupBy; the result has at most
    * `depth·width` rows regardless of input size (broadcast it).
    * Sketches over different slices of a corpus merge by
    * `union.groupBy(r, bucket).sum(cnt)`.
    */
  def cmsBuild(items: DataFrame, itemCol: Column, depth: Int, width: Int,
      mode: HashMode = XxHash): DataFrame =
    items.select(itemCol.cast("string").as("item"))
      .select(col("item"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .groupBy(col("r"), bucketOf(col("item"), col("r"), width, mode).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate the frequency of each distinct probe item:
    * `min over r of sketch(r, hash_r(item))`, the classic CMS upper
    * bound (`estimate ≥ true count`, within `εN` w.h.p.). The sketch
    * side is ≤ depth·width rows — broadcast — so this is map work plus
    * one tiny per-item min.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, itemCol: Column,
      depth: Int, width: Int, mode: HashMode = XxHash): DataFrame =
    probes.select(itemCol.cast("string").as("item")).distinct()
      .select(col("item"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket", bucketOf(col("item"), col("r"), width, mode))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Number of 63-bit words backing a Bloom filter of `bits` positions.
    * 63 (not 64) bits per word keeps every mask positive in a signed
    * BIGINT — the same arithmetic in any SQL engine, no unsigned types.
    */
  private def words(bits: Int): Int = (bits + 62) / 63

  /** Build a Bloom filter over a key column: `k` hash positions per
    * key, OR-folded into `ceil(bits/63)` BIGINT words `(word_idx,
    * bits)`. The filter is a ≤`words(bits)`-row DataFrame — broadcast
    * it, persist it, or union+`bit_or` it with another batch's filter.
    */
  def bloomBuild(keys: DataFrame, keyCol: Column, bits: Int, k: Int,
      mode: HashMode = XxHash): DataFrame = {
    keys.select(keyCol.cast("string").as("key"))
      .select(col("key"), explode(sequence(lit(0), lit(k - 1))).as("r"))
      .withColumn("pos", bucketOf(col("key"), col("r"), bits, mode))
      .groupBy(expr("CAST(pos DIV 63 AS INT)").as("word_idx"))
      // shiftleft's column-shift form only exists in SQL, hence expr
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))"))
        .as("bits"))
  }

  /** Probe: keep the rows of `df` whose `keyCol` has ALL `k` bits set in
    * the filter (i.e. possible members — false positives at the usual
    * Bloom rate, never false negatives). The word frame folds into ONE
    * broadcast row holding a word_idx→bits map, so the probe is
    * scan-fused map work — no explode, no shuffle, no row
    * multiplication: this is the shape that turns "join 100 TB of rows
    * against 10 M keys" into "drop ~99% of rows before the shuffle".
    */
  def bloomProbe(df: DataFrame, keyCol: Column, filter: DataFrame, bits: Int,
      k: Int, mode: HashMode = XxHash): DataFrame = {
    val m = filter.groupBy().agg(map_from_entries(
      collect_list(struct(col("word_idx"), col("bits")))).as("_bp_map"))
    val posCols = (0 until k).map(r => s"_bp_pos_$r")
    val withPos = (0 until k).foldLeft(df.crossJoin(broadcast(m))) { (d, r) =>
      d.withColumn(posCols(r),
        bucketOf(keyCol.cast("string"), lit(r), bits, mode))
    }
    val allSet = posCols.map { p =>
      expr(s"""(shiftright(
        coalesce(element_at(_bp_map, CAST($p DIV 63 AS INT)), CAST(0 AS BIGINT)),
        CAST($p % 63 AS INT)) & 1) = 1""")
    }.reduce(_ && _)
    withPos.filter(allSet).drop("_bp_map" +: posCols: _*)
  }

  /** HyperLogLog register table (Flajolet et al. 2007): one row per
    * occupied register `(bucket, rho)` where `bucket = hash_b(x) mod m`
    * and `rho` is the 1-based position of the leftmost 1-bit in an
    * independent 40-bit hash (`w = 0` → 41). No distinct pass is needed
    * — duplicates of an item produce the identical (bucket, rho), and
    * the `max` absorbs them — so the build is ONE map-side-combined
    * groupBy over the raw stream: the 100 TB cardinality shape.
    * Registers from different corpus slices merge by
    * `union.groupBy(bucket).max(rho)` (same law CMS uses with `sum`).
    *
    * Md5Hash mode derives both hashes from md5 slices (`'b:'||x` for
    * the bucket, `'r:'||x` for the rank word), so the register table —
    * and everything downstream of it — re-derives bit-identically in a
    * SQL oracle. `rho = 41 - length(bin(w))` works because both Spark
    * and DuckDB print `bin()` without leading zeros.
    */
  def hllRegisters(items: DataFrame, itemCol: Column, m: Int,
      mode: HashMode = XxHash): DataFrame =
    hllRegistersBy(items, Nil, itemCol, m, mode)

  /** Per-GROUP HLL register table: [[hllRegisters]] keyed by the
    * caller's group columns — the building block of the incremental
    * distinct-count view
    * ([[graft.io.Maintenance.maintainDistinctView]]). Still ONE
    * map-side-combined groupBy over the raw stream (duplicates of an
    * item collapse into the identical (group, bucket, rho) row before
    * the shuffle); per-group tables from different corpus slices
    * max-merge per (group, bucket), the same union law as
    * [[hllMerge]].
    */
  def hllRegistersBy(items: DataFrame, keys: Seq[String], itemCol: Column,
      m: Int, mode: HashMode = XxHash): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
    val x = itemCol.cast("string")
    val (bucket, w) = mode match {
      case Md5Hash => (
        graft.functions.VectorExpressions
          .hexSliceToLong(md5(concat(lit("b:"), x)), 1, 14) % m,
        graft.functions.VectorExpressions
          .hexSliceToLong(md5(concat(lit("r:"), x)), 1, 10))
      case XxHash => (pmod(xxhash64(lit("b"), x), lit(m.toLong)),
        pmod(xxhash64(lit("r"), x), lit(1L << 40)))
    }
    items.select(keys.map(col) :+ bucket.as("bucket") :+
        when(w === 0, lit(41)).otherwise(lit(41) - length(bin(w)))
          .cast("long").as("rho"): _*)
      .groupBy((keys :+ "bucket").map(col): _*).agg(max("rho").as("rho"))
  }

  /** Max-merge HLL register tables into the register table of the
    * UNION of their underlying sets — `max` per bucket is exactly what
    * [[hllRegisters]]' own groupBy computes over the concatenated
    * stream, so `registers(A) ⊔ registers(B) = registers(A ∪ B)`
    * bit-for-bit (pinned in SketchesSpec). This is the set-algebra
    * primitive: with union estimates in hand, intersections fall out
    * of inclusion-exclusion ([[graft.queries.SketchQueries]] `sk4`)
    * without ever joining the underlying data — the 100 TB way to ask
    * "how much do these two corpus slices overlap?".
    */
  def hllMerge(regs: Seq[DataFrame]): DataFrame =
    regs.reduce(_ unionByName _).groupBy("bucket").agg(max("rho").as("rho"))

  /** CMS inner-product join-size estimate (Cormode & Muthukrishnan
    * 2005 §4.2): for sketches of the two join inputs' key columns,
    * `min over r of Σ_w cntA[r,w]·cntB[r,w]` estimates
    * `|A ⋈ B| = Σ_k f_A(k)·f_B(k)`. Every true-key product lands in
    * some shared cell and cross terms are non-negative, so the
    * estimate NEVER undershoots (`est ≥ exact`, deterministically —
    * the same one-sided guarantee sk1 exhibits for point counts).
    * Absent (r, bucket) pairs contribute 0, and an r-row with no
    * overlapping cells makes the whole estimate 0 (the left join from
    * the full r range below — an empty intersection must not fall
    * back to the min of the populated rows).
    *
    * This is the sketch-side answer to a planning question a 100 TB
    * engine must not answer by running the join: estimate the output
    * size first from two ≤depth·width-row sketches (built in one
    * map-side-combined pass each, mergeable across corpus slices),
    * then pick broadcast vs shuffle vs salted from the estimate.
    */
  def cmsInnerProduct(a: DataFrame, b: DataFrame, depth: Int): DataFrame = {
    val perR = a.select(col("r"), col("bucket"), col("cnt").as("_cnt_a"))
      .join(broadcast(b.select(col("r"), col("bucket"), col("cnt").as("_cnt_b"))),
        Seq("r", "bucket"))
      .groupBy("r").agg(sum(col("_cnt_a") * col("_cnt_b")).as("_p"))
    a.sparkSession.range(depth).select(col("id").cast("int").as("r"))
      .join(perR, Seq("r"), "left")
      .agg(min(coalesce(col("_p"), lit(0L))).as("est"))
  }

  // ---- KMV / theta bottom-k distinct sketch ----

  /** KMV hash domain: 56 bits, so `(k-1)·space` and `|A∩B|·space` both
    * stay inside a signed 64-bit integer for k ≤ 128 — the estimators
    * below are EXACT integer arithmetic, bit-identical in any engine.
    */
  val KmvSpace: Long = 1L << 56

  /** 56-bit item hash in [0, [[KmvSpace]]): md5 mode slices the hex
    * digest exactly as the SQL oracle re-derives it
    * (`('0x'||substr(md5('t:'||x),1,14))::BIGINT`); xxhash is the
    * cheaper production family with the same shape.
    */
  private def kmvHash(itemCol: Column, mode: HashMode): Column = mode match {
    case Md5Hash => graft.functions.VectorExpressions
      .hexSliceToLong(md5(concat(lit("t:"), itemCol.cast("string"))), 1, 14)
    case XxHash => pmod(xxhash64(lit("t"), itemCol.cast("string")), lit(KmvSpace))
  }

  /** Bounded bottom-k-distinct-hashes aggregator — the KMV / theta
    * sketch kernel (Bar-Yossef et al. 2002; the basis of Apache
    * DataSketches' theta family). The buffer is a sorted array of at
    * most `k` DISTINCT hash values; `reduce` is a binary-search insert
    * that drops anything above the current kth minimum, `merge` is a
    * sorted-distinct merge truncated at `k`. Both are associative,
    * commutative, and duplicate-insensitive, so Spark partial-aggregates
    * map-side: 100 TB of raw rows reduce to one ≤k-long array per
    * partition before any exchange — the raw hashes NEVER shuffle.
    * Bottom-k of a set is order-insensitive, so the result is
    * deterministic under any partitioning.
    */
  class KmvAggregator(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Seq[Long]] {
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    def zero: Array[Long] = Array.empty[Long]
    def reduce(b: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) b // duplicate hash: sketch unchanged
      else {
        val ins = -pos - 1
        if (b.length < k) {
          val out = new Array[Long](b.length + 1)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, b.length - ins)
          out
        } else if (ins >= k) b // above the kth minimum: unchanged
        else {
          val out = new Array[Long](k)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
          out
        }
      }
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(k, x.length + y.length))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < x.length || j < y.length)) {
        val v =
          if (i >= x.length) { val v = y(j); j += 1; v }
          else if (j >= y.length) { val v = x(i); i += 1; v }
          else if (x(i) < y(j)) { val v = x(i); i += 1; v }
          else if (x(i) > y(j)) { val v = y(j); j += 1; v }
          else { val v = x(i); i += 1; j += 1; v }
        out(n) = v; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Build the KMV sketch of a key column: one row per kept hash
    * (`h`, ascending; ≤ k rows total regardless of input size). Unlike
    * [[hllRegisters]] this sketch supports DIRECT intersection
    * ([[kmvIntersect]]) — the theta-sketch advantage over HLL
    * inclusion-exclusion, whose error compounds through three
    * estimates.
    */
  def kmvSketch(items: DataFrame, itemCol: Column, k: Int,
      mode: HashMode = XxHash): DataFrame = {
    require(k >= 2 && k <= 128, s"k must be in [2, 128], got $k")
    val spark = items.sparkSession
    import spark.implicits._
    items.select(kmvHash(itemCol, mode).as("h")).as[Long]
      .select(new KmvAggregator(k).toColumn.name("hs"))
      .toDF("hs")
      .select(explode(col("hs")).as("h"))
  }

  /** One row `(n, theta)`: how full the sketch is and its threshold —
    * `theta = kth-minimum hash` once saturated, else the full
    * [[KmvSpace]] (the sketch then holds the EXACT distinct hash set).
    */
  private def kmvTheta(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("n"), max(col("h")).as("_mx"))
      .select(col("n"),
        when(col("n") < k, lit(KmvSpace)).otherwise(col("_mx")).as("theta"))

  /** Distinct-count estimate, one row `(est)`: exact `n` while the
    * sketch is unsaturated, else the classic `(k-1)·space DIV theta`
    * (k-1, not k: the kth minimum itself is the threshold, and using k
    * would bias high). Exact integer arithmetic throughout.
    */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    kmvTheta(sketch, k).select(
      when(col("n") < k, col("n"))
        .otherwise(expr(s"${(k - 1).toLong * KmvSpace}L DIV theta"))
        .as("est"))

  /** Union sketch: bottom-k of the merged hash sets — identical to the
    * sketch of the concatenated inputs (pinned in SketchesSpec), since
    * every hash below the union's kth minimum is below its own side's
    * kth minimum too. k-row frames in, k-row frame out.
    */
  def kmvUnion(sketches: Seq[DataFrame], k: Int): DataFrame =
    sketches.reduce(_ unionByName _).distinct().orderBy("h").limit(k)

  /** DIRECT intersection estimate, one row `(est)`: count the hashes
    * present in BOTH sketches below `theta = min(theta_a, theta_b)`,
    * then scale by `space/theta` — each survivor is a uniform sample of
    * the true intersection at rate `theta/space`. When both sketches
    * are unsaturated (`theta = space`) the estimate is EXACT. This is
    * the query HLL fundamentally cannot answer without chaining three
    * estimates' errors ([[graft.queries.SketchQueries]] sk4 vs sk6).
    */
  def kmvIntersect(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val th = kmvTheta(a, k).select(col("theta").as("_ta"))
      .crossJoin(kmvTheta(b, k).select(col("theta").as("_tb")))
      .select(least(col("_ta"), col("_tb")).as("_theta"))
    a.join(b, Seq("h"))
      .crossJoin(broadcast(th))
      .filter(col("h") < col("_theta"))
      .agg(count(lit(1)).as("_c"))
      .crossJoin(broadcast(th))
      .select(expr(s"_c * ${KmvSpace}L DIV _theta").as("est"))
  }

  // ---- HDR-style log-bucket quantile sketch ----

  /** Mergeable quantile sketch over POSITIVE integer values (HdrHistogram
    * / DDSketch shape, public-domain classics): bucket key =
    * `nbits·32 + (v >> max(nbits−5, 0))` where `nbits = length(bin(v))`
    * — the binary octave plus 4 sub-bucket bits, ALL integer bit
    * arithmetic (the same `bin()` trick [[hllRegisters]] relies on), so
    * the sketch re-derives bit-identically in SQL. Values below 2^5
    * get exact singleton buckets; above, relative bucket width is
    * 2^-4 = 6.25% — the guaranteed quantile error bound. The sketch is
    * `(bkey, cnt)` with at most ~32·64 rows regardless of input size;
    * build is one map + one map-side-combined groupBy (the 100 TB
    * shape), and sketches of corpus slices merge by
    * [[hdrMerge]]'s per-bucket sum — the same law CMS uses.
    */
  def hdrSketch(items: DataFrame, centsCol: Column): DataFrame =
    hdrSketchBy(items, Nil, centsCol)

  /** Per-GROUP HDR sketch: [[hdrSketch]] keyed by the caller's group
    * columns — the building block of the incremental quantile view
    * ([[graft.io.Maintenance.maintainQuantileView]]). Per-group
    * sketches from corpus slices SUM-merge per (group, bkey); the
    * standing state is ≤ ~2k buckets per key regardless of input size.
    */
  def hdrSketchBy(items: DataFrame, keys: Seq[String],
      centsCol: Column): DataFrame =
    items.select(keys.map(col) :+ centsCol.as("cents"): _*)
      .filter(col("cents") > 0)
      .withColumn("nbits", length(bin(col("cents"))))
      .withColumn("bkey", col("nbits").cast("long") * 32 +
        expr("shiftright(cents, CAST(GREATEST(nbits - 5, 0) AS INT))"))
      .groupBy((keys :+ "bkey").map(col): _*).agg(count(lit(1)).as("cnt"))

  /** Sum-merge HDR sketches — per bucket, counts add, exactly what
    * [[hdrSketch]]'s own groupBy computes over the concatenated input
    * (pinned in SketchesSpec): the streaming/multi-slice story.
    */
  def hdrMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _).groupBy("bkey").agg(sum("cnt").as("cnt"))

  /** Inclusive lower bound of a bucket key — exact integer decode:
    * singleton region returns the value itself, log region shifts the
    * kept 5 bits back up.
    */
  private val hdrLoExpr =
    "CASE WHEN bkey DIV 32 <= 5 THEN bkey % 32" +
      " ELSE shiftleft(bkey % 32, CAST(bkey DIV 32 - 5 AS INT)) END"

  /** Quantile estimates from an HDR sketch: for each requested
    * permille, the LOWER BOUND of the first bucket whose cumulative
    * count reaches rank `ceil(q·n/1000)` — a deterministic integer, at
    * most 6.25% below the true discrete quantile. The cumulative
    * window runs over the ≤~2k-row sketch (never the data), and every
    * arithmetic step is exact integers.
    */
  def hdrQuantiles(sketch: DataFrame, qPermille: Seq[Int]): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    // constant partition key: the cumulative window already funnels the
    // ≤~2k-row sketch through one task either way (hash-on-constant vs
    // the global window's single-partition exchange); spelling it as
    // PARTITION BY 1 keeps it admissible under PlanGuards' global-window
    // refusal without a session opt-out
    val cum = sketch.withColumn("cum",
      sum("cnt").over(org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy("bkey")
        .rowsBetween(Long.MinValue, 0)))
    val tot = sketch.agg(sum("cnt").as("n"))
    qPermille.toDF("q_permille")
      .crossJoin(broadcast(tot))
      .withColumn("r", expr("(q_permille * n + 999) DIV 1000"))
      .join(broadcast(cum), col("cum") >= col("r"))
      .groupBy("q_permille").agg(min("bkey").as("bkey"))
      .withColumn("est_lo_cents", expr(hdrLoExpr))
      .select("q_permille", "est_lo_cents")
  }

  /** [[hdrQuantiles]] per GROUP over a [[hdrSketchBy]] table: one
    * `(keys…, q_permille, est_lo_cents)` row per group × quantile.
    * The cumulative window partitions on the group key over the
    * ≤ ~2k-buckets-per-key sketch (never the data); the rank probe is
    * an equi join on the keys with the rank test as residual.
    */
  def hdrQuantilesBy(sketch: DataFrame, keys: Seq[String],
      qPermille: Seq[Int]): DataFrame = {
    require(keys.nonEmpty, "use hdrQuantiles for the ungrouped sketch")
    val spark = sketch.sparkSession
    import spark.implicits._
    val cum = sketch.withColumn("cum",
      sum("cnt").over(org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*).orderBy("bkey")
        .rowsBetween(Long.MinValue, 0)))
    val tot = sketch.groupBy(keys.map(col): _*).agg(sum("cnt").as("n"))
    val probes = tot.crossJoin(broadcast(qPermille.toDF("q_permille")))
      .withColumn("r", expr("(q_permille * n + 999) DIV 1000"))
      .select(keys.map(k => col(k).as(s"_p_$k")) :+
        col("q_permille") :+ col("r"): _*)
    cum.join(probes,
        keys.map(k => cum(k) <=> col(s"_p_$k")).reduce(_ && _) &&
          col("cum") >= col("r"))
      .groupBy((keys :+ "q_permille").map(col): _*)
      .agg(min("bkey").as("bkey"))
      .withColumn("est_lo_cents", expr(hdrLoExpr))
      .select((keys :+ "q_permille" :+ "est_lo_cents").map(col): _*)
  }

  /** Scaled-integer alpha numerators: `round(alpha_m * 1000)` for the
    * published constants (m=16: 0.673, m=32: 0.697, m=64: 0.709).
    * Larger m would overflow the exact-integer estimate below.
    */
  private val HllAlpha1000 = Map(16 -> 673L, 32 -> 697L, 64 -> 709L)

  /** The register counts the exact-integer estimator supports. */
  val hllAlphaMs: Seq[Int] = HllAlpha1000.keys.toSeq.sorted

  /** Raw HLL estimate from a register table, in EXACT integer
    * arithmetic: `E = alpha_m * m^2 / sum(2^-rho)` becomes
    * `(alpha1000 * m^2 * 2^41) DIV (1000 * S)` with
    * `S = sum(2^(41-rho))` (absent registers contribute `2^41`). Every
    * intermediate fits a signed 64-bit integer for m ≤ 64, so the
    * estimate is bit-identical in any engine — no floating point
    * anywhere. Returns one row `(m, n_empty, est)`; this is the RAW
    * estimator (no small/large-range correction — callers see
    * `n_empty` and can apply linear counting themselves).
    */
  def hllEstimate(registers: DataFrame, m: Int): DataFrame =
    hllEstimateBy(registers, Nil, m).select("m", "n_empty", "est")

  /** [[hllEstimate]] per GROUP over a [[hllRegistersBy]] table: one
    * `(keys…, m, n_empty, est)` row per group, same exact-integer
    * estimator (bit-identical in any engine). A group whose registers
    * were never touched simply has no row — the caller's join decides
    * whether that reads as 0 or as absent.
    */
  def hllEstimateBy(registers: DataFrame, keys: Seq[String], m: Int)
      : DataFrame = {
    val alpha = HllAlpha1000.getOrElse(m,
      throw new IllegalArgumentException(s"m must be one of ${HllAlpha1000.keys.toSeq.sorted}, got $m"))
    val grouped =
      if (keys.isEmpty) registers.groupBy()
      else registers.groupBy(keys.map(col): _*)
    grouped
      .agg(count(lit(1)).as("_n_present"),
        coalesce(sum(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(41 - rho AS INT))")), lit(0L))
          .as("_s_present"))
      .select(keys.map(col) ++ Seq(lit(m.toLong).as("m"),
        (lit(m.toLong) - col("_n_present")).as("n_empty"),
        expr(s"(${alpha}L * ${m.toLong * m} * shiftleft(CAST(1 AS BIGINT), 41))" +
          s" DIV (1000 * (_s_present + (${m.toLong} - _n_present)" +
          " * shiftleft(CAST(1 AS BIGINT), 41)))").as("est")): _*)
  }

  // ---- SQL mirrors (DuckDB oracle fragments) ----

  /** The md5-mode bucket as SQL text: `('0x'||substr(md5(r||':'||x),1,14))
    * ::BIGINT % width` — bit-identical to [[bucketOf]]'s Md5Hash path.
    */
  def bucketSql(item: String, r: String, width: Int): String =
    s"(('0x' || substr(md5($r || ':' || $item), 1, 14))::BIGINT % $width)"
}
