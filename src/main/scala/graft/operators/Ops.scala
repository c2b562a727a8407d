package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operational helpers from the reference's macro surface (SURVEY §2.8). */
object Ops {

  /** Fan a narrow input out to the session's parallelism before CPU-heavy
    * per-row work. Single-file/single-row-group parquet scans plan as ONE
    * task, leaving every core but one idle until the first exchange; a
    * round-robin repartition of a small corpus costs microseconds and buys
    * full parallelism. No-op when the input already has enough partitions
    * (the many-files case at scale), so this never adds a shuffle of big
    * data. The `df.rdd` probe does force physical planning of a frame that
    * is then discarded, but spread is only applied to raw scans (planning
    * is trivial) and the alternatives are wrong: `inputFiles.length` ignores
    * both file splitting (one big splittable file → many tasks) and bin
    * packing (many tiny files → few tasks), which decides this in the wrong
    * direction on exactly the cases that matter. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** C8 gap detection (/root/reference/macros/get_missing_dates.sql:3-23):
    * a date spine anti-joined against the distinct days present in `dateCol`.
    * The reference spines the last 7 days from now; this generalizes to an
    * explicit [start, end] so results are deterministic and testable.
    * Spine generation is `sequence`+`explode` (no shuffle); the anti-join
    * broadcasts the spine. */
  def missingDates(df: DataFrame, dateCol: String, start: Column, end: Column): DataFrame = {
    val spark = df.sparkSession
    val spine = spark.range(1)
      .select(explode(sequence(start.cast("date"), end.cast("date"))).as("missing_date"))
    val present = df.select(date_trunc("day", col(dateCol)).cast("date").as("d")).distinct()
    spine.join(present, spine("missing_date") === present("d"), "left_anti")
  }

  /** The reference's exact call shape (get_missing_dates.sql:5-6): gaps in
    * the trailing `days`-day window ending at `asOf` (current_date by
    * default — pass an explicit date to test deterministically). */
  def missingDatesLastDays(df: DataFrame, dateCol: String, days: Int = 7,
      asOf: Column = current_date()): DataFrame = {
    require(days > 0, s"days must be positive, got $days") // sequence() would
    // otherwise run BACKWARD from asOf+1 and report tomorrow as missing
    missingDates(df, dateCol, date_sub(asOf.cast("date"), days - 1), asOf)
  }

  /** Gap-based sessionization: assign rows to sessions per key, starting a
    * new session when the gap to the previous event exceeds `gapSeconds`.
    * One shuffle on the key (the window); the session id is a running sum
    * of session-start flags — pure window arithmetic, no iteration. `tiebreak`
    * orders same-instant events deterministically. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val order = col(tsCol) +: tiebreak.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isStart = prev.isNull || (unix_micros(col(tsCol)) - prev) > gapSeconds * 1000000L
    df.withColumn("session_no",
      sum(when(isStart, 1L).otherwise(0L)).over(w))
  }

  /** P5 ordered dedup: keep the first row per key by `order` (reference
    * `row_number() ... where rn = 1`, stg_dim_products.sql:152,180). */
  def dedupFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Linear-counting distinct estimator (Whang et al., TODS 1990) per
    * group: bucket = md5-hash32(value) mod m, estimate = m·ln(m/empty)
    * with empty = m − buckets hit. Chosen over HLL because the WHOLE
    * sketch is deterministic relational algebra — the bucket-hit count is
    * an exact aggregation and the estimator a pure projection, so any
    * engine (and the DuckDB oracle) reproduces it bit-for-bit, while
    * HLL implementations differ across engines and can't be hash-gated.
    *
    * Accuracy: standard error ≈ √m⁻¹·(e^{n/m}−n/m−1)^{1/2} — ~1-2% for
    * n ≲ m; size m to the expected cardinality (the classic load factor
    * tables allow n up to ~12×m at coarser error). A saturated sketch
    * (every bucket hit) has no estimate and returns NULL — resize m.
    *
    * Scale shape: one map-side-combinable distinct-aggregation whose
    * exchange carries at most m rows per group (never the value column
    * itself), then a scalar projection. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], value: Column,
      m: Int = 4096): DataFrame = {
    require(m > 0, "m must be positive")
    val hit = count_distinct(pmod(graft.functions.SqlFunctions.hash32(
      value.cast("string")), lit(m)))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), hit.cast("long").as("buckets_hit"))
      .withColumn("est_distinct",
        when(col("buckets_hit") === m, lit(null).cast("double"))
          .otherwise(round(lit(m.toDouble) *
            log(lit(m.toDouble) / (lit(m.toDouble) - col("buckets_hit"))), 4)))
  }

  /** The [[distinctSketch]] linear-counting sketch factored into
    * PERSISTABLE state: each input row becomes one (group, widx, word)
    * row setting a single bit of the group's m-bit bucket bitmap
    * (bucket = hash32 mod m, word `widx` = bucket/64, bit = bucket%64).
    * `bit_or` over words is a commutative monoid, so ANY batching of the
    * history merges to the same state —
    * [[graft.core.TableIO.upsertAggregate]]'s `bit_or` channel maintains
    * it incrementally at keys = group ∪ {widx}, which makes COUNT
    * DISTINCT incrementally maintainable: the one aggregate a plain
    * sum/min/max rollup cannot express (dropping a batch's duplicate
    * values loses nothing — the bit was already set).
    *
    * Scale shape: pure per-row projection here; the maintainer's state
    * is ≤ m/64 words per group regardless of corpus size, and its
    * exchange carries words, never values. Same deterministic md5 hash
    * as every sketch in the engine — a SQL oracle replays it exactly. */
  def distinctStateRows(df: DataFrame, groupCols: Seq[String], value: Column,
      m: Int = 4096): DataFrame = {
    require(m > 0 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
    val bucket = pmod(graft.functions.SqlFunctions.hash32(value.cast("string")), lit(m))
    df.select(groupCols.map(col) :+ (bucket / 64).cast("int").as("widx") :+
      call_function("shiftleft", lit(1L), pmod(bucket, lit(64)).cast("int")).as("word"): _*)
  }

  /** Estimate per-group distinct counts from [[distinctStateRows]] state
    * (at ANY grain — raw rows or the maintained (group, widx) table):
    * buckets_hit = Σ popcount(word per widx), then the identical
    * linear-counting formula as [[distinctSketch]] — a fresh one-shot
    * sketch and a long-maintained state estimate the same corpus
    * identically (gated in CoreSpec). */
  def estimateDistinctFromState(state: DataFrame, groupCols: Seq[String],
      wordCol: String, m: Int): DataFrame = {
    require(m > 0 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
    val g = groupCols.map(col)
    // OR per (group, widx) FIRST: at raw row grain the same bit arrives
    // many times and a popcount sum would double-count it; on maintained
    // state (one row per widx) the OR is an exact no-op
    state.groupBy(g :+ col("widx"): _*).agg(expr(s"bit_or($wordCol)").as("__w"))
      .groupBy(g: _*)
      .agg(sum(bit_count(col("__w"))).cast("long").as("buckets_hit"))
      .withColumn("est_distinct",
        when(col("buckets_hit") === m, lit(null).cast("double"))
          .otherwise(round(lit(m.toDouble) *
            log(lit(m.toDouble) / (lit(m.toDouble) - col("buckets_hit"))), 4)))
  }

  /** Bloom-pruned left-semi join: EXACT `big ⋉ keys` semantics, with a
    * Bloom filter of the key set applied to the big side BEFORE its
    * shuffle, so definite non-members die in the scan stage. False
    * positives survive the prefilter and are removed by the residual exact
    * semi join; false negatives are impossible — the result is identical
    * to the plain semi join, which is exactly what any oracle runs. The
    * explicit, reusable counterpart of Spark's own `InjectRuntimeFilter`:
    * the filter is deterministic (md5-hash32, like every sketch in this
    * engine), can be built once for a standing blocklist, and its
    * selectivity is auditable.
    *
    * Scale shape: the filter is built DISTRIBUTED — each key sets
    * `numHashes` bits, bits reduce to 64-bit words via a map-side-
    * combinable `bit_or` groupBy, and the driver collects only the
    * mBits/64-row word table (sketch-sized, never key-sized — the same
    * contract as the k-means centroid sync). The probe inlines the words
    * as ONE array literal plus a 64-entry mask table, so the big side's
    * test is a pure projection: no fan-out, no exchange, ~numHashes md5s
    * per row. False-positive rate ≈ (1−e^(−kn/m))^k — size mBits ≳ 10×
    * |keys| for ~1-2%. */
  def bloomSemiJoin(big: DataFrame, keys: DataFrame, bigKey: String,
      keyCol: String, mBits: Int = 1 << 16, numHashes: Int = 4): DataFrame =
    // NULL keys: the probe evaluates NULL → filter drops the row, matching
    // semi-join semantics (NULL never matches)
    big.filter(bloomProbe(keys, keyCol, col(bigKey), mBits, numHashes))
      .join(keys.select(col(keyCol).as(bigKey)), Seq(bigKey), "left_semi")

  /** The Bloom membership test of [[bloomSemiJoin]] as a standalone
    * predicate: builds the word table DISTRIBUTED from `keys` (the driver
    * collects only mBits/64 words), returns a codegen'd test of `probeCol`
    * against it — no false negatives, FP rate as documented above. Use it
    * directly when the caller's join shape isn't a semi join (e.g. the
    * anti-join in [[Corpus.dedupIncremental]], where rows surviving the
    * probe feed a LeftAnti instead of a residual semi). Runs one Spark job
    * (the word-table reduce) at call time. */
  def bloomProbe(keys: DataFrame, keyCol: String, probeCol: Column,
      mBits: Int = 1 << 16, numHashes: Int = 4): Column = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(numHashes > 0, "numHashes must be positive")
    import graft.functions.SqlFunctions.hash32
    val maskLit = typedlit((0 until 64).map(1L << _))
    def bit(k: Column, r: Column): Column =
      pmod(hash32(concat(r.cast("string"), lit(":"), k)), lit(mBits.toLong))
    // replicate rows before hashing (one md5 per (key, r) — the generator
    // rule, same as the count-min grid build)
    val wordRows = keys.select(col(keyCol).cast("string").as("__k"))
      .where(col("__k").isNotNull)
      .select(col("__k"), explode(sequence(lit(0), lit(numHashes - 1))).as("__r"))
      .select(bit(col("__k"), col("__r")).as("__bit"))
      .select(shiftright(col("__bit"), 6).cast("int").as("__w"),
        element_at(maskLit, pmod(col("__bit"), lit(64L)).cast("int") + 1).as("__m"))
      .groupBy("__w").agg(bit_or(col("__m")).as("__or"))
      .collect()
    val words = new Array[Long](mBits / 64)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    val wordsLit = typedlit(words.toSeq)
    (0 until numHashes).map { r =>
      val b = bit(probeCol.cast("string"), lit(r))
      (element_at(wordsLit, shiftright(b, 6).cast("int") + 1)
        .bitwiseAND(element_at(maskLit, pmod(b, lit(64L)).cast("int") + 1))) =!= 0L
    }.reduce(_ && _)
  }

  /** EXACT edit-distance-1 candidate pairs under content-derived blocking —
    * the record-linkage self-join whose block count GROWS with the corpus
    * instead of being pinned to a fixed attribute cross product.
    *
    * Scheme (PassJoin-family pigeonhole, Li et al. 2011, re-derived):
    *  - equal-length pairs: lev ≤ 1 at equal length ⟺ identical or one
    *    substitution. The string splits into `segments` fixed slices
    *    (boundaries ⌊jL/m⌋, shared by all strings of the same length);
    *    the edit lies in exactly one slice, so a true pair agrees on the
    *    leave-one-out concatenation of the other m−1 — each record emits m
    *    keys (slot, everything-but-slice-j) and candidates equi-join on
    *    (groupCols, length, slot, key).
    *  - length-±1 pairs: a single insert shifts positions, so slices
    *    don't align; instead the pair agrees on the shorter length L's
    *    prefix p = ⌊L/2⌋ OR suffix s = L−p (edit at i ≥ p leaves the
    *    prefix; i < p leaves the last s chars of both — the longer side's
    *    suffix shifts by one but its CONTENT matches). Each record emits
    *    prefix/suffix keys in both the shorter and longer role, keyed by
    *    the shorter length, so cross-length candidates also equi-join.
    *
    * Both passes OVER-generate, never under-generate (no false negatives);
    * a candidate can arise from several slots, so pairs are deduped before
    * the banded `levenshtein(_, _, 1)` residual confirms. Result: exactly
    * the plain all-pairs formulation — the gate runs the naive SQL.
    *
    * Scale shape: blocks are (groupCols, length, slot, substring) — their
    * count scales with distinct substring content, so candidate pairs grow
    * ~linearly for diverse keys instead of O(n²/|groups|). Worst case
    * (variation concentrated in ONE slice — e.g. serial-numbered names)
    * degenerates only that slice's leave-one-out block to the coarse key
    * while the other slots stay selective. Measured at sf0.1 (15,000
    * customers): 60,794 candidate pairs reach the levenshtein residual vs
    * 901,746 under plain (nation, segment) blocking — a 15× cut — with
    * the confirmed 2,040 pairs and the q87 oracle rows identical. Raise
    * `segments` to sharpen blocks for long keys; m slices stay exact for
    * one edit because m−1 survive. */
  def editOnePairs(df: DataFrame, idCol: String, nameCol: String,
      groupCols: Seq[String], segments: Int = 6): DataFrame =
    editOneCandidates(df, idCol, nameCol, groupCols, segments)
      // threshold form: banded O(len·k) with early exit (returns -1 past
      // the bound) instead of the full O(len²) matrix
      .filter(levenshtein(col(nameCol + "_a"), col(nameCol + "_b"), 1) >= 0)

  /** The deduped candidate stage of [[editOnePairs]], before the
    * levenshtein residual — exposed so selectivity is measurable (the
    * block-quality number that decides whether blocking still works as
    * the corpus grows). */
  def editOneCandidates(df: DataFrame, idCol: String, nameCol: String,
      groupCols: Seq[String], segments: Int = 6): DataFrame = {
    require(segments >= 2, s"need at least 2 segments, got $segments")
    val m = segments
    val name = col(nameCol)
    val base = df.withColumn("__len", length(name))
    val gs = groupCols.map(col)

    // equal-length pass: m leave-one-out keys per record
    val segKeys = (1 to m).map { j =>
      val bPrev = floor(col("__len") * (j - 1) / m).cast("int")
      val bJ = floor(col("__len") * j / m).cast("int")
      struct(lit(j).as("slot"),
        concat(name.substr(lit(1), bPrev),
          name.substr(bJ + 1, col("__len") - bJ)).as("blk"))
    }
    val eqKeyed = base.select(gs ++ Seq(col(idCol), name, col("__len"),
      explode(array(segKeys: _*)).as("__k")): _*)
      .select(gs ++ Seq(col(idCol), name, col("__len"),
        col("__k.slot").as("__slot"), col("__k.blk").as("__blk")): _*)
    def side(d: DataFrame, suf: String): DataFrame =
      d.columns.foldLeft(d)((acc, c) => acc.withColumnRenamed(c, c + suf))
    val joinEq = (groupCols ++ Seq("__len", "__slot", "__blk"))
      .map(c => col(c + "_a") === col(c + "_b")).reduce(_ && _)
    val candEq = side(eqKeyed, "_a").join(side(eqKeyed, "_b"),
        joinEq && col(idCol + "_a") < col(idCol + "_b"))

    // cross-length pass: prefix/suffix pigeonhole keyed by the SHORTER
    // length; the shorter/equal role pairs with the longer role of a
    // string one char longer (same key length ⇒ lengths differ by one)
    def roleKeys(lenAs: Column) = {
      val p = floor(lenAs / 2).cast("int")
      val s = (lenAs - p).cast("int")
      array(
        struct(lit("P").as("slot"), lenAs.cast("int").as("klen"),
          name.substr(lit(1), p).as("blk")),
        struct(lit("S").as("slot"), lenAs.cast("int").as("klen"),
          name.substr(lit(0) - s, s).as("blk")))
    }
    def crossSide(keys: Column, suf: String): DataFrame =
      side(base.select(gs ++ Seq(col(idCol), name,
        explode(keys).as("__k")): _*)
        .select(gs ++ Seq(col(idCol), name, col("__k.slot").as("__slot"),
          col("__k.klen").as("__klen"), col("__k.blk").as("__blk")): _*), suf)
    val joinCross = (groupCols ++ Seq("__slot", "__klen", "__blk"))
      .map(c => col(c + "_a") === col(c + "_b")).reduce(_ && _)
    val candCross = crossSide(roleKeys(col("__len")), "_a") // shorter role
      .join(crossSide(roleKeys(col("__len") - 1), "_b"), joinCross) // longer role
      // canonical id order (cross pairs arrive as (shorter, longer))
      .select((groupCols.map(c => col(c + "_a")) ++ Seq(
        least(col(idCol + "_a"), col(idCol + "_b")).as(idCol + "_a"),
        greatest(col(idCol + "_a"), col(idCol + "_b")).as(idCol + "_b"),
        when(col(idCol + "_a") < col(idCol + "_b"), col(nameCol + "_a"))
          .otherwise(col(nameCol + "_b")).as(nameCol + "_a"),
        when(col(idCol + "_a") < col(idCol + "_b"), col(nameCol + "_b"))
          .otherwise(col(nameCol + "_a")).as(nameCol + "_b"))): _*)
      .filter(col(idCol + "_a") =!= col(idCol + "_b"))

    val outCols = groupCols.map(c => col(c + "_a")) ++
      Seq(col(idCol + "_a"), col(idCol + "_b"), col(nameCol + "_a"), col(nameCol + "_b"))
    candEq.select(outCols: _*).unionByName(candCross.select(outCols: _*))
      .dropDuplicates(Seq(idCol + "_a", idCol + "_b"))
  }

  /** Z-order (Morton) interleave of two non-negative integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Sorting or
    * range-partitioning a table by this key clusters BOTH dimensions at
    * once, so parquet min/max stats narrow on both columns and a filter
    * on either one skips most files — the layout trick behind Delta's
    * OPTIMIZE ZORDER, here as a plain deterministic expression (pure
    * column arithmetic, codegen'd, no shuffle of its own). Callers
    * pre-scale values into [0, 2^bits); out-of-range or negative inputs
    * yield NULL rather than a silently-scrambled interleave (shiftright
    * sign-extends and high bits drop — a garbage key would quietly wreck
    * file clustering). CoreSpec gates the interleave bit-for-bit, the
    * NULL guard, AND the locality claim (per-file min/max widths of both
    * columns under a z-ordered layout beat a single-column sort). */
  /** Time-series GAP FILL: densify a (key, date)-grain frame onto a
    * complete daily spine [start, end] per key, then fill the generated
    * gaps — `ffillCols` carry the last observed value forward (LOCF,
    * NULL before the first observation), `zeroFillCols` take 0 (the
    * count/additive-measure convention). Input contract: ONE row per
    * (key, date) — pre-aggregate first (the spec pins the join grain).
    *
    * Scale shape: both join sides are (key, day)-grain — the spine is
    * keys × days (distinct keys one combinable pass; the day sequence
    * explodes from a literal, no shuffle of its own) and the data side
    * is pre-aggregated by contract, so the two exchanges here (the
    * equi-join on key+day, the fill window on key) move reporting-grain
    * rows, never corpus rows. No global sort anywhere. */
  def gapFill(df: DataFrame, keyCols: Seq[String], dateCol: String,
      start: String, end: String, ffillCols: Seq[String] = Nil,
      zeroFillCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require((ffillCols ++ zeroFillCols).nonEmpty, "nothing to fill")
    val days = explode(sequence(
      to_date(lit(start)), to_date(lit(end)), expr("INTERVAL 1 DAY"))).as(dateCol)
    val spine = df.select(keyCols.map(col): _*).distinct().select(col("*"), days)
    val joined = spine.join(
      df.withColumn(dateCol, col(dateCol).cast("date")),
      keyCols :+ dateCol, "left")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = ffillCols.foldLeft(joined)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    zeroFillCols.foldLeft(filled)((d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0).cast(df.schema(c).dataType))))
  }

  /** Scalable RANGE JOIN: each point row paired with every range row
    * whose [lo, hi] contains its value. Spark plans a bare
    * `p.value BETWEEN r.lo AND r.hi` as BroadcastNestedLoopJoin — O(n·m)
    * comparisons and a broadcast-sized range side, the non-equi-join trap
    * at any real scale. Bucketization makes it an EQUI join: ranges
    * explode into the `bucketWidth`-wide buckets they overlap, points map
    * to their one bucket, the join key is the bucket id, and the exact
    * BETWEEN runs as a residual filter on the equi-matched pairs.
    *
    * Cost model (document against your data): range side inflates by
    * avg(spanBuckets) = avg(hi − lo)/bucketWidth + 1 — pick bucketWidth
    * near the TYPICAL span so inflation is ~2× and each bucket pairs few
    * candidates. `maxSpanBuckets` fails loudly on a range that would
    * explode into more buckets than that (one degenerate [−∞,∞] row
    * would otherwise fan out the whole corpus).
    *
    * Both inputs keep all their columns (range columns win name clashes
    * prefixed with `rangePrefix`). The residual BETWEEN is inclusive on
    * both bounds; NULL values/bounds never match (SQL semantics). */
  def rangeJoin(points: DataFrame, ranges: DataFrame, valueCol: String,
      loCol: String, hiCol: String, bucketWidth: Double,
      maxSpanBuckets: Int = 4096, rangePrefix: String = "r_"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = ranges.columns.toSet.intersect(points.columns.toSet)
    val r0 = clash.foldLeft(ranges)((df, c) => df.withColumnRenamed(c, rangePrefix + c))
    val rLo = if (clash(loCol)) rangePrefix + loCol else loCol
    val rHi = if (clash(hiCol)) rangePrefix + hiCol else hiCol
    def bucketOf(c: Column) = floor(c.cast("double") / bucketWidth).cast("long")
    // the guard lives INSIDE the sequence bound so column pruning can
    // never elide it: a degenerate range fails the job, loudly
    val guardedHi = when(
      bucketOf(col(rHi)) - bucketOf(col(rLo)) >= maxSpanBuckets.toLong,
      raise_error(concat(lit(s"rangeJoin: a range spans >= $maxSpanBuckets buckets of " +
        s"width $bucketWidth — widen bucketWidth or pre-split: lo="), col(rLo).cast("string"),
        lit(" hi="), col(rHi).cast("string"))).cast("long"))
      .otherwise(bucketOf(col(rHi)))
    val exploded = r0
      .filter(col(rLo).isNotNull && col(rHi).isNotNull && col(rLo) <= col(rHi))
      .withColumn("__bucket", explode(sequence(bucketOf(col(rLo)), guardedHi)))
    points.withColumn("__bucket", bucketOf(col(valueCol)))
      .join(exploded, Seq("__bucket"))
      .filter(col(valueCol) >= col(rLo) && col(valueCol) <= col(rHi))
      .drop("__bucket")
  }

  def zorderKey(a: Column, b: Column, bits: Int = 16): Column =
    zorderKeyN(Seq(a, b), bits)

  /** N-dimensional Morton interleave: bit i of dimension d lands at key
    * bit i·n + d, so a range filter on ANY of the n columns narrows
    * per-file [min,max] key ranges on a z-sorted layout. Same contract
    * as the 2-D form: inputs must be non-negative ints below 2^bits
    * (quantize first — `floor(x / width)` or a rank bucket); out-of-range
    * or NULL inputs yield NULL, never a silently scrambled key. n·bits
    * must fit a signed long (≤ 63). Pure codegen'd column arithmetic —
    * the layout write's range partitioner is the only shuffle anywhere
    * near it. */
  def zorderKeyN(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.size >= 2, s"need at least 2 dimensions, got ${dims.size}")
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    require(dims.size * bits <= 63,
      s"${dims.size} dims × $bits bits = ${dims.size * bits} key bits — must be ≤ 63")
    val longs = dims.map(_.cast("long"))
    val bound = lit(1L << bits)
    val n = dims.size
    val key = (for { i <- 0 until bits; (d, j) <- longs.zipWithIndex } yield
      shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * n + j)
    ).reduce(_ bitwiseOR _)
    when(longs.map(d => d >= 0 && d < bound).reduce(_ && _), key)
  }

  /** Per-group EXACT discrete percentiles without collecting group values:
    * the [[graft.operators.Corpus.tokenStats]] histogram-CDF construction,
    * partitioned by group. p-th percentile = the smallest value whose
    * cumulative count reaches ceil(p·n) (percentile_disc semantics —
    * engine-exact, no interpolation, so any SQL oracle reproduces it
    * bit-for-bit; NULL values are excluded up front for the same
    * sort-order reason as tokenStats).
    *
    * Scale shape: the corpus collapses to (group, distinct value) grain in
    * one map-side-combinable aggregation; the cumulative window then runs
    * per group over histogram CELLS, not rows — the memory hazard of
    * `percentile`-style per-group value buffering never arises. Heavy
    * groups are bounded by their distinct-value count (quantize the value
    * first if it is continuous and adversarially unique). */
  def groupQuantiles(df: DataFrame, groupCols: Seq[String], value: Column,
      ps: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    require(groupCols.nonEmpty, "groupQuantiles needs at least one group column")
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"percentiles must be in (0,1], got $ps")
    val names = ps.map(p => s"p${(p * 100).round}")
    require(names.distinct == names, s"percentiles render to duplicate column names: $names")
    val gcols = groupCols.map(col)
    val hist = df.select(gcols :+ value.as("__v"): _*)
      .filter(col("__v").isNotNull)
      .groupBy(gcols :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(gcols: _*)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wg))
    val pcols = ps.zip(names).map { case (p, name) =>
      min(when(col("__cum") >= ceil(lit(p) * col("__n")), col("__v"))).as(name)
    }
    cum.groupBy(gcols: _*).agg(sum(col("__c")).as("n_rows"), pcols: _*)
  }

  /** Per-group winsorization — the robust-scaling clip of feature
    * preprocessing: values clamp to the group's exact [lo, hi]
    * percentile_disc band computed by [[groupQuantiles]]'s histogram CDF,
    * so the clip bounds are engine-exact values drawn from the data (no
    * interpolation, no float drift). NULL values stay NULL (Spark's
    * least/greatest skip NULLs, which would otherwise clamp a NULL to the
    * lower bound); rows whose group has no non-NULL values pass through
    * unclipped.
    *
    * Scale shape: thresholds collapse to group grain and broadcast back —
    * the stream passes once, the sketch never shuffles with it (same
    * shape as outlier flags / q86). */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo > 0 && hi <= 1 && lo < hi, s"need 0 < lo < hi <= 1, got ($lo, $hi)")
    val (nLo, nHi) = (s"p${(lo * 100).round}", s"p${(hi * 100).round}")
    val thr = groupQuantiles(df, groupCols, col(valueCol), Seq(lo, hi))
      .select(groupCols.map(col) ++ Seq(col(nLo).as("__lo"), col(nHi).as("__hi")): _*)
    df.join(broadcast(thr), groupCols, "left")
      .withColumn(valueCol + "_w",
        when(col(valueCol).isNull || col("__lo").isNull, col(valueCol))
          .otherwise(least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .withColumnRenamed("__lo", "lo").withColumnRenamed("__hi", "hi")
  }

  /** Time-range rolling aggregation (W5 shape — RANGE frame over event
    * time): for every row, the sum/count of `value` over the trailing
    * `windowSeconds` window within the same key, endpoints inclusive.
    * Same-instant rows share a frame (RANGE, not ROWS), so the result is
    * deterministic without a tiebreak. The sum runs in decimal(18,4) and
    * casts to double once — the cross-engine exactness convention.
    *
    * Scale shape: one hash shuffle on the key; frame state per window
    * partition is bounded by the densest `windowSeconds` span of one key,
    * never the key's whole history. Skewed keys split under AQE like any
    * windowed shuffle. */
  def rollingWindow(df: DataFrame, keyCol: String, tsCol: String, value: Column,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    val w = Window.partitionBy(col(keyCol)).orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    df.withColumn("rolling_sum",
        sum(value.cast("decimal(18,4)")).over(w).cast("double"))
      .withColumn("rolling_n", count(lit(1)).over(w))
  }

  /** Ordered funnel analysis: for each key, the earliest time each step of
    * `steps` completes, where step i+1 must occur AT OR AFTER (>=) the
    * chosen (earliest) completion of step i. Returns one row per key that
    * completed step 1, with `step1_ts … stepN_ts` (NULL once the funnel
    * breaks) and `depth` = number of completed steps.
    *
    * Scale shape: one aggregation + one equi-join (range as residual) per
    * step — each a single key shuffle; the left side shrinks to one row
    * per key after the first step, so later joins are key-sized, and the
    * per-step min folds map-side. No per-key event arrays are ever
    * collected (the all-events-per-user grouping alternative is the
    * memory hazard this shape avoids). */
  def funnel(df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel requires at least one step")
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("step1_ts"))
    val full = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (st, i)) =>
      val prevC = s"step${i}_ts"
      val curC = s"step${i + 1}_ts"
      val nxt = df.filter(col(typeCol) === st)
        .select(col(keyCol).as("__k"), col(tsCol).as("__t"))
      val keep = acc.columns.map(acc(_))
      acc.join(nxt, acc(keyCol) === nxt("__k") && nxt("__t") >= acc(prevC), "left")
        .groupBy(keep: _*).agg(min(col("__t")).as(curC))
    }
    full.withColumn("depth",
      steps.indices.map(i => when(col(s"step${i + 1}_ts").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** Skew-salted equi-join: spreads a hot key across `salt` shuffle
    * partitions by appending a deterministic salt to the big side's key and
    * replicating the small side once per salt value. Result is identical to
    * `big.join(small, keys, how)`; the shuffle for a key that is 50% of the
    * big side becomes `salt` roughly-equal partitions instead of one
    * straggler task. AQE's skew-join handles many cases at runtime — this is
    * the explicit tool for joins AQE can't split (e.g. under windowed or
    * bucketed requirements) or for deterministic plan shape.
    *
    * The salt is `pmod(hash(all big-side columns), salt)` — deterministic
    * (re-runs partition identically, no `rand()`), and rows of the same hot
    * key scatter as long as their non-key columns differ. `how` supports
    * "inner" and "left" (the salted small side stays keyed 1:1 per salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int, how: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(Set("inner", "left").contains(how), s"saltedJoin supports inner/left, got $how")
    val overlap = (big.columns.toSet & small.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"saltedJoin requires disjoint non-key column names; rename ${overlap.mkString(", ")}")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the column name __salt")
    val bigS = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, keys :+ "__salt", how).drop("__salt")
      .select(big.columns.map(col) ++
        small.columns.filterNot(keys.contains).map(col): _*)
  }

  /** Per-group simple linear regression and correlation in ONE pass:
    * closed-form OLS of y on x from the five moment sums
    * (Σx, Σy, Σxy, Σx², Σy²), plus Pearson r and R². Returns
    * (groupCols..., n, slope, intercept, r, r2), each statistic rounded
    * to 6 dp; groups whose x (or y) is constant have an undefined
    * slope/r and yield NULLs, and rows with a NULL x or y are excluded
    * pairwise (the SQL `regr_*` convention).
    *
    * Engine-exact: each per-row term is computed in double (IEEE —
    * bit-identical in any engine) then quantized to decimal(24,12)
    * BEFORE the sum, so the aggregate is order-free exact (the
    * [[Corpus.crossEntropyScore]] convention); the closed-form formulas
    * then run on the exact sums in double. For ≤2-dp business values the
    * quantization itself is lossless (products have ≤4 dp).
    *
    * Scale shape: a single map-side-combinable groupBy — five decimal
    * sum channels and a count through one exchange at group grain; no
    * window, no second pass, no driver math. */
  def groupOls(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupOls needs at least one group column")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    def q(c: Column) = c.cast("decimal(24,12)")
    val paired = df.filter(x.isNotNull && y.isNotNull)
    val sums = paired.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(q(x)).as("__sx"), sum(q(y)).as("__sy"),
      sum(q(x * y)).as("__sxy"),
      sum(q(x * x)).as("__sxx"), sum(q(y * y)).as("__syy"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double"); val syy = col("__syy").cast("double")
    val covN = sxy * n - sx * sy       // n²·cov
    val varxN = sxx * n - sx * sx      // n²·var(x)
    val varyN = syy * n - sy * sy      // n²·var(y)
    val slope = when(varxN > 0, covN / varxN)
    val r = when(varxN > 0 && varyN > 0, covN / sqrt(varxN * varyN))
    sums.select(groupCols.map(col) ++ Seq(
      col("n"),
      round(slope, 6).as("slope"),
      round(when(varxN > 0, (sy - slope * sx) / n), 6).as("intercept"),
      round(r, 6).as("r"),
      round(r * r, 6).as("r2")): _*)
  }
}
