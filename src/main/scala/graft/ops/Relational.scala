package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational combinators (SURVEY.md §2.2/2.3/2.5/2.6/2.7) — the
  * `DataFrame => DataFrame` building blocks the reference pipelines
  * compose. All shapes are scale-aware: keyed dedup is a single window
  * shuffle, membership tests are semi/anti joins (broadcastable) rather
  * than collected value lists, fallback matching stages anti-join between
  * branches so one shuffle plan covers both stages.
  */
object Relational {

  /** Keyed keep-first dedup with explicit priority order (reference
    * `mm2.py:37-38`: sort by Active desc + unique(keep='first')).
    * Deterministic: callers must pass a total order (add a tiebreaker
    * column if the priority key has duplicates — SURVEY.md §7 trap (b)).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    require(!df.columns.contains("__rn"),
      "keepFirst uses a temp __rn column; input already has one")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest-wins upsert (CDC apply / corpus-refresh merge): overlay
    * `updates` on `base`, keeping for each key the row with the
    * highest `versionCol`. Equal-version ties break toward `updates`
    * deterministically: rows are tagged with a provenance column
    * (base=0, updates=1) that sorts descending right after the
    * version. Both frames must share a schema; the merge is one union
    * + one keyed window, so at scale it costs a single hash shuffle on
    * the key — the same shape a MERGE INTO without a transactional
    * table format compiles to.
    *
    * Determinism contract: each frame must be unique per
    * (keys, versionCol) — two SAME-frame rows with equal key AND
    * version are indistinguishable to the window (the keys are its
    * partition columns, so key columns cannot tie-break), and the
    * winner would flip with partitioning. Pre-dedupe (keepFirst with
    * a real tiebreaker) if the source can produce such rows.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    require(!base.columns.contains("__src") && !updates.columns.contains("__src"),
      "upsert uses a temp __src provenance column; input already has one")
    keepFirst(
      base.withColumn("__src", lit(0))
        .unionByName(updates.withColumn("__src", lit(1))),
      keys,
      Seq(col(versionCol).desc, col("__src").desc))
      .drop("__src")
  }

  /** Top-k by order — Spark plans TakeOrderedAndProject (no full sort /
    * single-partition shuffle of everything; reference `mu_extras.py:99`).
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** value_counts(sort=True) (reference `unreg_presc.py:165`). Ties
    * broken by value for determinism.
    */
  def valueCounts(df: DataFrame, c: String): DataFrame =
    df.groupBy(c).agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), col(c))

  /** Rows where the per-group count equals the global max count
    * (reference `error_pharmacies.py:35-43` pharmacy-with-most-errors).
    * The global max is a scalar aggregate (partial-agg tree, stays
    * distributed) broadcast back over the grouped result — NOT an
    * empty-frame window, which would funnel every grouped row through
    * one partition to compute the same scalar.
    */
  def argmaxCount(df: DataFrame, keys: Seq[String]): DataFrame = {
    Seq("count", "__max").foreach(c => require(!keys.contains(c),
      s"argmaxCount appends a '$c' column; '$c' as a grouping key " +
        "would produce an ambiguous duplicate-name frame"))
    val counted = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("count"))
    val mx = counted.agg(max(col("count")).as("__max"))
    counted.join(broadcast(mx), col("count") === col("__max")).drop("__max")
  }

  /** Membership filter against another frame's key column (reference
    * `is_in(list)` pattern, P7) — as a semi join so it stays distributed
    * and broadcastable instead of collecting to the driver.
    */
  def semiByKey(df: DataFrame, keyCol: String, lookup: DataFrame, lookupCol: String): DataFrame =
    df.join(broadcast(lookup.select(col(lookupCol).as(keyCol)).distinct()),
      Seq(keyCol), "left_semi")

  /** Negated membership (`is_in(...).not_()`) as an anti join.
    * Null-key note: the anti join KEEPS rows whose key is null (no
    * match exists for them), where Polars' `is_in().not_()` evaluates
    * to null and the filter DROPS them. The fixtures carry no null
    * keys; a caller porting a null-bearing reference pipeline should
    * add `.filter(col(keyCol).isNotNull)` for Polars parity — the
    * divergence is documented rather than papered over because the
    * SQL convention (null is "unknown", not "absent") is the one the
    * rest of this engine follows.
    */
  def antiByKey(df: DataFrame, keyCol: String, lookup: DataFrame, lookupCol: String): DataFrame =
    df.join(broadcast(lookup.select(col(lookupCol).as(keyCol)).distinct()),
      Seq(keyCol), "left_anti")

  /** Two-stage fallback matching (reference `mm1.py:58-88`,
    * `unreg_presc.py:278-301`, J7): try the exact key first; rows that
    * miss fall back to a secondary key; union the two matched branches.
    * The fallback branch is `left_anti` against stage-1 hits, so no row
    * can match twice.
    */
  def fallbackMatch(
      left: DataFrame,
      right: DataFrame,
      primaryKey: (String, String),
      fallbackKey: (String, String)): DataFrame = {
    val stage1 = left.join(right,
      left(primaryKey._1) === right(primaryKey._2), "inner")
    val missed = left.join(right,
      left(primaryKey._1) === right(primaryKey._2), "left_anti")
    val stage2 = missed.join(right,
      missed(fallbackKey._1) === right(fallbackKey._2), "inner")
    stage1.unionByName(stage2)
  }

  /** Horizontal concat of single-row frames (reference `scorecard.py:70`,
    * J8/U2) — cross join of 1-row frames is exact and cheap.
    */
  def horizontalConcat(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.crossJoin(_))

  /** Skew-resistant equi-join: salt the (skewed) fact side with a
    * deterministic hash-derived salt in [0, salts), replicate the dim
    * side once per salt value, and join on (key, salt). Use when one
    * key carries a disproportionate share of fact rows and AQE's skew
    * splitting isn't enough; `salts` multiplies dim size, so keep the
    * dim small. For inner/left joins the result is row-identical to
    * the plain join; right/full would emit each unmatched dim row once
    * per salt replica, so those types are rejected.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts=$salts must be >= 1 (pmod by 0 is an " +
      "ANSI divide-by-zero deep inside the executor)")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left only (got $joinType): unmatched dim " +
        "rows would be duplicated once per salt replica")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(salts)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Left enrich-join that FAILS FAST on accidental fan-out: if any
    * join key has more than `maxMatchesPerKey` rows on the dim side,
    * the job aborts naming the hot key instead of silently multiplying
    * the fact table (the classic 100 TB blowup — a "unique" dimension
    * that quietly stopped being unique doubles the output and every
    * downstream aggregate). The reference's enrich joins
    * (`delinquent_data_submitters.py:88`, `mm2.py:69-70`) all assume
    * one-row-per-key dims; this encodes that assumption in the plan.
    *
    * The guard is IN-PLAN (count-over window + raise_error on the dim
    * side), so the operator stays lazy, travels with the plan, and
    * costs one window over the dim only — the fact side is untouched
    * and the dim-side window shares the shuffle the join needs anyway
    * (or stays cheap under a broadcast, dims being small by contract).
    */
  def guardedLeftJoin(fact: DataFrame, dim: DataFrame, key: String,
      maxMatchesPerKey: Long = 1L): DataFrame = {
    require(maxMatchesPerKey >= 1,
      s"maxMatchesPerKey=$maxMatchesPerKey must be >= 1")
    val checked = dim
      .withColumn("__mk", count(lit(1)).over(Window.partitionBy(col(key))))
      .filter(when(col("__mk") > maxMatchesPerKey,
        raise_error(concat(
          lit("guardedLeftJoin: key '"), col(key).cast("string"),
          lit("' has "), col("__mk").cast("string"),
          lit(s" dim rows > maxMatchesPerKey=$maxMatchesPerKey — " +
            "deduplicate the dimension (keepFirst) or raise the bound")))
          .cast("boolean"))
        .otherwise(lit(true)))
      .drop("__mk")
    fact.join(checked, Seq(key), "left")
  }

  /** Fail-fast data-quality gate (reference `unreg_presc.py:163-170`:
    * unmatched degrees → diagnostic dump + abort): if `df` has ANY
    * rows, throw with a preview of the first `sample` offenders.
    * `take` pushes a limit into the scan — the happy path never reads
    * more than one partition's worth of nothing.
    */
  def requireEmpty(df: DataFrame, msg: String, sample: Int = 20): Unit = {
    require(sample >= 1,
      s"sample=$sample would take(0) and silently DISABLE the gate")
    val rows = df.take(sample)
    if (rows.nonEmpty) {
      val preview = rows.map(_.toString).mkString("\n  ")
      throw new IllegalStateException(
        s"$msg — first ${rows.length} offending row(s):\n  $preview")
    }
  }

  /** Exact-n deterministic pseudo-sample: stable hash order, first n
    * (the reference's `df.sample(20)` at `check_masked.py:73` is a
    * human-eyeball sample; determinism matters more than entropy here).
    * The order key is `md5(concat_ws('|', seedCols))` — an
    * engine-PORTABLE hash (any SQL engine computes the identical
    * digest from the identical seed values), unlike xxhash64 whose
    * seed/variant is Spark-private; seedCols break the (practically
    * impossible) digest tie so the order is total. Spark plans this as
    * TakeOrderedAndProject: no full sort, no single-partition shuffle.
    */
  def sampleN(df: DataFrame, n: Int, seedCols: Seq[String]): DataFrame = {
    require(seedCols.nonEmpty,
      "sampleN needs seed columns: with none the hash is a constant and " +
        "limit(n) returns arbitrary rows")
    df.orderBy(
      md5(concat_ws("|", seedCols.map(col(_).cast("string")): _*)) +:
        seedCols.map(col(_).asc): _*)
      .limit(n)
  }

  /** Forward fill (Polars `fill_null(strategy="forward")` over a keyed
    * order): each null in `valueCol` takes the most recent non-null
    * value within its `partCols` group under `orderCols` — the
    * observation-carried-forward gap fill of sensor/price/state
    * streams. One window shuffle on the partition key; `orderCols`
    * must be a total order within groups or the fill is
    * nondeterministic (add a unique tiebreaker).
    */
  def forwardFill(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[Column], valueCol: String): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Bloom-filter-accelerated semi join: membership of `fact(factKey)`
    * in `dim(dimKey)`, exact. The dim keys are folded into a Bloom
    * filter (one aggregate over the SMALL side — a model parameter,
    * like the ANN pivots), inlined into the plan, and applied at the
    * fact scan inside whole-stage codegen; the exact semi join then
    * runs only on the survivors, so its cost is O(matches + n·fpp)
    * instead of O(fact).
    *
    * Why this matters at 100 TB: a plain semi join shuffles (or at
    * best re-scans) every fact row to find the typically-few that
    * match a selective dim; the bloom test drops non-matches at the
    * scan for `expectedItems·~10 bits` of broadcast — independent of
    * fact size. False positives only cost residual join work, never
    * correctness. `expectedItems` should bound the dim-side distinct
    * count (oversizing wastes broadcast bytes; undersizing inflates
    * the effective fpp). This is what Spark's AQE runtime filter does
    * for equi-joins it can see through — wiring it explicitly keeps
    * the guarantee under plans the optimizer can't prove (unioned
    * facts, pre-aggregated keys, non-equi residuals).
    *
    * Key-type contract: BOTH keys must be integral (byte/short/int/
    * long — hashed via the filter's long path) or BOTH strings (hashed
    * via the filter's UTF-8 binary path). The two hash families are
    * incompatible, so a mixed or unsupported pairing is rejected
    * eagerly rather than silently dropping matches as false negatives.
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    def integral(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val factType = fact.schema(factKey).dataType
    val dimType = dim.schema(dimKey).dataType
    val probe =
      if (integral(factType) && integral(dimType)) col(factKey).cast("long")
      else if (factType == StringType && dimType == StringType) col(factKey)
      else throw new IllegalArgumentException(
        s"bloomSemiJoin keys must be both integral or both string; got " +
          s"$factKey: ${factType.simpleString}, $dimKey: ${dimType.simpleString} " +
          "(the filter's long and UTF-8 hash paths are incompatible — a " +
          "mixed pairing would return false negatives, not an error)")
    val bf = dim.stat.bloomFilter(dimKey, math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val test = graft.functions.BloomMightContain(
      GraftShim.expression(probe), bos.toByteArray)
    fact.filter(GraftShim.column(test))
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }

  /** Blocked edit-distance self-match: candidate pairs (a, b) within
    * the same `blockCol` value whose `strCol` values are within
    * `maxDist` Levenshtein edits — the exact-distance complement to the
    * Jaro-Winkler fuzzy join (reference `od.py`-style name matching,
    * here with a metric threshold instead of a similarity score).
    *
    * The block key bounds the quadratic: the self-join is an EQUI join
    * on `blockCol` (one shuffle, co-located pairing) and only
    * in-block pairs ever exist, so cost is sum(block²), not n². At
    * 100 TB pick blocks so the largest is ~10⁴ rows (add a prefix or
    * length bucket to the key); for maxDist=1 prefer
    * [[deletionNeighborhoodPairs]], which replaces the O(block²)
    * pairing with an O(n·len) equi-join and needs no block-size tuning
    * at all. The distance is the BOUNDED 3-arg levenshtein (banded DP,
    * early exit at maxDist+1) so a far-apart pair costs O(len·maxDist),
    * not O(len²); a length prefilter (|len(a)-len(b)| <= maxDist)
    * discards cheap rejections before even that runs.
    */
  def editDistancePairs(df: DataFrame, keyCol: String, blockCol: String,
      strCol: String, maxDist: Int,
      maxBlockRows: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist=$maxDist must be >= 0")
    // Optional blowup guard: the docstring's "keep blocks ~10⁴" contract
    // is otherwise unenforced, and a single hot block turns the pairing
    // quadratic silently. The check is IN-PLAN (count-over window +
    // raise_error), so the operator stays lazy and the guard travels
    // with the plan to wherever it executes; the window shares the
    // blockCol shuffle the join needs anyway.
    val guarded = maxBlockRows match {
      case Some(m) =>
        require(m >= 1, s"maxBlockRows=$m must be >= 1")
        val bc = count(lit(1)).over(Window.partitionBy(col(blockCol)))
        df.withColumn("__bc", bc)
          .filter(when(col("__bc") > m,
            raise_error(concat(
              lit("editDistancePairs: block '"), col(blockCol).cast("string"),
              lit("' has "), col("__bc").cast("string"),
              lit(s" rows > maxBlockRows=$m — pairing is quadratic per " +
                "block; subsplit the key (editDistancePairsBucketed adds " +
                "a length bucket) or use deletionNeighborhoodPairs for " +
                "maxDist=1"))).cast("boolean"))
            .otherwise(lit(true)))
          .drop("__bc")
      case None => df
    }
    val a = guarded.select(col(blockCol).as("__blk"), col(keyCol).as("key_a"),
      col(strCol).as("str_a"))
    val b = guarded.select(col(blockCol).as("__blk"), col(keyCol).as("key_b"),
      col(strCol).as("str_b"))
    a.join(b, Seq("__blk"))
      .filter(col("key_a") < col("key_b"))
      .filter(abs(length(col("str_a")) - length(col("str_b"))) <= maxDist)
      // bounded levenshtein returns -1 when dist > maxDist (and the
      // true distance otherwise), so the filter is a sign test
      .withColumn("dist", levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0)
      .withColumnRenamed("__blk", blockCol)
  }

  /** [[editDistancePairs]] with an automatic length-bucket subsplit —
    * the answer to a block that is too hot to pair quadratically. Each
    * string's home bucket is `floor(len / (maxDist+1))`; a pair within
    * `maxDist` edits differs by at most `maxDist` characters of length,
    * so its buckets are equal or adjacent (bucket width = maxDist+1
    * makes a 2-apart pair differ by >= maxDist+1 in length). The probe
    * side therefore indexes each row twice (home + home-1 "ghost") and
    * the join key becomes (block, bucket): no qualifying pair is lost,
    * and the quadratic is now per (block, LENGTH bucket) — bounded by
    * the length distribution, not the block-key cardinality. Candidates
    * are normalized to key_a < key_b and deduped (a same-bucket pair
    * matches from both sides) before the bounded-levenshtein verify, so
    * only (key, key) pairs ride the distinct, never the strings' DP.
    * Same output shape and answer as [[editDistancePairs]].
    */
  def editDistancePairsBucketed(df: DataFrame, keyCol: String,
      blockCol: String, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist=$maxDist must be >= 0")
    val width = maxDist + 1
    val base = df.select(col(blockCol).as("__blk"), col(keyCol).as("__key"),
      col(strCol).as("__str"))
    val home = floor(length(col("__str")) / width).cast("long")
    val a = base.select(col("__blk"), home.as("__g"),
      col("__key").as("key_a"), col("__str").as("str_a"))
    val bHome = base.select(col("__blk"), home.as("__g"),
      col("__key").as("key_b"), col("__str").as("str_b"))
    val bGhost = base.select(col("__blk"), (home - 1).as("__g"),
      col("__key").as("key_b"), col("__str").as("str_b"))
    val swap = col("key_a") > col("key_b")
    a.join(bHome.unionByName(bGhost), Seq("__blk", "__g"))
      .filter(col("key_a") =!= col("key_b"))
      .filter(abs(length(col("str_a")) - length(col("str_b"))) <= maxDist)
      .select(col("__blk"),
        when(swap, col("key_b")).otherwise(col("key_a")).as("key_a"),
        when(swap, col("str_b")).otherwise(col("str_a")).as("str_a"),
        when(swap, col("key_a")).otherwise(col("key_b")).as("key_b"),
        when(swap, col("str_a")).otherwise(col("str_b")).as("str_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0)
      .withColumnRenamed("__blk", blockCol)
  }

  /** Edit-distance self-match for maxDist = 1 via a deletion
    * neighborhood (SymSpell): two strings are within one edit iff they
    * share a member of each other's single-deletion neighborhood —
    * equal strings share the string itself, a substitution at position
    * i means both sides' delete-at-i variants coincide, and an
    * insertion/deletion means the longer side's variant equals the
    * shorter string. So each row emits its string plus all len
    * single-deletion variants (len+1 keys, deduped) and candidates come
    * from an EQUI join on (block, variant) — O(n·len) index rows
    * instead of O(block²) pairs, which is what makes the operator
    * independent of block-key cardinality: a 25-value block key that
    * would be quadratic death for [[editDistancePairs]] is irrelevant
    * here because the variant itself is the discriminating key.
    * Candidates are verified with the bounded levenshtein (a shared
    * variant does not by itself bound the distance: delete-at-i ∘
    * insert-at-j reaches distance-2 strings).
    *
    * Same output shape as [[editDistancePairs]]: (blockCol, key_a,
    * str_a, key_b, str_b, dist) with key_a < key_b, each unordered
    * pair once.
    */
  def deletionNeighborhoodPairs(df: DataFrame, keyCol: String,
      blockCol: String, strCol: String): DataFrame = {
    val s = col("__str")
    val variants = array_distinct(transform(
      sequence(lit(0), length(s)),
      i => when(i === 0, s)
        .otherwise(concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s) - i)))))
    val idx = df.select(col(blockCol).as("__blk"), col(keyCol).as("__key"),
        col(strCol).as("__str"))
      .select(col("__blk"), col("__key"), col("__str"),
        explode(variants).as("__var"))
    val a = idx.select(col("__blk"), col("__var"),
      col("__key").as("key_a"), col("__str").as("str_a"))
    val b = idx.select(col("__blk"), col("__var"),
      col("__key").as("key_b"), col("__str").as("str_b"))
    a.join(b, Seq("__blk", "__var"))
      .filter(col("key_a") < col("key_b"))
      .select("__blk", "key_a", "str_a", "key_b", "str_b")
      .distinct() // a pair can share several variants — count it once
      .withColumn("dist", levenshtein(col("str_a"), col("str_b"), 1))
      .filter(col("dist") >= 0)
      .withColumnRenamed("__blk", blockCol)
  }

  /** Exact per-group LOWER median (the element at rank `(n+1) div 2`
    * of the sorted group) from a pre-aggregated `(key, value, count)`
    * histogram: the median is the smallest value whose cumulative
    * count reaches the target rank. The window runs over the
    * HISTOGRAM — ≤ |keys|·|domain| rows — not the data.
    *
    * This is the scale-correct shape for integer-valued bounded-domain
    * columns (quantities, ratings, token counts): the naive
    * `row_number() OVER (PARTITION BY key ORDER BY v)` formulation
    * sorts the full table inside ≤ |keys| window partitions — at
    * 100 TB with 3 group keys that is 3 single-threaded sorts of a
    * third of the corpus each. Here the only full-data pass is the
    * histogram groupBy, which partially aggregates map-side.
    */
  def groupedMedianFromCounts(hist: DataFrame, keyCol: String,
      valCol: String, cntCol: String): DataFrame = {
    val wCum = Window.partitionBy(keyCol).orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCol)
    hist
      .withColumn("__cum", sum(col(cntCol)).over(wCum))
      .withColumn("__n", sum(col(cntCol)).over(wAll))
      .withColumn("__t", expr("(__n + 1) DIV 2"))
      // the target rank falls inside this value's count run:
      // cum - cnt < t <= cum — exactly one row per key matches
      .where(col("__cum") - col(cntCol) < col("__t") &&
        col("__t") <= col("__cum"))
      .select(col(keyCol), col(valCol).as("median"))
  }

  /** [[groupedMedianFromCounts]] over raw rows: builds the histogram
    * (the one full-data shuffle, partially aggregated) then picks.
    */
  def groupedMedian(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    groupedMedianFromCounts(
      df.groupBy(keyCol, valCol).agg(count(lit(1)).as("__cnt")),
      keyCol, valCol, "__cnt")
}
