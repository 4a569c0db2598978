package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Spark's
  * `sample()`/`sampleBy()` are seed-dependent AND partition-dependent —
  * rerunning on a repartitioned corpus changes the sample. These
  * samplers key on a hash of a stable id column instead: the decision
  * is a pure function of the row, so the sample is reproducible across
  * runs, partitionings, AND engines (md5 is engine-portable — the
  * DuckDB oracle draws the identical sample).
  */
object Sampling {

  /** Keep ~`fraction` of rows: md5 of the id's first byte is uniform
    * over [0,256), so compare the leading two hex chars against the
    * scaled threshold. Fraction granularity is 1/256 — plenty for
    * corpus downsampling.
    */
  def hashGate(id: Column, fraction: Double): Column = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    val t = math.round(fraction * 256).toInt
    if (t <= 0) lit(false)
    else if (t >= 256) lit(true)
    else substring(md5(id.cast("string")), 1, 2) < lit(f"$t%02x")
  }

  /** Column-valued variant of [[hashGate]]: the keep-fraction is a
    * (data-dependent) DOUBLE column instead of a literal — e.g. a
    * per-source rate computed from group counts. Same 1/256
    * granularity and the same md5 draw, so a row kept at rate r is
    * also kept at every rate ≥ r (nested samples). The threshold
    * arithmetic (`floor(r*256 + 0.5)`, lowercase hex, 2-char pad) is
    * engine-portable — the DuckDB oracle spells the identical
    * expression.
    */
  def rateGate(id: Column, rate: Column): Column = {
    // clamp BELOW at 0: hex() of a negative int renders the 64-bit
    // two's complement and lpad TRUNCATES to 2 chars — "ff" — so an
    // unguarded negative rate (a data-dependent formula gone wrong)
    // would keep ~255/256 of rows instead of none
    val t = greatest(floor(rate * 256 + 0.5).cast("int"), lit(0))
    (t >= 256) ||
      (substring(md5(id.cast("string")), 1, 2) < lpad(lower(hex(t)), 2, "0"))
  }

  /** Per-stratum deterministic sample: each stratum value keeps its own
    * fraction; strata absent from `fractions` keep `default`.
    */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    val gate = fractions.foldRight(hashGate(col(idCol), default)) {
      case ((stratum, frac), acc) =>
        when(col(strataCol) === stratum, hashGate(col(idCol), frac)).otherwise(acc)
    }
    df.filter(gate)
  }

  /** Temperature-flattened source mixing: keep source `s` at rate
    * ∝ n_s^(α-1) so the sampled mixture follows p(s) ∝ n_s^α — the
    * standard corpus "sampling temperature" (α < 1 flattens head
    * sources toward uniform; α = 1 is the natural distribution). Only
    * α = 0.5 is offered: `sqrt` and divide are IEEE exactly-rounded,
    * so the per-source rate — and therefore the 1/256 md5-gate
    * threshold — is bit-identical across engines, where a general
    * `pow(n, α-1)` is correctly-rounded on neither and could flip a
    * bucket boundary. `scale` calibrates overall volume: a source with
    * n ≤ scale² keeps everything; larger sources keep ~scale·sqrt(n)
    * docs. Scale shape: one partial-aggregated count per source
    * (sources ≪ rows), rates broadcast back, gate applied map-side —
    * the only full-data shuffle is whatever the caller does next.
    */
  def sqrtTemperatureMixture(df: DataFrame, idCol: String,
      srcCol: String, scale: Double): DataFrame = {
    require(scale > 0, s"scale $scale must be positive")
    val rates = df.groupBy(srcCol)
      .agg(least(lit(1.0),
        lit(scale) / sqrt(count(lit(1)).cast("double"))).as("__rate"))
    // null-SAFE join: groupBy emits a rate row for the null-source
    // group, but a plain equi-join would never match it — every
    // null-source document would silently vanish from the mixture
    // (neither kept nor gated), miscalibrating the volume
    df.join(broadcast(rates.withColumnRenamed(srcCol, "__rate_src")),
        col(srcCol) <=> col("__rate_src"))
      .filter(rateGate(col(idCol), col("__rate")))
      .drop("__rate", "__rate_src")
  }

  /** Token-budget sampling — the corpus-mixing primitive that fraction
    * gates can't express: admit documents per group in a deterministic
    * order until the group's running WEIGHT (token count) reaches
    * `budget`, so every source contributes at most `budget` tokens to
    * the mix regardless of its document-count or length distribution.
    * A row is kept iff the inclusive running sum up to it is within
    * budget (a single over-long head document is therefore dropped,
    * never truncated — truncation is the tokenizer's job). One window
    * shuffle on the group key; pass an engine-portable order (md5 of
    * the text + id tiebreak) so the admitted set is reproducible
    * anywhere. Appends the running total as `cum`.
    */
  def tokenBudget(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget=$budget must be >= 0")
    require(!df.columns.contains("cum"),
      "tokenBudget appends a 'cum' column; input already has one")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col(weightCol)).over(w).cast("long"))
      .filter(col("cum") <= budget)
  }

  /** Weight-proportional SYSTEMATIC sampling without RNG: within each
    * stratum, walk the cumulative-weight line in a deterministic row
    * order and pick every row that contains a grid point
    * `anchor + m·step` (anchor = step DIV 2 — the deterministic
    * midpoint where classical systematic sampling draws a random
    * offset). Every stratum yields `weight/step ± 1` picks, so the
    * sample is token-proportional by construction; a row heavier than
    * `step` carries several grid points and `n_picks` records that
    * multiplicity. All arithmetic is non-negative integer (the `+step`
    * shift keeps both DIV operands ≥ 0, where truncation == floor in
    * both engines), so the sample is bit-reproducible across runs,
    * partitionings, and engines. Weights must be non-negative.
    *
    * Scale shape: ONE window shuffle keyed by the strata columns
    * (parallel across strata — never a global single-partition
    * cumsum); the pick test is a map-side projection on the windowed
    * frame. Appends `n_picks`, keeps only picked rows.
    */
  def systematicSample(df: DataFrame, strataCols: Seq[String],
      order: Seq[Column], weightCol: String, step: Long): DataFrame = {
    require(step >= 1, s"step=$step must be >= 1")
    require(strataCols.nonEmpty,
      "systematicSample windows per stratum; an ungrouped global cumsum " +
        "would funnel the corpus through one partition")
    Seq("n_picks", "__cum", "__prev").foreach(c =>
      require(!df.columns.contains(c),
        s"systematicSample appends a '$c' column; input already has one"))
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val anchor = step / 2
    df.withColumn("__cum", sum(col(weightCol).cast("long")).over(w))
      .withColumn("__prev", col("__cum") - col(weightCol).cast("long"))
      .withColumn("n_picks", expr(
        s"CAST((__cum - $anchor + $step) DIV $step - " +
          s"(__prev - $anchor + $step) DIV $step AS BIGINT)"))
      .filter(col("n_picks") >= 1)
      .drop("__cum", "__prev")
  }

  /** Deterministic weight-balanced shard assignment — the data-loader
    * prep step after mixing/packing: spread rows over `shards` loader
    * shards so per-shard weight (token) totals come out near-equal,
    * WITHOUT a global sort or a single-partition window. Rows are
    * cell-ed by (decimal magnitude of the weight, id mod `subgroups`)
    * — magnitude via digit count of the integer weight, which is
    * integer-exact in any engine, unlike log2 on doubles — and within
    * each cell snake-ordered over the weight-desc rank (rank k of 2S
    * goes to shard k, then back S-1..0, boustrophedon). Each cell
    * balances to within one row's weight; cell weights are within 10×
    * of each other by construction, so the per-cell balances sum to
    * near-perfect global balance. Cells are independent window
    * partitions (magnitudes × subgroups of them), so partition size is
    * bounded and the whole assignment is one keyed window shuffle.
    * Appends an int `shard` column.
    */
  def balancedShards(df: DataFrame, idCol: String, weightCol: String,
      shards: Int, subgroups: Int = 4): DataFrame = {
    require(shards >= 1, s"shards=$shards must be >= 1")
    require(subgroups >= 1, s"subgroups=$subgroups must be >= 1")
    require(!df.columns.contains("shard"),
      "balancedShards appends a 'shard' column; input already has one")
    // subgroup key: numeric ids keep the engine-portable `id mod
    // subgroups` (the oracled path); anything else subgroups on a hex
    // digit of md5(id) — an unguarded cast of a string id would throw
    // CAST_INVALID_INPUT under ANSI (or, ANSI off, null-collapse every
    // magnitude into ONE window partition, silently un-bounding the
    // partition size this operator exists to bound)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val subgroup = df.schema(idCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        pmod(col(idCol).cast("long"), lit(subgroups))
      case _ => pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8),
        16, 10).cast("long"), lit(subgroups))
    }
    val win = Window
      .partitionBy(length(col(weightCol).cast("long").cast("string")),
        subgroup)
      .orderBy(col(weightCol).desc, col(idCol))
    val k = (row_number().over(win) - 1) % (2 * shards)
    df.withColumn("shard",
      when(k < shards, k).otherwise(lit(2 * shards - 1) - k).cast("int"))
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * STABILITY complement to [[balancedShards]]' balance: each key
    * goes to the shard whose md5(key:shard) draw is lexicographically
    * largest, so when the shard count changes from S to S+1 only the
    * keys whose new draw wins move (~1/(S+1) of them) — every other
    * assignment is untouched. That is the property a resumable corpus
    * layout needs across capacity changes; the snake gives near-exact
    * token balance but renumbers freely on ANY input change. Pure
    * map-side expression (no shuffle, no state); md5 keeps the
    * assignment engine-portable. Appends an int `shard` column.
    */
  def rendezvousShards(df: DataFrame, idCol: String,
      shards: Int): DataFrame = {
    require(shards >= 1, s"shards=$shards must be >= 1")
    require(!df.columns.contains("shard"),
      "rendezvousShards appends a 'shard' column; input already has one")
    // array_max over (hash, shard) structs: struct ordering compares
    // the hash first, the shard index only breaks exact-collision ties
    val draws = transform(sequence(lit(0), lit(shards - 1)), s =>
      struct(md5(concat(col(idCol).cast("string"), lit(":"),
        s.cast("string"))).as("h"), s.cast("int").as("s")))
    df.withColumn("shard", array_max(draws).getField("s"))
  }
}
