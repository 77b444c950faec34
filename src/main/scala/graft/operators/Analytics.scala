package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Pin

/** Corpus/product analytics operators rounding out the engine surface:
  * embedding pooling, event funnels, and dataset profiling.
  */
object Analytics {

  /** Per-label embedding centroids in long form (label, dim_idx, centroid):
    * element-wise mean via posexplode + exact decimal accumulation. Linear
    * in corpus size; the (label, dim) aggregate is one shuffle of
    * rows x dim compact tuples — the standard class-centroid / avg-pool op. */
  def labelCentroids(embs: DataFrame): DataFrame =
    embs.select(col("label"), posexplode(col("embedding")).as(Seq("dim_idx", "v")))
      .groupBy(col("label"), col("dim_idx"))
      .agg(
        (sum(floor(col("v").cast("double") * lit(1e12) + lit(0.5))
            .cast("decimal(30,0)")).cast("double") / lit(1e12) /
          count(lit(1)).cast("double")).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy(col("label"), col("dim_idx"))

  /** Signup→purchase funnel: per user, first signup and the first purchase
    * AFTER it, with the conversion delay. Expressed as two min-aggregates
    * and one broadcastable join — no window over the full event stream. */
  def funnel(events: DataFrame): DataFrame = {
    val signup = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"))
    signup.join(purchases, Seq("user_id"), "left")
      .filter(col("purchase_ts").isNull || col("purchase_ts") >= col("signup_ts"))
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(min(col("purchase_ts")).as("first_purchase_ts"))
      // integer div (not `/`: double division then cast) — matches `//`
      .withColumn("seconds_to_convert",
        expr("(unix_micros(first_purchase_ts) - unix_micros(signup_ts)) div 1000000"))
      .select(col("user_id"), col("signup_ts"), col("first_purchase_ts"),
        col("seconds_to_convert"))
      .orderBy(col("user_id"))
  }

  /** Column profile of lineitem: null count, distinct count, min/max per
    * numeric column — the generated-per-column data-quality pass.
    *
    * One aggregate per COLUMN, cross-joined (all 1-row frames), instead of
    * one aggregate with four countDistincts: multiple distinct aggregates
    * in one agg force an Expand x|cols| (every row replicated per distinct
    * column) through the shuffle, while per-column aggregates each scan one
    * parquet column (columnar pruning: same total I/O as the single
    * four-column scan) and shuffle only per-partition distinct values.
    * Measured at sf0.1: 2.0s -> ~1s. */
  def profileLineitem(li: DataFrame): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    cols.map { c =>
      li.select(col(c)).agg(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"))
    }.reduce(_.crossJoin(_))
  }

  /** Deterministic corpus sample: order by a content-independent hash of the
    * key and take n — a reproducible "random" sample (same rows on every
    * engine/run/partitioning), the right primitive for training-data
    * subset selection. TABLESAMPLE/rand() are nondeterministic across
    * engines; hash-ordering is not. */
  def deterministicSample(docs: DataFrame, n: Int = 100): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
      md5(col("doc_id").cast("string")).as("sample_key"))
      .orderBy(col("sample_key"), col("doc_id"))
      .limit(n)

  /** Salted-join demonstration on the verified surface: lineitem (suppkey
    * is the skew-prone key at scale) joined to supplier through
    * Skew.saltedJoin — results must be identical to the plain join, which
    * is exactly what the oracle asserts. */
  def saltedSupplierJoin(s: SparkSession, d: String): DataFrame =
    graft.core.Skew.saltedJoin(
      Tables.lineitem(s, d), Tables.supplier(s, d),
      bigKey = "l_suppkey", smallKey = "s_suppkey",
      bigRowId = col("l_orderkey") * lit(16) + col("l_linenumber"), n = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("s_name"))

  /** The 100 TB quantile path: approx_percentile (Greenwald-Khanna / KLL
    * mergeable sketch) — one partial+final aggregate, O(accuracy) state per
    * group instead of q39's exact percentile buffering every value. Rank
    * error is bounded by n/accuracy; the spec asserts the observed value
    * error against the exact q39 result. Not oracle-checked (DuckDB's
    * approx sketch differs); the exact twin q39 carries the hash gate. */
  def approxPercentiles(li: DataFrame, accuracy: Int = 10000): DataFrame =
    li.groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile(l_quantity, 0.5D, $accuracy)").as("median_qty"),
        expr(s"approx_percentile(l_extendedprice, array(0.25D, 0.95D), $accuracy)").as("pp"))
      .select(col("l_returnflag"), col("median_qty"),
        col("pp").getItem(0).as("p25_price"), col("pp").getItem(1).as("p95_price"))
      .orderBy(col("l_returnflag"))

  // q90 — time-range join, equi-ized by binning: views by the same user in
  // the hour before each purchase. A naive range join is a broadcast
  // nested loop (O(|P|x|V|) — unrunnable at 100 TB); because the window
  // length equals the bin width, each purchase's window touches at most 2
  // hour bins, so exploding purchases x2 and equi-joining on (user_id,
  // bin) + exact refine gives the same rows with ONE hash join whose key
  // cardinality scales with users x hours. This is the standard
  // interval-binning rewrite (same trick q47's stream-stream join gets
  // from watermark buckets).
  def q90RangeJoinBinned(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"),
        (unix_micros(col("ts")) / hourUs).cast("long").as("bin"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("pts"))
      .withColumn("bin",
        explode(array_distinct(array(
          ((unix_micros(col("pts")) - hourUs) / hourUs).cast("long"),
          (unix_micros(col("pts")) / hourUs).cast("long")))))
    val matched = purchases.join(views, Seq("user_id", "bin"))
      .filter(col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") && col("vts") < col("pts"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_views"))
    Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(col("n_views"), lit(0L)).as("n_views"))
      .orderBy(col("event_id"))
  }

  // q91 — trailing-7-day distinct users per active day: each event
  // contributes to the 7 window-end days it falls in (explode x7), then
  // one distinct-count per day — no range join, and the explode factor is
  // the window length, not the data size. Days with no events emit no row
  // (the window-end set is the distinct active days).
  def q91SlidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
    val activeDays = ev.select(col("d")).distinct()
    val contributions = ev.withColumn("day_out",
      explode(sequence(col("d"), col("d") + expr("INTERVAL 6 DAYS"),
        expr("INTERVAL 1 DAY"))))
    contributions
      .join(activeDays.select(col("d").as("day_out")), Seq("day_out"))
      .groupBy(col("day_out"))
      .agg(countDistinct(col("user_id")).as("u7"))
      .orderBy(col("day_out"))
  }

  // q98 — weekly cohort retention: users grouped by first-active week, and
  // per (cohort, week-offset) the distinct users still active. Shape: one
  // distinct on (user, week), a min-per-user aggregate, a user-keyed join,
  // and a distinct count — three shuffles, all on the user key, so at
  // cluster scale the exchange partitioning is computed once and reused
  // (distinct on (user, week) hash-partitions by both columns, but the
  // min-agg and join both repartition to user_id and AQE coalesces them).
  // The classic product-analytics matrix, fully oracle-checkable.
  def q98Retention(s: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    uw.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(col("week").cast("date"), col("cohort_week").cast("date")) / 7)
          .cast("int").as("week_k"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_k"))
  }

  /** q128's pinned session gap — shared by the default AND the oracle. */
  private[operators] val SessionGapMin = 30

  /** q128 — gap-based sessionization: a user's events split into sessions
    * wherever consecutive events are more than `gapMinutes` apart, then
    * one summary row per session (bounds, size, value).
    *
    * Scale shape: ONE shuffle on user_id for the lag/cumsum window; the
    * per-session aggregate's key (user_id, session_idx) is a superset of
    * the window's partitioning key, so EnsureRequirements reuses the
    * exchange — no second shuffle (spec-pinned). Per-user state is a
    * window frame, never a collected list, so a power-user with millions
    * of events streams through the sort rather than materializing. Ties
    * on ts break by event_id, making session boundaries deterministic.
    *
    * Cross-engine determinism: gap compares are integer micros; the value
    * sum rides DECIMAL(30,6) (the q15 convention) so partial-aggregation
    * order can't perturb the double. */
  def sessionize(events: DataFrame, gapMinutes: Int = SessionGapMin): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(w))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("total_value"))
      .withColumn("duration_s",
        expr("(unix_micros(session_end) - unix_micros(session_start)) div 1000000"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** q130 — per-source OLS trend: slope/intercept/r² of n_chars against
    * doc_id (the "is this source drifting longer/shorter over crawl time"
    * profile). Closed form from five sufficient moments.
    *
    * Scale shape: ONE partial+final aggregate keyed by source — the moment
    * sums are the textbook mergeable regression state, so the shuffle
    * carries 5 decimals per (partition, source). No window, no join.
    *
    * Cross-engine determinism: x, y are integers, so every moment is an
    * EXACT DECIMAL(38,0) sum (n·Σxy overflows a long at corpus scale;
    * decimal38 holds it); slope/intercept/r² are then a fixed dag of
    * double ops from exact inputs — bit-identical on both engines. */
  def olsTrend(docs: DataFrame): DataFrame = {
    val x = col("doc_id").cast("decimal(19,0)")
    val y = col("n_chars").cast("decimal(19,0)")
    val m = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum((x * y).cast("decimal(38,0)")).as("sxy"),
      sum((x * x).cast("decimal(38,0)")).as("sxx"),
      sum((y * y).cast("decimal(38,0)")).as("syy"))
    val nD = col("n").cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val num = d((nD * col("sxy")).cast("decimal(38,0)") - (col("sx") * col("sy")).cast("decimal(38,0)"))
    val denX = d((nD * col("sxx")).cast("decimal(38,0)") - (col("sx") * col("sx")).cast("decimal(38,0)"))
    val denY = d((nD * col("syy")).cast("decimal(38,0)") - (col("sy") * col("sy")).cast("decimal(38,0)"))
    m.select(col("source"), col("n"),
        (num / denX).as("slope"),
        ((d(col("sy")) - (num / denX) * d(col("sx"))) / d(nD)).as("intercept"),
        ((num * num) / (denX * denY)).as("r2"))
      .orderBy(col("source"))
  }

  /** q138's pinned output size. */
  private[operators] val BurstTopN = 10

  /** q138 — burst detection: per-minute event counts z-scored against the
    * whole-stream mean/std, top-`topN` spikes (the monitoring primitive
    * behind rate-anomaly alerts / crawl-burst triage).
    *
    * Scale shape: one partial+final aggregate on the minute key (counts
    * combine map-side), one 1-row moment aggregate over the minute frame
    * (which is |minutes|-sized, not event-sized), broadcast back; top-N
    * plans as TakeOrderedAndProject. Moments ride exact decimal sums
    * (counts² overflow a long once a minute holds >3e9 events), z is a
    * fixed double dag both engines evaluate identically. Assumes ≥2
    * distinct counts (zero variance → no bursts to rank). */
  def burstDetect(events: DataFrame, topN: Int = BurstTopN): DataFrame = {
    val perMin = events
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("c"))
    val cD = col("c").cast("decimal(19,0)")
    val stats = perMin.agg(
      count(lit(1)).as("m"),
      sum(cD).as("s"),
      sum((cD * cD).cast("decimal(38,0)")).as("ss"))
    val mD = col("m").cast("double")
    val mean = col("s").cast("double") / mD
    // E[X²]−mean² can round to a tiny NEGATIVE double when counts are
    // near-constant (catastrophic cancellation on the exact decimal sums'
    // double casts) — sqrt would then be NaN for EVERY row. Clamp at 0 and
    // drop the zero-variance case entirely (constant rate ⇒ no bursts),
    // mirrored verbatim in the oracle SQL.
    val variance = greatest(col("ss").cast("double") / mD - mean * mean, lit(0.0))
    perMin.crossJoin(broadcast(stats))
      .filter(variance > 0)
      .select(col("minute"), col("c"),
        ((col("c").cast("double") - mean) / sqrt(variance)).as("z"))
      .orderBy(col("z").desc, col("minute"))
      .limit(topN)
  }

  /** q143 — per-user daily activity series with gap days materialized and
    * the last observed daily value carried forward (the resample/gap-fill
    * primitive behind per-entity time-series features: a model reading
    * "activity on day d" needs d to EXIST as a row even when no event
    * landed, and forward-fill is the standard imputation).
    *
    * Scale shape: the corpus-sized work is ONE partial+final aggregate on
    * (user_id, day) — the only shuffle that sees event-count rows. The
    * day grid is generated per user from that aggregate's min/max
    * (`sequence` + explode — scan-local, |users × span| rows, never
    * event-sized), and the grid⋈daily join plus the forward-fill window
    * all cluster by user_id alone — hashpartitioning(user_id) satisfies
    * the (user_id, day) join's ClusteredDistribution, so EnsureRequirements
    * inserts no further exchange: everything after the daily rollup rides
    * one small |users×days| shuffle. Dense-calendar caveat at 100 TB: the
    * grid is span-bounded (a user active 10 years = 3.7k rows) — fine for
    * entity counts; a per-SECOND grid would instead bucket the span.
    *
    * Determinism: day values are exact decimal sums cast to double once;
    * the forward-fill copies those doubles (no re-aggregation), so both
    * engines carry bit-identical values. */
  def gapFill(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("day_value"))
      // tiny frame: re-cluster by user only, so the span agg, the grid
      // join and the ffill window below all reuse THIS exchange
      .repartition(col("user_id"))
    val span = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      // q09 convention: DATE columns cross-engine as midnight timestamps
      .select(col("user_id"), col("day").cast("timestamp").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("day_value"), ignoreNulls = true).over(w).as("ffill_value"),
        when(col("day_value").isNull, 1L).otherwise(0L).as("is_gap"))
      .orderBy(col("user_id"), col("day"))
  }

  // ------------------------------------------------------------------ q199

  /** q199's conversion event type and administrative horizon: survival of
    * "hours from a user's first event to their first purchase", with
    * right-censoring at min(48 h, observed follow-up to the corpus max
    * timestamp) — so late-window users censor early and slow converters
    * censor at the horizon, both deterministically. */
  private[operators] val ConvEventType = "purchase"
  private[operators] val ConvHorizonH = 48L

  /** q199 — Kaplan–Meier time-to-conversion curve: the product-limit
    * estimator Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) (Kaplan & Meier 1958) over
    * hours-to-first-[[ConvEventType]], right-censored per the
    * [[ConvHorizonH]] rule — the survival form of a funnel report that,
    * unlike q45's terminal rates, is unbiased under incomplete follow-up.
    *
    * Exactness: durations, censor times, dᵢ and the at-risk counts nᵢ
    * are all integer microsecond → hour arithmetic (nᵢ by cumulative
    * subtraction over the per-hour count frame); the running product is
    * exp(Σ ln((n−d)/n)) with the Σ as a DECIMAL(25,15) cumulative window
    * — the q92 pinned-ln pattern, immune to partitioning. A step that
    * exhausts the risk set (d = n) yields survival exactly 0 via an
    * explicit flag (no ln(0) reaches either engine).
    *
    * Scale shape: one user-keyed aggregate (conditional min/max) off the
    * events table's reusable user_id exchange, one 1-row global-max
    * broadcast, then ALL window work runs on the per-hour count frame —
    * bounded by the horizon ([[ConvHorizonH]]+1 rows), not by users. */
  def kmSurvival(events: DataFrame, horizonH: Long = ConvHorizonH): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600L * 1000000L
    val perUser = events.groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_us"),
        min(when(col("event_type") === ConvEventType, unix_micros(col("ts"))))
          .as("conv_us"),
        max(unix_micros(col("ts"))).as("last_us"))
    val gmax = perUser.agg(max(col("last_us")).as("gmax_us"))
    val lives = perUser.crossJoin(broadcast(gmax))
      .withColumn("censor_h",
        least(lit(horizonH), expr(s"(gmax_us - first_us) DIV $hourUs")))
      .withColumn("dur_h", expr(s"(conv_us - first_us) DIV $hourUs"))
      .select(
        when(col("dur_h").isNotNull && col("dur_h") <= col("censor_h"),
          col("dur_h")).otherwise(col("censor_h")).as("life_h"),
        when(col("dur_h").isNotNull && col("dur_h") <= col("censor_h"), 1L)
          .otherwise(0L).as("converted"))
    val byLife = lives.groupBy(col("life_h"))
      .agg(count(lit(1)).as("n_all"), sum(col("converted")).as("d"))
    val wc = Window.orderBy(col("life_h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = byLife
      .withColumn("cum_all", sum(col("n_all")).over(wc))
      .crossJoin(broadcast(lives.agg(count(lit(1)).as("n_users"))))
      .withColumn("n_risk", col("n_users") - col("cum_all") + col("n_all"))
    val lnTerm = when(col("d") > 0 && col("d") < col("n_risk"),
      graft.functions.Pin.grid9(
        log((col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double"))))
      .otherwise(lit(0.0))
    atRisk
      .withColumn("zf", max(when(col("d") === col("n_risk"), 1L).otherwise(0L)).over(wc))
      .withColumn("lnsum",
        sum(lnTerm.cast("decimal(25,15)")).over(wc))
      .filter(col("d") > 0)
      // terminal exp() is NOT correctly-rounded IEEE (JVM Math.exp vs
      // DuckDB libm differ by a last ulp on some inputs), so the output
      // is pinned to the canonical 1e-9 grid in BOTH engines (Pin.grid9
      // — each engine's own round() walks a different double path and
      // can disagree on scaled boundaries; the explicit floor cannot).
      .select(col("life_h"), col("n_risk"), col("d").as("n_converted"),
        graft.functions.Pin.grid9(when(col("zf") === 1L, lit(0.0))
          .otherwise(exp(col("lnsum").cast("double")))).as("survival"))
      .orderBy(col("life_h"))
  }

  // ------------------------------------------------------------------ q201

  /** Max lag (days) reported by the q201 autocorrelation profile. */
  private[operators] val AcfMaxLag = 7

  /** q201 — sample autocorrelation of the daily event-count series at
    * lags 1..[[AcfMaxLag]]: ρ_k = Σ_t z_t·z_{t+k} / Σ_t z_t² with
    * z_t = T·c_t − S (the mean-centered count scaled by T so EVERY
    * intermediate is an exact integer — no float mean enters the sum).
    * The day grid is gap-filled with zero-count days (a missing day IS
    * data for autocorrelation), using epoch-day indices so both engines
    * bucket identically. The weekly-seasonality / burst-memory profile
    * that complements q138's point bursts and q189's micro-scale gaps.
    *
    * Exactness: counts and T·c−S are BIGINT; the lag products go
    * through decimal(38,0) (z ≲ 10¹⁶ at a 10⁴-day × 10¹²-events/day
    * scale → z² ≲ 10³² — far inside decimal(38,0), outside BIGINT);
    * ρ is one terminal double division.
    *
    * Scale shape: one day-keyed count aggregate off the events scan,
    * then EVERYTHING runs on the day-grid frame (|days| rows, bounded
    * by the observation window): a 7× lag expansion, one shifted
    * self-equi-join on the day key, one ≤7-key aggregate. */
  def acfDaily(s: SparkSession, events: DataFrame, maxLag: Int = AcfMaxLag): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    val counts = events.select(expr(s"unix_micros(ts) DIV $dayUs").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("c"))
    val grid = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val series = grid.join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
    val tot = series.agg(count(lit(1)).as("t_days"), sum(col("c")).as("s_tot"))
    val z = series.crossJoin(broadcast(tot))
      .select(col("day"), (col("t_days") * col("c") - col("s_tot")).as("z"))
    val den = z.agg(sum(col("z").cast("decimal(19,0)") * col("z").cast("decimal(19,0)"))
      .as("den"))
    val lags = (1 to maxLag).map(_.toLong).toDF("lag")
    val num = z.crossJoin(broadcast(lags))
      .join(z.select(col("day").as("day2"), col("z").as("z2")),
        col("day2") === col("day") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("z").cast("decimal(19,0)") * col("z2").cast("decimal(19,0)"))
          .as("num"))
    num.crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        (col("num").cast("double") / col("den").cast("double")).as("acf"))
      .orderBy(col("lag"))
  }

  // ------------------------------------------------- q216 seasonal decompose

  /** q216's pinned seasonal period (weekly on a daily series). */
  private[operators] val SeasonPeriod = 7

  /** q216 — classical additive seasonal decomposition of the daily
    * event-count series (the moving-average step of STL/X-11, period 7):
    * trend = centered 7-day moving average, seasonal index per weekday
    * phase = mean of the detrended series at that phase. The monitoring
    * op that splits q201's "is there weekly structure" (ACF) into WHICH
    * weekday carries how much traffic, on the same zero-filled epoch-day
    * grid.
    *
    * Exactness: counts are BIGINT on the dense day grid; the detrended
    * value is kept ×7 (d7 = 7·c − Σ_{±3} c — pure integers, no float
    * mean enters), only COMPLETE 7-day windows contribute, and each
    * phase mean is one terminal division Σd7 / (7·n). Phase = epoch-day
    * mod 7 (phase 0 = Thursday — 1970-01-01), identical both engines,
    * sidestepping engine-specific weekday numbering.
    *
    * Scale shape: one day-keyed count off the events scan; everything
    * after (gap-fill, one 7-row window pass, a ≤7-key aggregate) runs on
    * the |days| grid frame. */
  def seasonalDecompose(s: SparkSession, events: DataFrame,
                        period: Int = SeasonPeriod): DataFrame = {
    require(period >= 2 && period % 2 == 1, "period must be odd (centered window)")
    val half = period / 2
    val dayUs = 86400L * 1000000L
    val counts = events.select(expr(s"unix_micros(ts) DIV $dayUs").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("c"))
    val grid = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val series = grid.join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.orderBy(col("day")).rowsBetween(-half, half)
    val det = series
      .withColumn("t7", sum(col("c")).over(w))
      .withColumn("nw", count(lit(1)).over(w))
      .filter(col("nw") === period)
      .select((col("day") % period).as("phase"), col("c"),
        (lit(period.toLong) * col("c") - col("t7")).as("d7"))
    det.groupBy(col("phase"))
      .agg(count(lit(1)).as("n_days"),
        (sum(col("c")).cast("double") / count(lit(1)).cast("double")).as("avg_count"),
        (sum(col("d7")).cast("double") /
          (lit(period.toDouble) * count(lit(1)).cast("double"))).as("seasonal"))
      .orderBy(col("phase"))
  }

  // --------------------------------------------------- q223 changepoint

  /** Zero-filled daily event-count series (the q201/q216 grid, shared). */
  private[graft] def dailySeries(events: DataFrame): DataFrame = {
    val dayUs = 86400L * 1000000L
    val counts = events.select(expr(s"unix_micros(ts) DIV $dayUs").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("c"))
    val grid = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    grid.join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
  }

  /** q223 — binary-segmentation changepoint detection (depth 2) on the
    * daily event-count series: the level-shift monitor that answers
    * "WHEN did the traffic regime change", complementing q138's "is this
    * minute bursty" and q201's "is there periodic structure". For a
    * split of segment [a,b] after position t, the between-segment SSE
    * reduction is diff²/(n₁·n₂·len) with diff = S₁·n₂ − S₂·n₁ — every
    * input an exact BIGINT prefix sum, diff exact in decimal (up to
    * 1e38), then cast to double BEFORE squaring so both engines round
    * the same IEEE value past 2^53 (exact below it — any realistic
    * day-grid volume) and the argmax cannot split engines. Level 1 picks the global split;
    * level 2 re-splits both halves IN-PLAN (segment-keyed windows over
    * the same prefix frame — bounded unrolling, no driver loop).
    *
    * Scale shape: one day-keyed count off the events scan; everything
    * after (gap-fill, one prefix window, two argmax windows) runs on the
    * calendar-bounded |days| grid frame. The unpartitioned prefix window
    * is |days|-bounded by construction — same trade as q201/q216. */
  /** Prefix-sum day frame shared by q223/q233: (day, c, s, d0, t, s_tot,
    * pos) on the zero-filled grid. */
  private def prefixFrame(events: DataFrame): DataFrame = {
    val series = dailySeries(events)
    val tot = series.agg(min(col("day")).as("d0"), count(lit(1)).as("t"),
      sum(col("c")).as("s_tot"))
    val wp = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series.withColumn("s", sum(col("c")).over(wp))
      .crossJoin(broadcast(tot))
      .select(col("day"), col("c"), col("s"), col("d0"), col("t"), col("s_tot"),
        (col("day") - col("d0") + 1).as("pos"))
  }

  private def dec(c: Column) = c.cast("decimal(19,0)")

  private def gainOf(s1: Column, s2: Column, n1: Column, n2: Column,
                     len: Column): Column = {
    // diff is exact in decimal up to 1e38; it is cast to double BEFORE
    // squaring (round-10, ADVICE): the former decimal(38,0) diff² wrapped
    // Spark-side at |diff| ≥ 1e19 while DuckDB's HUGEINT held — now both
    // engines round the same IEEE double at 2^53 and degrade identically
    // (the oracle squares the same CAST(diff AS DOUBLE)). For |diff| <
    // 2^53 — any realistic day-grid volume — the gain is bit-unchanged.
    val diff = (dec(s1) * dec(n2) - dec(s2) * dec(n1)).cast("double")
    diff * diff / (dec(n1) * dec(n2) * dec(len)).cast("double")
  }

  /** Level-1 split candidates with gains, argmax-ranked (rk = 1 is the
    * cut) — the shared front half of q223, also conditioned on by q233. */
  private def lvl1Ranked(pre: DataFrame): DataFrame = {
    val c1 = pre.filter(col("pos") < col("t"))
      .select(col("day"), col("pos"), col("d0"), col("t"), col("s_tot"),
        col("pos").as("n1"), (col("t") - col("pos")).as("n2"),
        col("s").as("s1"), (col("s_tot") - col("s")).as("s2"))
      .withColumn("gain",
        gainOf(col("s1"), col("s2"), col("n1"), col("n2"), col("t")))
    val w1 = Window.orderBy(col("gain").desc, col("day"))
    c1.withColumn("rk", row_number().over(w1))
  }

  def changepoint(s: SparkSession, events: DataFrame): DataFrame = {
    val pre = prefixFrame(events)
    val split1 = lvl1Ranked(pre).filter(col("rk") === 1)
    val lvl1 = split1.select(lit(1L).as("level"),
      col("d0").as("seg_start_day"), (col("d0") + col("t") - 1).as("seg_end_day"),
      col("day").as("split_day"), col("n1").as("n_left"), col("n2").as("n_right"),
      (col("s1").cast("double") / col("n1").cast("double")).as("mean_left"),
      (col("s2").cast("double") / col("n2").cast("double")).as("mean_right"),
      col("gain"))
    // level 2: re-split each half of the level-1 partition
    val cut = split1.select(col("pos").as("cut_pos"), col("s1").as("cut_s"))
    val seg = pre.crossJoin(broadcast(cut))
      .withColumn("a", when(col("pos") <= col("cut_pos"), lit(1L))
        .otherwise(col("cut_pos") + 1))
      .withColumn("b", when(col("pos") <= col("cut_pos"), col("cut_pos"))
        .otherwise(col("t")))
      .withColumn("sa", when(col("pos") <= col("cut_pos"), lit(0L))
        .otherwise(col("cut_s")))
      .withColumn("sb", when(col("pos") <= col("cut_pos"), col("cut_s"))
        .otherwise(col("s_tot") - col("cut_s")))
    val c2 = seg.filter(col("pos") < col("b"))
      .select(col("day"), col("d0"), col("a"), col("b"),
        (col("pos") - col("a") + 1).as("n1"), (col("b") - col("pos")).as("n2"),
        (col("s") - col("sa")).as("s1"),
        (col("sb") - (col("s") - col("sa"))).as("s2"),
        (col("b") - col("a") + 1).as("len"))
      .withColumn("gain",
        gainOf(col("s1"), col("s2"), col("n1"), col("n2"), col("len")))
    val w2 = Window.partitionBy(col("a")).orderBy(col("gain").desc, col("day"))
    val lvl2 = c2.withColumn("rk", row_number().over(w2)).filter(col("rk") === 1)
      .select(lit(2L).as("level"),
        (col("d0") + col("a") - 1).as("seg_start_day"),
        (col("d0") + col("b") - 1).as("seg_end_day"),
        col("day").as("split_day"), col("n1").as("n_left"), col("n2").as("n_right"),
        (col("s1").cast("double") / col("n1").cast("double")).as("mean_left"),
        (col("s2").cast("double") / col("n2").cast("double")).as("mean_right"),
        col("gain"))
    lvl1.unionAll(lvl2).orderBy(col("level"), col("seg_start_day"))
  }

  // ------------------------------------------ q233 segmented regression

  /** q233 — segmented OLS around the q223 level-1 changepoint: one
    * least-squares line per regime, answering "what was the trend
    * BEFORE the break vs AFTER it" — the follow-up every q223 alert
    * gets. Slopes come from exact integer moments per segment
    * (n·Σxy − Σx·Σy over n·Σx² − (Σx)², decimal products), so the only
    * doubles are the two terminal divisions; single-day segments pin
    * slope/intercept to NULL rather than 0/0.
    *
    * Scale shape: the q223 plan (day-keyed count + calendar-bounded
    * windows) plus one 2-key moment aggregate. The level-1 cut is
    * recomputed in-plan from the same prefix frame — Catalyst reuses
    * the exchange; no driver round-trip. */
  def segmentedRegression(s: SparkSession, events: DataFrame): DataFrame = {
    val pre = prefixFrame(events)
    val cut = lvl1Ranked(pre).filter(col("rk") === 1)
      .select(col("pos").as("cut_pos"))
    val seg = pre.crossJoin(broadcast(cut))
      .select(when(col("pos") <= col("cut_pos"), lit(1L)).otherwise(lit(2L))
          .as("segment"),
        col("day"), col("pos"), col("c"))
    val m = seg.groupBy(col("segment")).agg(
      count(lit(1)).as("n"),
      min(col("day")).as("day_start"), max(col("day")).as("day_end"),
      sum(col("pos")).as("sx"), sum(col("c")).as("sy"),
      sum(dec(col("pos")) * dec(col("c"))).as("sxy"),
      sum(dec(col("pos")) * dec(col("pos"))).as("sxx"))
    val slope = (dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
      .cast("double") /
      (dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
        .cast("double")
    val slopeG = when(col("n") > 1, slope).otherwise(lit(null).cast("double"))
    m.select(col("segment"), col("day_start"), col("day_end"), col("n").as("n_days"),
        slopeG.as("slope"),
        when(col("n") > 1,
          (col("sy").cast("double") - slope * col("sx").cast("double")) /
            col("n").cast("double"))
          .otherwise(lit(null).cast("double")).as("intercept"))
      .orderBy(col("segment"))
  }

  // ----------------------------------------------------- q224 Theil-Sen

  /** q224 — Theil-Sen robust trend estimator on the daily event-count
    * series: slope = median of all pairwise slopes, intercept = median
    * of the residuals under that slope. Unlike q130's OLS it shrugs off
    * outlier days (up to ~29% contamination), which is exactly what
    * launch-day spikes and outage zeros are. Each pairwise slope is one
    * division of exact integers (correctly-rounded IEEE — identical in
    * both engines); the median is picked by EXACT rank (row_number over
    * (slope, x1, x2), the two middle ranks averaged — a 2-term float
    * add, order-free).
    *
    * Scale shape: the pair frame is the day-grid self theta join —
    * |days|²/2 pairs, CALENDAR-bounded (a decade of days = 1.3M pairs
    * on one executor), independent of event volume; the events scan
    * contributes only the day-keyed count. */
  def theilSen(s: SparkSession, events: DataFrame): DataFrame = {
    val series = dailySeries(events)
    val t0 = series.agg(min(col("day")).as("d0"), count(lit(1)).as("t_days"))
    val xy = series.crossJoin(broadcast(t0))
      .select((col("day") - col("d0") + 1).as("x"), col("c").as("y"),
        col("t_days"))
    val pairs = xy.as("p1")
      .join(broadcast(xy.select(col("x").as("x2"), col("y").as("y2"))),
        col("x2") > col("x"))
      .select(col("x").as("x1"), col("x2"),
        ((col("y2") - col("y")).cast("double") /
          (col("x2") - col("x")).cast("double")).as("slope"))
    val np = pairs.agg(count(lit(1)).as("n_pairs"))
    val wr = Window.orderBy(col("slope"), col("x1"), col("x2"))
    val slopeMed = pairs.withColumn("rk", row_number().over(wr))
      .crossJoin(broadcast(np))
      .filter(col("rk") === expr("(n_pairs + 1) div 2") ||
        col("rk") === expr("(n_pairs + 2) div 2"))
      .agg((sum(col("slope")) / count(lit(1)).cast("double")).as("slope"),
        first(col("n_pairs")).as("n_pairs"))
    val res = xy.crossJoin(broadcast(slopeMed))
      .select(col("x"), col("t_days"), col("slope"), col("n_pairs"),
        (col("y").cast("double") - col("slope") * col("x").cast("double")).as("r"))
    val wi = Window.orderBy(col("r"), col("x"))
    res.withColumn("rk", row_number().over(wi))
      .filter(col("rk") === expr("(t_days + 1) div 2") ||
        col("rk") === expr("(t_days + 2) div 2"))
      .agg(first(col("t_days")).as("n_days"), first(col("n_pairs")).as("n_pairs"),
        first(col("slope")).as("slope_per_day"),
        (sum(col("r")) / count(lit(1)).cast("double")).as("intercept"))
  }

  // ------------------------------------------------ q266 Mann-Kendall

  /** q266 — Mann-Kendall trend test per event type (Mann 1945; Kendall
    * 1975): q224's Theil–Sen estimates HOW FAST a daily metric moves;
    * this answers IS IT MOVING AT ALL — S = Σ_{i<j} sign(m_j − m_i)
    * over day pairs, the tie-corrected variance
    * (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18, and the continuity-corrected
    * z = (S ∓ 1)/√var — the monitoring gate that flags a drifting
    * quality metric before a threshold alarm would.
    *
    * Exactness: the daily metric is the exact cent SUM (no division),
    * so every pairwise sign, S, and the tie spectrum are exact
    * integers; var is one exact-integer difference divided by 18.0 and
    * z adds one sqrt — both correctly-rounded IEEE, bit-identical
    * cross-engine with no grid pin. All-tied series (var = 0) emit
    * z = 0 by the same CASE in both engines.
    *
    * Scale shape: one (type, day) aggregate over the scan; the pair
    * join is an EQUI-join on event_type with a day inequality — sort-
    * merge, |types|·O(days²) pairs on a calendar-bounded grid (q224's
    * cost shape, keyed instead of broadcast). */
  def mannKendall(s: SparkSession, events: DataFrame): DataFrame = {
    val dayUs = 86400L * 1000000L
    val daily = events
      .select(col("event_type"),
        expr(s"unix_micros(ts) DIV $dayUs").as("day"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("m"))
    val sStat = daily
      .join(daily.select(col("event_type").as("et2"), col("day").as("day2"),
        col("m").as("m2")),
        col("event_type") === col("et2") && col("day2") > col("day"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("m2") > col("m"), 1L)
        .when(col("m2") < col("m"), -1L).otherwise(0L)).as("s_stat"))
    val ties = daily
      .groupBy(col("event_type"), col("m")).agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t")).as("n_days"),
        sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tie_term"))
    val n = col("n_days")
    val varS = ((n * (n - 1) * (lit(2L) * n + 5) - col("tie_term"))
      .cast("double") / lit(18.0)).as("var_s")
    sStat.join(ties, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("s_stat"), varS)
      .withColumn("z",
        when(col("var_s") <= 0.0, lit(0.0))
          .when(col("s_stat") > 0,
            (col("s_stat").cast("double") - lit(1.0)) / sqrt(col("var_s")))
          .when(col("s_stat") < 0,
            (col("s_stat").cast("double") + lit(1.0)) / sqrt(col("var_s")))
          .otherwise(lit(0.0)))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------- q267/q268 experiment health

  /** χ²₁ 0.95 critical value (the SRM alarm threshold every platform
    * quotes) and the z-quantile sum (two-sided α=0.05 ⇒ z₀.₉₇₅, power
    * 0.8 ⇒ z₀.₈) — driver-side constants printed into BOTH engines via
    * [[Pin.sqlDouble]], the q236 driver-printed-literal convention. */
  private[operators] val SrmChi2Crit = 3.841458820694124
  private[operators] val MdeZ = 1.959963984540054 + 0.8416212335729143

  /** q267 — sample-ratio mismatch gate (Fabijan et al., KDD 2019 "
    * Diagnosing Sample Ratio Mismatch"): before ANY experiment readout,
    * test the arm sizes against the intended 50/50 split — a skewed
    * ratio means broken assignment or logging, and every downstream
    * metric is suspect. χ² against equal expectation reduces to
    * (n_a − n_b)²/N; the flag compares it to the driver-printed
    * χ²₁ 0.95 critical value. Exact integer counts; two IEEE ops;
    * bit-identical. One distinct-user aggregate, single-row output. */
  def srmCheck(s: SparkSession, events: DataFrame): DataFrame = {
    val armB = graft.functions.TextFunctions.h60(col("user_id").cast("string")) >=
      lit(1L << 59)
    val d = (c: Column) => c.cast("double")
    events.select(col("user_id")).distinct()
      .select(when(armB, 1L).otherwise(0L).as("b"))
      .agg(sum(lit(1L) - col("b")).as("n_a"), sum(col("b")).as("n_b"))
      .select(
        (col("n_a") + col("n_b")).as("n_users"), col("n_a"), col("n_b"),
        ((d(col("n_a")) - d(col("n_b"))) * (d(col("n_a")) - d(col("n_b"))) /
          d(col("n_a") + col("n_b"))).as("chi2"))
      .withColumn("srm_flag", col("chi2") > lit(SrmChi2Crit))
  }

  /** q268 — minimum detectable effect at the current sample sizes
    * (the power line every experiment design doc quotes): with
    * per-user spend as the metric, MDE_abs = (z₀.₉₇₅ + z₀.₈)·σ̂·
    * √(1/n_a + 1/n_b) — how small a lift THIS experiment could see at
    * α=0.05 / power 0.8. σ̂ is the pooled sample sd from exact-cents
    * integer moments (the q264 idiom); the z sum is a driver-printed
    * constant; the output chain is divisions and one sqrt —
    * bit-identical, no grid pin. One user-keyed aggregate + one global
    * aggregate; single-row output. */
  def mdeReport(s: SparkSession, events: DataFrame): DataFrame = {
    val cents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    val armB = graft.functions.TextFunctions.h60(col("user_id").cast("string")) >=
      lit(1L << 59)
    val perUser = events
      .select(col("user_id"), cents.as("c"))
      .groupBy(col("user_id")).agg(sum(col("c")).as("x"))
      .select(col("x"), when(armB, 1L).otherwise(0L).as("b"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    perUser.agg(
      count(lit(1)).as("n"),
      sum(lit(1L) - col("b")).as("n_a"), sum(col("b")).as("n_b"),
      sum(dec(col("x"))).cast("decimal(38,0)").as("sx"),
      sum(dec(col("x")) * dec(col("x"))).cast("decimal(38,0)").as("sxx"))
      .select(col("n").as("n_users"), col("n_a"), col("n_b"),
        (d(col("sx")) / d(col("n")) / lit(100.0)).as("mean_metric"),
        (sqrt((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) /
          (d(col("n")) * (d(col("n")) - lit(1.0)))) / lit(100.0)).as("sd_metric"),
        (lit(MdeZ) *
          sqrt((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) /
            (d(col("n")) * (d(col("n")) - lit(1.0)))) *
          sqrt(lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b")))
          / lit(100.0)).as("mde_abs"))
      .withColumn("mde_rel", col("mde_abs") / col("mean_metric"))
  }

  // ------------------------------------------- q270 ratio-metric delta

  /** z₀.₉₇₅ for the q270 interval — driver-printed into both engines. */
  private[operators] val DeltaZ = 1.959963984540054

  /** q270 — delta-method CI for a RATIO metric (Deng, Knoblich & Lu,
    * KDD 2018 "Applying the Delta Method in Metric Analytics"): revenue
    * per event is a ratio of two user-level sums, so the naive
    * per-observation variance is wrong (events within a user are
    * correlated); the delta method gives
    * var(R) ≈ (var_s − 2R·cov + R²·var_k) / (n·k̄²) from user-level
    * moments of (spend s, event count k). Per arm: the ratio, its
    * standard error, and the 95% interval — the readout experiment
    * platforms actually ship for non-user-level metrics.
    *
    * Exactness: s is exact cents and k an exact count per user, so all
    * six moments per arm are exact decimal(38,0)/HUGEINT sums; R, SE,
    * and the interval are mirrored chains of correctly-rounded IEEE
    * ops plus one sqrt, with the z quantile a driver-printed literal —
    * bit-identical, no grid pin. Scale shape: one user-keyed aggregate
    * (the corpus-sized shuffle), a 2-row arm rollup. */
  def ratioDelta(s: SparkSession, events: DataFrame): DataFrame = {
    val cents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    val armB = graft.functions.TextFunctions.h60(col("user_id").cast("string")) >=
      lit(1L << 59)
    val perUser = events
      .select(col("user_id"), cents.as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("s"), count(lit(1)).as("k"))
      .select(col("s"), col("k"),
        when(armB, "B").otherwise("A").as("arm"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val m = perUser.groupBy(col("arm")).agg(
      count(lit(1)).as("n"),
      sum(dec(col("s"))).cast("decimal(38,0)").as("ss"),
      sum(dec(col("k"))).cast("decimal(38,0)").as("sk"),
      sum(dec(col("s")) * dec(col("s"))).cast("decimal(38,0)").as("sss"),
      sum(dec(col("k")) * dec(col("k"))).cast("decimal(38,0)").as("skk"),
      sum(dec(col("s")) * dec(col("k"))).cast("decimal(38,0)").as("ssk"))
    val n = d(col("n"))
    val r = d(col("ss")) / d(col("sk"))
    val varS = (n * d(col("sss")) - d(col("ss")) * d(col("ss"))) /
      (n * (n - lit(1.0)))
    val varK = (n * d(col("skk")) - d(col("sk")) * d(col("sk"))) /
      (n * (n - lit(1.0)))
    val covSK = (n * d(col("ssk")) - d(col("ss")) * d(col("sk"))) /
      (n * (n - lit(1.0)))
    val meanK = d(col("sk")) / n
    val se = sqrt((varS - lit(2.0) * r * covSK + r * r * varK) /
      (n * meanK * meanK))
    m.select(col("arm"), col("n").as("n_users"),
        (r / lit(100.0)).as("ratio"),
        (se / lit(100.0)).as("se"),
        ((r - lit(DeltaZ) * se) / lit(100.0)).as("ci_lo"),
        ((r + lit(DeltaZ) * se) / lit(100.0)).as("ci_hi"))
      .orderBy(col("arm"))
  }

  // ------------------------------------------ q272 two-proportion test

  /** q272 — pooled two-proportion z-test of conversion by arm (the
    * fixed-horizon counterpart of q236's sequential test, and the
    * single most-used experiment readout there is): a user converts if
    * they ever make a HIGH-VALUE purchase (value > 150 — plain purchase
    * existence saturates to p=1 on this event log and degenerates the
    * pooled variance); z = (p_b − p_a) / √(p̂(1−p̂)(1/n_a + 1/n_b))
    * with p̂ the pooled rate. Exactness: conversion and arm are exact
    * integer facts (md5 coin, purchase existence), rates and z are one
    * mirrored chain of correctly-rounded IEEE ops + one sqrt —
    * bit-identical, no pin. Scale shape: one user-keyed aggregate over
    * the scan, a 1-row fold. */
  def twoProportion(s: SparkSession, events: DataFrame): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val perUser = events.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
          col("value") > lit(150.0), 1L).otherwise(0L)).as("conv"))
      .select(col("conv"),
        when(graft.functions.TextFunctions.h60(col("user_id").cast("string"))
          >= lit(1L << 59), 1L).otherwise(0L).as("b"))
    val m = perUser.agg(
      sum(lit(1L) - col("b")).as("n_a"), sum(col("b")).as("n_b"),
      sum(when(col("b") === 0L, col("conv")).otherwise(0L)).as("c_a"),
      sum(when(col("b") === 1L, col("conv")).otherwise(0L)).as("c_b"))
    val pa = d(col("c_a")) / d(col("n_a"))
    val pb = d(col("c_b")) / d(col("n_b"))
    val pp = (d(col("c_a")) + d(col("c_b"))) / (d(col("n_a")) + d(col("n_b")))
    m.select(col("n_a"), col("n_b"), col("c_a"), col("c_b"),
      pa.as("rate_a"), pb.as("rate_b"),
      ((pb - pa) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))).as("z"))
  }

  // ----------------------------------------------------- q236 SPRT A/B

  /** q236's pinned design: H1 says arm B draws θ₁ = 0.6 of conversions
    * (vs 0.5 under H0); α = β = 0.05 ⇒ Wald boundaries ±ln 19. */
  private[operators] val SprtTheta1 = 0.6
  private[operators] val SprtBound = 19.0

  /** q236 ln constants, evaluated ONCE on the JVM and driver-printed as
    * shortest-roundtrip double literals into BOTH the Column chain and
    * the oracle SQL (the q248 geometric-weight pattern): ln/exp are not
    * correctly-rounded IEEE, so letting each engine's libm evaluate
    * `ln(1.2)` independently risks a last-ulp literal difference that
    * counts in the thousands then amplify past any rounding grid. */
  private[operators] val SprtLn1 = math.log(SprtTheta1 / 0.5)
  private[operators] val SprtLn0 = math.log((1.0 - SprtTheta1) / 0.5)
  private[operators] val SprtLnBound = math.log(SprtBound)

  /** q236 — sequential probability ratio test (Wald 1945) replayed over
    * the event log: users are md5-coin-split into arms A/B, each user's
    * FIRST purchase is a conversion, and the conditional-binomial SPRT
    * asks "is B over-converting" — LLR_t = cb_t·ln(θ₁/½) +
    * ca_t·ln((1−θ₁)/½), crossing ±ln 19. The experimentation-analytics
    * readout: WHEN would the test have stopped, per day, not just the
    * end-of-window rate (q45/q98 territory).
    *
    * Exactness: arm assignment is an integer h60 compare (no division),
    * conversion counts are exact integers, and the LLR is a 2-term
    * pinned chain on DRIVER-PRINTED ln literals ([[SprtLn0]]/[[SprtLn1]]
    * — identical double bits in both engines; mult/add are then
    * correctly-rounded IEEE, so llr is bit-identical). Boundary flags
    * compare that chain to the driver-printed [[SprtLnBound]].
    *
    * Scale shape: one purchase-filtered user-keyed min (first
    * purchase), one (day, arm) count; the cumulative windows run on the
    * calendar-bounded day frame. */
  def sprtReplay(s: SparkSession, events: DataFrame,
                 theta1: Double = SprtTheta1): DataFrame = {
    val dayUs = 86400L * 1000000L
    val firstBuy = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
    val armB = graft.functions.TextFunctions.h60(col("user_id").cast("string")) >=
      lit(1L << 59)
    val perDay = firstBuy
      .select(expr(s"unix_micros(first_ts) DIV $dayUs").as("day"),
        when(armB, 1L).otherwise(0L).as("is_b"))
      .groupBy(col("day"))
      .agg(sum(lit(1L) - col("is_b")).as("ca"), sum(col("is_b")).as("cb"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val l1 = lit(math.log(theta1 / 0.5))
    val l0 = lit(math.log((1.0 - theta1) / 0.5))
    val cum = perDay
      .withColumn("conv_a_cum", sum(col("ca")).over(w))
      .withColumn("conv_b_cum", sum(col("cb")).over(w))
    val llr = col("conv_a_cum").cast("double") * l0 +
      col("conv_b_cum").cast("double") * l1
    cum.select(col("day"), col("conv_a_cum"), col("conv_b_cum"),
        llr.as("llr"),
        (llr >= lit(SprtLnBound)).as("crossed_up"),
        (llr <= lit(-SprtLnBound)).as("crossed_low"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------- q246 daily quantiles

  /** q246 — exact daily p50/p95 bands of the event value: the
    * monitoring trajectory an SLO dashboard draws (q216 tracks the
    * MEAN's seasonal shape; tails move first). Exact order statistics
    * — p50 at rank (n+1) div 2, p95 at rank ceil(0.95·n) — picked by a
    * day-partitioned rank window with event_id ties, so no approximate
    * percentile sketch enters the comparison.
    *
    * Scale shape: one day-partitioned window over the scan (per-day
    * sort, key-parallel — the per-source order-statistic shape), one
    * day rollup. */
  def dayQuantiles(s: SparkSession, events: DataFrame): DataFrame = {
    val dayUs = 86400L * 1000000L
    val v = events.select(expr(s"unix_micros(ts) DIV $dayUs").as("day"),
      col("value"), col("event_id"))
    val w = Window.partitionBy(col("day")).orderBy(col("value"), col("event_id"))
    v.withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("day"))))
      .groupBy(col("day"))
      .agg(max(col("n")).as("n"),
        max(when(col("rk") === expr("(n + 1) div 2"), col("value"))).as("p50"),
        max(when(col("rk") === expr("(n * 19 + 19) div 20"), col("value")))
          .as("p95"))
      .orderBy(col("day"))
  }

  // ------------------------------------------------ q248 top-k churn

  /** q248's list depth and RBO persistence. */
  private[operators] val RboK = 20
  private[operators] val RboP = 0.9

  /** q248 — top-k churn between the first and second half of the event
    * window, scored with truncated Rank-Biased Overlap (Webber et al.
    * 2010): RBO = (1−p)·Σ_{d≤k} p^{d−1}·|A_d ∩ B_d|/d over the top-k
    * users by event count in each half. The "did our heavy hitters
    * change" monitor — set Jaccard alone ignores rank movement, which
    * is most of the signal at the head.
    *
    * Exactness: both top-k lists are integer-count ranked with user_id
    * ties; prefix overlaps are integers; the geometric weights are
    * driver-printed double literals embedded in BOTH engines (Scala's
    * shortest-roundtrip rendering), and the weighted sum folds as
    * floor(term·1e15) integers. The half-split day is an integer
    * midpoint from a 1-row bounds attach.
    *
    * Scale shape: one (half, user) count off the scan, two k-bounded
    * rank windows, then everything runs on ≤k-row frames. */
  def topkChurn(s: SparkSession, events: DataFrame, k: Int = RboK,
                p: Double = RboP): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    val days = events.select(expr(s"unix_micros(ts) DIV $dayUs").as("day"),
      col("user_id"))
    val cut = days.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(expr("(d0 + d1 + 1) div 2").as("cut"))
    val halves = days.crossJoin(broadcast(cut))
      .select(when(col("day") < col("cut"), 0).otherwise(1).as("half"),
        col("user_id"))
      .groupBy(col("half"), col("user_id")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("half")).orderBy(col("c").desc, col("user_id"))
    val top = halves.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
    val matched = top.filter(col("half") === 0)
      .select(col("user_id"), col("rk").as("ra"))
      .join(top.filter(col("half") === 1)
        .select(col("user_id"), col("rk").as("rb")), Seq("user_id"))
    val dgrid = rboWeights(k, p).toDF("d", "weight")
    val sizes = top.groupBy().agg(
      sum(when(col("half") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("half") === 1, 1L).otherwise(0L)).as("nb"))
    val overlap = broadcast(dgrid).join(matched,
        greatest(col("ra"), col("rb")) <= col("d"), "left")
      .groupBy(col("d"), col("weight"))
      .agg(count(col("user_id")).as("x"))
    overlap.agg(
        max(when(col("d") === k, col("x"))).as("overlap_at_k"),
        sum(floor(col("weight") * col("x").cast("double") /
          col("d").cast("double") * lit(1e15)).cast("decimal(19,0)"))
          .as("rsum"))
      .crossJoin(broadcast(sizes))
      .select(lit(k).as("k"), col("overlap_at_k"),
        (col("overlap_at_k").cast("double") /
          (col("na") + col("nb") - col("overlap_at_k")).cast("double"))
          .as("jaccard"),
        (lit(1.0 - p) * (col("rsum").cast("double") / lit(1e15))).as("rbo"))
  }

  // --------------------------------------------------------------------- //

  /** q264's pinned experiment window boundary (the month's midpoint),
    * shared with the generated oracle. */
  private[operators] val CupedCutoff = "2024-01-16 00:00:00"

  /** q264 — CUPED variance reduction for the A/B readout (Deng,
    * Xu, Kohavi & Walker, WSDM 2013): per user, the PRE-period spend is
    * a covariate X for the post-period metric Y; the adjusted metric
    * Y − θ(X − X̄) with θ = cov(X,Y)/var(X) has variance
    * var(Y)·(1 − ρ²) — the standard way an experimentation platform
    * buys sensitivity without more traffic. Arms ride the q236 md5
    * coin; the readout is per-arm n / mean / adjusted mean plus the
    * pooled θ and the variance ratio 1 − ρ².
    *
    * Exactness: event values are cents-exact doubles, so per-user X/Y
    * are EXACT integer cents (floor(v·100 + ½) per event), and every
    * moment (Σx, Σy, Σx², Σxy, Σy², per arm and pooled) is an exact
    * decimal(38,0) / HUGEINT sum. θ, means, and the ratio are then
    * short chains of correctly-rounded IEEE ops on identical integers
    * — bit-identical cross-engine with NO transcendental anywhere.
    *
    * Scale shape: one user-keyed aggregate over the scan (the only
    * corpus-sized shuffle), a 2-row arm rollup, a 1-row pooled-moment
    * attach — the q78 exact-moment shape applied to experiment
    * analysis; driver state is 2 rows. */
  def cupedLift(s: SparkSession, events: DataFrame): DataFrame = {
    val cut = lit(CupedCutoff).cast("timestamp")
    val cents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    val perUser = events
      .select(col("user_id"), col("ts"), cents.as("c"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < cut, col("c")).otherwise(0L)).as("x"),
        sum(when(col("ts") >= cut, col("c")).otherwise(0L)).as("y"))
      .withColumn("arm",
        when(graft.functions.TextFunctions.h60(col("user_id").cast("string"))
          >= lit(1L << 59), "B").otherwise("A"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def moments(df: org.apache.spark.sql.RelationalGroupedDataset) = df.agg(
      count(lit(1)).as("n"),
      sum(dec(col("x"))).cast("decimal(38,0)").as("sx"),
      sum(dec(col("y"))).cast("decimal(38,0)").as("sy"),
      sum(dec(col("x")) * dec(col("x"))).cast("decimal(38,0)").as("sxx"),
      sum(dec(col("x")) * dec(col("y"))).cast("decimal(38,0)").as("sxy"),
      sum(dec(col("y")) * dec(col("y"))).cast("decimal(38,0)").as("syy"))
    val arms = moments(perUser.groupBy(col("arm")))
    val pooled = moments(perUser.groupBy())
      .select(col("n").as("np"), col("sx").as("psx"), col("sy").as("psy"),
        col("sxx").as("psxx"), col("sxy").as("psxy"), col("syy").as("psyy"))
    val d = (c: Column) => c.cast("double")
    val covN = d(col("np")) * d(col("psxy")) - d(col("psx")) * d(col("psy"))
    val varNx = d(col("np")) * d(col("psxx")) - d(col("psx")) * d(col("psx"))
    val varNy = d(col("np")) * d(col("psyy")) - d(col("psy")) * d(col("psy"))
    val theta = covN / varNx
    arms.crossJoin(broadcast(pooled))
      .select(col("arm"), col("n").as("n_users"),
        (d(col("sy")) / d(col("n")) / lit(100.0)).as("mean_post"),
        ((d(col("sy")) / d(col("n")) -
          theta * (d(col("sx")) / d(col("n")) - d(col("psx")) / d(col("np"))))
          / lit(100.0)).as("mean_post_adj"),
        theta.as("theta"),
        (lit(1.0) - covN * covN / (varNx * varNy)).as("var_ratio"))
      .orderBy(col("arm"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q270_ratio_delta" -> ((s, d) => ratioDelta(s, Tables.events(s, d))),
    "q272_two_proportion" -> ((s, d) => twoProportion(s, Tables.events(s, d))),
    "q267_srm_check" -> ((s, d) => srmCheck(s, Tables.events(s, d))),
    "q268_mde_report" -> ((s, d) => mdeReport(s, Tables.events(s, d))),
    "q266_mann_kendall" -> ((s, d) => mannKendall(s, Tables.events(s, d))),
    "q264_cuped" -> ((s, d) => cupedLift(s, Tables.events(s, d))),
    "q236_sprt" -> ((s, d) => sprtReplay(s, Tables.events(s, d))),
    "q246_day_quantiles" -> ((s, d) => dayQuantiles(s, Tables.events(s, d))),
    "q248_topk_churn" -> ((s, d) => topkChurn(s, Tables.events(s, d))),
    "q223_changepoint" -> ((s, d) => changepoint(s, Tables.events(s, d))),
    "q233_segmented_ols" -> ((s, d) => segmentedRegression(s, Tables.events(s, d))),
    "q224_theil_sen" -> ((s, d) => theilSen(s, Tables.events(s, d))),
    "q216_seasonal_decompose" -> ((s, d) => seasonalDecompose(s, Tables.events(s, d))),
    "q201_acf" -> ((s, d) => acfDaily(s, Tables.events(s, d))),
    "q199_km_survival" -> ((s, d) => kmSurvival(Tables.events(s, d))),
    "q143_gap_fill" -> ((s, d) => gapFill(Tables.events(s, d))),
    "q138_burst_detect" -> ((s, d) => burstDetect(Tables.events(s, d))),
    "q128_sessionize" -> ((s, d) => sessionize(Tables.events(s, d))),
    "q130_ols_trend" -> ((s, d) => olsTrend(Tables.documents(s, d))),
    "q50_salted_join" -> (saltedSupplierJoin _),
    "q48_sample" -> ((s, d) => deterministicSample(Tables.documents(s, d))),
    "q44_label_centroids" -> ((s, d) => labelCentroids(Tables.embeddings(s, d))),
    "q45_event_funnel" -> ((s, d) => funnel(Tables.events(s, d))),
    "q46_profile" -> ((s, d) => profileLineitem(Tables.lineitem(s, d))),
    "q90_range_join_binned" -> (q90RangeJoinBinned _),
    "q91_sliding_distinct" -> (q91SlidingDistinct _),
    "q98_retention" -> (q98Retention _)
  )

  /** Zero-filled daily-series CTE chain (cnt/grid/series), the DuckDB twin
    * of [[dailySeries]] — shared by the q223/q224 oracles verbatim. */
  private val SeriesCtes =
    s"""cnt AS (
       |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |grid AS (
       |  SELECT unnest(generate_series((SELECT min(day) FROM cnt),
       |    (SELECT max(day) FROM cnt))) AS day),
       |series AS (
       |  SELECT g.day, CAST(COALESCE(cnt.c, 0) AS BIGINT) AS c
       |  FROM grid g LEFT JOIN cnt ON cnt.day = g.day)""".stripMargin

  /** q223's level-1 cut CTE chain (series → prefix → argmax split),
    * shared verbatim with the q233 oracle so the split the regression
    * conditions on is character-identical to the one q223 reports. */
  private val CutCtes =
    s"""$SeriesCtes,
       |tot AS (
       |  SELECT CAST(min(day) AS BIGINT) AS d0, CAST(count(*) AS BIGINT) AS t,
       |    CAST(sum(c) AS BIGINT) AS s_tot
       |  FROM series),
       |pre AS (
       |  SELECT day, c, sum(c) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
       |    d0, t, s_tot, day - d0 + 1 AS pos
       |  FROM series CROSS JOIN tot),
       |c1 AS (
       |  SELECT day, pos, d0, t, s_tot, pos AS n1, t - pos AS n2,
       |    s AS s1, s_tot - s AS s2,
       |    CAST(CAST(s AS HUGEINT) * (t - pos)
       |       - CAST(s_tot - s AS HUGEINT) * pos AS DOUBLE)
       |    * CAST(CAST(s AS HUGEINT) * (t - pos)
       |       - CAST(s_tot - s AS HUGEINT) * pos AS DOUBLE)
       |      / CAST(CAST(pos AS HUGEINT) * (t - pos) * t AS DOUBLE) AS gain
       |  FROM pre WHERE pos < t),
       |s1r AS (SELECT *, row_number() OVER (ORDER BY gain DESC, day) AS rk FROM c1),
       |cut AS (SELECT pos AS cut_pos, s1 AS cut_s FROM s1r WHERE rk = 1)""".stripMargin

  /** q248's (d, weight) literal rows, rendered once and shared by the
    * engine frame and the oracle VALUES list (shortest-roundtrip double
    * printing keeps them bit-identical). */
  private def rboWeights(k: Int, p: Double): Seq[(Int, Double)] =
    (1 to k).map(d => (d, math.pow(p, d - 1)))

  def oracles: Map[String, String] = Map(
    // integer conversion facts, one mirrored rate/z chain — no pin needed
    "q272_two_proportion" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN 1 ELSE 0 END) AS conv,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) >= 576460752303423488 THEN 1 ELSE 0 END AS b
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT CAST(sum(1 - b) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN b = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN b = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
        |  FROM pu)
        |SELECT n_a, n_b, c_a, c_b,
        |  CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        |  CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        |  (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |    - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |  / sqrt(
        |      ((CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE))
        |        / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
        |      * (1.0 - (CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE))
        |          / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
        |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |  AS z
        |FROM m""".stripMargin,
    // exact-cents user moments, mirrored delta-method chain, driver-printed z
    "q270_ratio_delta" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         |    CAST(count(*) AS BIGINT) AS k,
         |    CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) >= 576460752303423488 THEN 'B' ELSE 'A' END AS arm
         |  FROM events GROUP BY user_id),
         |m AS (
         |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(s AS HUGEINT)) AS ss, sum(CAST(k AS HUGEINT)) AS sk,
         |    sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS sss,
         |    sum(CAST(k AS HUGEINT) * CAST(k AS HUGEINT)) AS skk,
         |    sum(CAST(s AS HUGEINT) * CAST(k AS HUGEINT)) AS ssk
         |  FROM pu GROUP BY arm),
         |c AS (
         |  SELECT arm, n,
         |    CAST(ss AS DOUBLE) / CAST(sk AS DOUBLE) AS r,
         |    (CAST(n AS DOUBLE) * CAST(sss AS DOUBLE)
         |      - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
         |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_s,
         |    (CAST(n AS DOUBLE) * CAST(skk AS DOUBLE)
         |      - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))
         |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_k,
         |    (CAST(n AS DOUBLE) * CAST(ssk AS DOUBLE)
         |      - CAST(ss AS DOUBLE) * CAST(sk AS DOUBLE))
         |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS cov_sk,
         |    CAST(sk AS DOUBLE) / CAST(n AS DOUBLE) AS mean_k
         |  FROM m),
         |e AS (
         |  SELECT arm, n, r,
         |    sqrt((var_s - 2.0 * r * cov_sk + r * r * var_k)
         |         / (CAST(n AS DOUBLE) * mean_k * mean_k)) AS se
         |  FROM c)
         |SELECT arm, n AS n_users, r / 100.0 AS ratio, se / 100.0 AS se,
         |  (r - ${Pin.sqlDouble(DeltaZ)} * se) / 100.0 AS ci_lo,
         |  (r + ${Pin.sqlDouble(DeltaZ)} * se) / 100.0 AS ci_hi
         |FROM e ORDER BY arm""".stripMargin,
    // integer arm counts, two IEEE ops, driver-printed chi2 critical value
    "q267_srm_check" ->
      s"""WITH u AS (
         |  SELECT DISTINCT user_id,
         |    CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) >= 576460752303423488 THEN 1 ELSE 0 END AS b
         |  FROM events),
         |c AS (
         |  SELECT CAST(sum(1 - b) AS BIGINT) AS n_a,
         |    CAST(sum(b) AS BIGINT) AS n_b
         |  FROM u)
         |SELECT n_a + n_b AS n_users, n_a, n_b,
         |  (CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
         |    * (CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
         |    / CAST(n_a + n_b AS DOUBLE) AS chi2,
         |  (CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
         |    * (CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
         |    / CAST(n_a + n_b AS DOUBLE) > ${Pin.sqlDouble(SrmChi2Crit)}
         |    AS srm_flag
         |FROM c""".stripMargin,
    // exact-cents integer moments, driver-printed z sum, division/sqrt
    // chains mirrored — no grid pin needed
    "q268_mde_report" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS x,
         |    CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) >= 576460752303423488 THEN 1 ELSE 0 END AS b
         |  FROM events GROUP BY user_id),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(1 - b) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
         |    sum(CAST(x AS HUGEINT)) AS sx,
         |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
         |  FROM pu)
         |SELECT n AS n_users, n_a, n_b,
         |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_metric,
         |  sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0
         |    AS sd_metric,
         |  ${Pin.sqlDouble(MdeZ)} *
         |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) *
         |    sqrt(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
         |    / 100.0 AS mde_abs,
         |  (${Pin.sqlDouble(MdeZ)} *
         |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) *
         |    sqrt(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
         |    / 100.0)
         |  / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0) AS mde_rel
         |FROM m""".stripMargin,
    // exact-cents daily sums, integer S and tie spectrum, one /18.0 and
    // one sqrt — no grid pin needed
    "q266_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT a.event_type,
        |    CAST(sum(CASE WHEN b.m > a.m THEN 1 WHEN b.m < a.m THEN -1
        |      ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND b.day > a.day
        |  GROUP BY a.event_type),
        |ties AS (
        |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
        |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |  FROM (SELECT event_type, m, CAST(count(*) AS BIGINT) AS t
        |        FROM daily GROUP BY event_type, m)
        |  GROUP BY event_type),
        |v AS (
        |  SELECT s.event_type, n_days, s_stat,
        |    CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
        |      AS DOUBLE) / 18.0 AS var_s
        |  FROM s JOIN ties ON s.event_type = ties.event_type)
        |SELECT event_type, n_days, s_stat, var_s,
        |  CASE WHEN var_s <= 0.0 THEN 0.0
        |       WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
        |       WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
        |       ELSE 0.0 END AS z
        |FROM v ORDER BY event_type""".stripMargin,
    // identical exact-cents moments (HUGEINT), identical double chains —
    // no transcendental anywhere, so no grid pin is needed
    "q264_cuped" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    CAST(sum(CASE WHEN ts < TIMESTAMP '$CupedCutoff'
         |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN ts >= TIMESTAMP '$CupedCutoff'
         |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS y,
         |    CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) >= 576460752303423488 THEN 'B' ELSE 'A' END AS arm
         |  FROM events GROUP BY user_id),
         |a AS (
         |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
         |  FROM u GROUP BY arm),
         |p AS (
         |  SELECT CAST(count(*) AS BIGINT) AS np,
         |    sum(CAST(x AS HUGEINT)) AS psx, sum(CAST(y AS HUGEINT)) AS psy,
         |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS psxx,
         |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS psxy,
         |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS psyy
         |  FROM u)
         |SELECT arm, n AS n_users,
         |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_post,
         |  (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) -
         |    ((CAST(np AS DOUBLE) * CAST(psxy AS DOUBLE)
         |       - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE)) /
         |     (CAST(np AS DOUBLE) * CAST(psxx AS DOUBLE)
         |       - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE)))
         |    * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
         |       - CAST(psx AS DOUBLE) / CAST(np AS DOUBLE)))
         |  / 100.0 AS mean_post_adj,
         |  (CAST(np AS DOUBLE) * CAST(psxy AS DOUBLE)
         |    - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE)) /
         |  (CAST(np AS DOUBLE) * CAST(psxx AS DOUBLE)
         |    - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE)) AS theta,
         |  1.0 - ((CAST(np AS DOUBLE) * CAST(psxy AS DOUBLE)
         |          - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE))
         |       * (CAST(np AS DOUBLE) * CAST(psxy AS DOUBLE)
         |          - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE)))
         |    / ((CAST(np AS DOUBLE) * CAST(psxx AS DOUBLE)
         |        - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE))
         |     * (CAST(np AS DOUBLE) * CAST(psyy AS DOUBLE)
         |        - CAST(psy AS DOUBLE) * CAST(psy AS DOUBLE))) AS var_ratio
         |FROM a CROSS JOIN p
         |ORDER BY arm""".stripMargin,
    "q246_day_quantiles" ->
      s"""WITH v AS (
         |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day, value, event_id
         |  FROM events),
         |r AS (
         |  SELECT day, value,
         |    row_number() OVER (PARTITION BY day ORDER BY value, event_id) AS rk,
         |    CAST(count(*) OVER (PARTITION BY day) AS BIGINT) AS n
         |  FROM v)
         |SELECT day, max(n) AS n,
         |  max(CASE WHEN rk = (n + 1) // 2 THEN value END) AS p50,
         |  max(CASE WHEN rk = (n * 19 + 19) // 20 THEN value END) AS p95
         |FROM r GROUP BY day ORDER BY day""".stripMargin,
    "q248_topk_churn" -> {
      val vals = rboWeights(RboK, RboP)
        .map { case (d, w) => s"($d, ${Pin.sqlDouble(w)})" }.mkString(", ")
      s"""WITH days AS (
         |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day, user_id
         |  FROM events),
         |cut AS (SELECT (min(day) + max(day) + 1) // 2 AS cut FROM days),
         |halves AS (
         |  SELECT CASE WHEN day < cut THEN 0 ELSE 1 END AS half, user_id,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM days CROSS JOIN cut
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT half, user_id,
         |    row_number() OVER (PARTITION BY half ORDER BY c DESC, user_id) AS rk
         |  FROM halves),
         |m AS (
         |  SELECT a.user_id, a.rk AS ra, b.rk AS rb
         |  FROM (SELECT * FROM top WHERE half = 0 AND rk <= $RboK) a
         |  JOIN (SELECT * FROM top WHERE half = 1 AND rk <= $RboK) b
         |    USING (user_id)),
         |g AS (SELECT * FROM (VALUES $vals) AS t(d, weight)),
         |ov AS (
         |  SELECT g.d, g.weight, CAST(count(m.user_id) AS BIGINT) AS x
         |  FROM g LEFT JOIN m ON greatest(m.ra, m.rb) <= g.d
         |  GROUP BY g.d, g.weight),
         |sz AS (
         |  SELECT
         |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
         |  FROM top WHERE rk <= $RboK),
         |ag AS (
         |  SELECT max(CASE WHEN d = $RboK THEN x END) AS overlap_at_k,
         |    sum(CAST(floor(weight * CAST(x AS DOUBLE) / CAST(d AS DOUBLE)
         |      * 1.0e15) AS BIGINT)) AS rsum
         |  FROM ov)
         |SELECT CAST($RboK AS INT) AS k, overlap_at_k,
         |  CAST(overlap_at_k AS DOUBLE)
         |    / CAST(na + nb - overlap_at_k AS DOUBLE) AS jaccard,
         |  ${Pin.sqlDouble(1.0 - RboP)} * (CAST(rsum AS DOUBLE) / 1.0e15) AS rbo
         |FROM ag CROSS JOIN sz""".stripMargin
    },
    "q236_sprt" ->
      s"""WITH fb AS (
         |  SELECT user_id, min(ts) AS first_ts FROM events
         |  WHERE event_type = 'purchase' GROUP BY user_id),
         |hh AS (
         |  SELECT first_ts,
         |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |      AS h
         |  FROM fb),
         |pd AS (
         |  SELECT epoch_us(first_ts) // ${86400L * 1000000L} AS day,
         |    CAST(sum(CASE WHEN h >= ${1L << 59} THEN 0 ELSE 1 END) AS BIGINT)
         |      AS ca,
         |    CAST(sum(CASE WHEN h >= ${1L << 59} THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cb
         |  FROM hh GROUP BY 1),
         |cum AS (
         |  SELECT day,
         |    CAST(sum(ca) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS conv_a_cum,
         |    CAST(sum(cb) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS conv_b_cum
         |  FROM pd)
         |SELECT day, conv_a_cum, conv_b_cum,
         |  CAST(conv_a_cum AS DOUBLE) * ${Pin.sqlDouble(SprtLn0)}
         |    + CAST(conv_b_cum AS DOUBLE) * ${Pin.sqlDouble(SprtLn1)} AS llr,
         |  (CAST(conv_a_cum AS DOUBLE) * ${Pin.sqlDouble(SprtLn0)}
         |    + CAST(conv_b_cum AS DOUBLE) * ${Pin.sqlDouble(SprtLn1)})
         |    >= ${Pin.sqlDouble(SprtLnBound)} AS crossed_up,
         |  (CAST(conv_a_cum AS DOUBLE) * ${Pin.sqlDouble(SprtLn0)}
         |    + CAST(conv_b_cum AS DOUBLE) * ${Pin.sqlDouble(SprtLn1)})
         |    <= ${Pin.sqlDouble(-SprtLnBound)} AS crossed_low
         |FROM cum ORDER BY day""".stripMargin,
    "q223_changepoint" ->
      s"""WITH $CutCtes,
         |lvl1 AS (
         |  SELECT CAST(1 AS BIGINT) AS level, d0 AS seg_start_day,
         |    d0 + t - 1 AS seg_end_day, day AS split_day,
         |    n1 AS n_left, n2 AS n_right,
         |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_left,
         |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean_right, gain
         |  FROM s1r WHERE rk = 1),
         |seg AS (
         |  SELECT pre.*, cut.cut_pos, cut.cut_s,
         |    CASE WHEN pos <= cut_pos THEN CAST(1 AS BIGINT)
         |         ELSE cut_pos + 1 END AS a,
         |    CASE WHEN pos <= cut_pos THEN cut_pos ELSE t END AS b,
         |    CASE WHEN pos <= cut_pos THEN CAST(0 AS BIGINT)
         |         ELSE cut_s END AS sa,
         |    CASE WHEN pos <= cut_pos THEN cut_s ELSE s_tot - cut_s END AS sb
         |  FROM pre CROSS JOIN cut),
         |c2 AS (
         |  SELECT day, d0, a, b, pos - a + 1 AS n1, b - pos AS n2,
         |    s - sa AS s1, sb - (s - sa) AS s2, b - a + 1 AS len
         |  FROM seg WHERE pos < b),
         |g2 AS (
         |  SELECT *,
         |    CAST(CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1 AS DOUBLE)
         |    * CAST(CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1 AS DOUBLE)
         |      / CAST(CAST(n1 AS HUGEINT) * n2 * len AS DOUBLE) AS gain
         |  FROM c2),
         |r2 AS (SELECT *, row_number() OVER (PARTITION BY a
         |    ORDER BY gain DESC, day) AS rk FROM g2),
         |lvl2 AS (
         |  SELECT CAST(2 AS BIGINT) AS level, d0 + a - 1 AS seg_start_day,
         |    d0 + b - 1 AS seg_end_day, day AS split_day,
         |    n1 AS n_left, n2 AS n_right,
         |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_left,
         |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean_right, gain
         |  FROM r2 WHERE rk = 1)
         |SELECT * FROM lvl1 UNION ALL SELECT * FROM lvl2
         |ORDER BY level, seg_start_day""".stripMargin,
    "q233_segmented_ols" ->
      s"""WITH $CutCtes,
         |seg AS (
         |  SELECT CASE WHEN pos <= cut_pos THEN CAST(1 AS BIGINT)
         |              ELSE CAST(2 AS BIGINT) END AS segment,
         |    day, pos, c
         |  FROM pre CROSS JOIN cut),
         |m AS (
         |  SELECT segment, CAST(count(*) AS BIGINT) AS n,
         |    CAST(min(day) AS BIGINT) AS day_start,
         |    CAST(max(day) AS BIGINT) AS day_end,
         |    CAST(sum(pos) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
         |    sum(CAST(pos AS HUGEINT) * CAST(c AS HUGEINT)) AS sxy,
         |    sum(CAST(pos AS HUGEINT) * CAST(pos AS HUGEINT)) AS sxx
         |  FROM seg GROUP BY segment),
         |k AS (
         |  SELECT segment, n, day_start, day_end, sx, sy,
         |    CASE WHEN n > 1 THEN
         |      CAST(CAST(n AS HUGEINT) * sxy
         |         - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) /
         |      CAST(CAST(n AS HUGEINT) * sxx
         |         - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE)
         |    END AS slope
         |  FROM m)
         |SELECT segment, day_start, day_end, n AS n_days, slope,
         |  CASE WHEN n > 1 THEN
         |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
         |  END AS intercept
         |FROM k ORDER BY segment""".stripMargin,
    "q224_theil_sen" ->
      s"""WITH $SeriesCtes,
         |t0 AS (
         |  SELECT CAST(min(day) AS BIGINT) AS d0,
         |    CAST(count(*) AS BIGINT) AS t_days
         |  FROM series),
         |xy AS (
         |  SELECT day - d0 + 1 AS x, c AS y, t_days
         |  FROM series CROSS JOIN t0),
         |pairs AS (
         |  SELECT p1.x AS x1, p2.x AS x2,
         |    CAST(p2.y - p1.y AS DOUBLE) / CAST(p2.x - p1.x AS DOUBLE) AS slope
         |  FROM xy p1 JOIN xy p2 ON p2.x > p1.x),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs),
         |rkd AS (
         |  SELECT slope, x1, x2,
         |    row_number() OVER (ORDER BY slope, x1, x2) AS rk
         |  FROM pairs),
         |sm AS (
         |  SELECT sum(slope) / CAST(count(*) AS DOUBLE) AS slope,
         |    max(n_pairs) AS n_pairs
         |  FROM rkd CROSS JOIN np
         |  WHERE rk = (n_pairs + 1) // 2 OR rk = (n_pairs + 2) // 2),
         |res AS (
         |  SELECT x, t_days, slope, n_pairs,
         |    CAST(y AS DOUBLE) - slope * CAST(x AS DOUBLE) AS r
         |  FROM xy CROSS JOIN sm),
         |rr AS (SELECT *, row_number() OVER (ORDER BY r, x) AS rk FROM res)
         |SELECT max(t_days) AS n_days, max(n_pairs) AS n_pairs,
         |  max(slope) AS slope_per_day,
         |  sum(r) / CAST(count(*) AS DOUBLE) AS intercept
         |FROM rr WHERE rk = (t_days + 1) // 2 OR rk = (t_days + 2) // 2""".stripMargin,
    "q216_seasonal_decompose" ->
      s"""WITH cnt AS (
         |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |grid AS (
         |  SELECT unnest(generate_series((SELECT min(day) FROM cnt),
         |    (SELECT max(day) FROM cnt))) AS day),
         |series AS (
         |  SELECT grid.day, CAST(COALESCE(cnt.c, 0) AS BIGINT) AS c
         |  FROM grid LEFT JOIN cnt ON cnt.day = grid.day),
         |det AS (
         |  SELECT day % $SeasonPeriod AS phase, c,
         |    CAST($SeasonPeriod AS BIGINT) * c
         |      - sum(c) OVER (ORDER BY day
         |          ROWS BETWEEN ${SeasonPeriod / 2} PRECEDING
         |          AND ${SeasonPeriod / 2} FOLLOWING) AS d7,
         |    count(*) OVER (ORDER BY day
         |        ROWS BETWEEN ${SeasonPeriod / 2} PRECEDING
         |        AND ${SeasonPeriod / 2} FOLLOWING) AS nw
         |  FROM series)
         |SELECT phase, CAST(count(*) AS BIGINT) AS n_days,
         |  CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_count,
         |  CAST(sum(d7) AS DOUBLE)
         |    / (CAST($SeasonPeriod AS DOUBLE) * CAST(count(*) AS DOUBLE)) AS seasonal
         |FROM det WHERE nw = $SeasonPeriod
         |GROUP BY phase ORDER BY phase""".stripMargin,
    "q201_acf" ->
      s"""WITH cnt AS (
         |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |grid AS (
         |  SELECT unnest(generate_series((SELECT min(day) FROM cnt),
         |    (SELECT max(day) FROM cnt))) AS day),
         |series AS (
         |  SELECT g.day, COALESCE(cnt.c, 0) AS c
         |  FROM grid g LEFT JOIN cnt ON cnt.day = g.day),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS t_days,
         |    CAST(sum(c) AS BIGINT) AS s_tot
         |  FROM series),
         |z AS (
         |  SELECT day, t_days * c - s_tot AS z
         |  FROM series CROSS JOIN tot),
         |den AS (
         |  SELECT sum(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS den FROM z),
         |lg AS (SELECT unnest(generate_series(1, ${AcfMaxLag})) AS lag),
         |num AS (
         |  SELECT lg.lag, CAST(count(*) AS BIGINT) AS n_pairs,
         |    sum(CAST(x.z AS HUGEINT) * CAST(y.z AS HUGEINT)) AS num
         |  FROM z x CROSS JOIN lg
         |  JOIN z y ON y.day = x.day + lg.lag
         |  GROUP BY lg.lag)
         |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
         |  CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE) AS acf
         |FROM num CROSS JOIN den ORDER BY lag""".stripMargin,
    "q199_km_survival" ->
      s"""WITH pu AS (
         |  SELECT user_id, epoch_us(min(ts)) AS first_us,
         |    epoch_us(min(CASE WHEN event_type = '$ConvEventType' THEN ts END))
         |      AS conv_us,
         |    epoch_us(max(ts)) AS last_us
         |  FROM events GROUP BY user_id),
         |gm AS (SELECT max(last_us) AS gmax_us FROM pu),
         |lv AS (
         |  SELECT least($ConvHorizonH, (gm.gmax_us - first_us) // ${3600L * 1000000L})
         |      AS censor_h,
         |    (conv_us - first_us) // ${3600L * 1000000L} AS dur_h
         |  FROM pu CROSS JOIN gm),
         |lives AS (
         |  SELECT CASE WHEN dur_h IS NOT NULL AND dur_h <= censor_h
         |      THEN dur_h ELSE censor_h END AS life_h,
         |    CASE WHEN dur_h IS NOT NULL AND dur_h <= censor_h
         |      THEN 1 ELSE 0 END AS converted
         |  FROM lv),
         |nu AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM lives),
         |bl AS (
         |  SELECT life_h, CAST(count(*) AS BIGINT) AS n_all,
         |    CAST(sum(converted) AS BIGINT) AS d
         |  FROM lives GROUP BY life_h),
         |ar AS (
         |  SELECT life_h, n_all, d,
         |    CAST(nu.n_users - sum(n_all) OVER (ORDER BY life_h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + n_all
         |      AS BIGINT) AS n_risk
         |  FROM bl CROSS JOIN nu),
         |kw AS (
         |  SELECT life_h, n_risk, d,
         |    max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY life_h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zf,
         |    sum(CAST(CASE WHEN d > 0 AND d < n_risk
         |      THEN floor(ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
         |        * 1.0e9 + 0.5) / 1.0e9
         |      ELSE 0.0 END AS DECIMAL(25,15))) OVER (ORDER BY life_h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum
         |  FROM ar)
         |SELECT life_h, n_risk, d AS n_converted,
         |  floor((CASE WHEN zf = 1 THEN 0.0
         |    ELSE exp(CAST(lnsum AS DOUBLE)) END) * 1.0e9 + 0.5) / 1.0e9
         |    AS survival
         |FROM kw WHERE d > 0 ORDER BY life_h""".stripMargin,
    "q143_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS day_value
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
        |grid AS (
        |  SELECT user_id, CAST(r.d AS DATE) AS day
        |  FROM span, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS r(d))
        |SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day,
        |  coalesce(d.n_events, 0) AS n_events,
        |  last_value(d.day_value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS UNBOUNDED PRECEDING) AS ffill_value,
        |  CASE WHEN d.day IS NULL THEN CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS is_gap
        |FROM grid g LEFT JOIN daily d USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,
    "q138_burst_detect" ->
      s"""WITH pm AS (
        |  SELECT date_trunc('minute', ts) AS minute,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m,
        |    sum(CAST(c AS HUGEINT)) AS s,
        |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ss
        |  FROM pm),
        |j AS (
        |  SELECT pm.minute, pm.c,
        |    CAST(st.s AS DOUBLE) / CAST(st.m AS DOUBLE) AS mean,
        |    greatest(CAST(st.ss AS DOUBLE) / CAST(st.m AS DOUBLE)
        |      - (CAST(st.s AS DOUBLE) / CAST(st.m AS DOUBLE))
        |        * (CAST(st.s AS DOUBLE) / CAST(st.m AS DOUBLE)), 0.0) AS variance
        |  FROM pm CROSS JOIN st)
        |SELECT minute, c,
        |  (CAST(c AS DOUBLE) - mean) / sqrt(variance) AS z
        |FROM j WHERE variance > 0 ORDER BY z DESC, minute LIMIT $BurstTopN""".stripMargin,
    "q128_sessionize" ->
      s"""WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR epoch_us(ts) - prev_us > ${SessionGapMin * 60L * 1000000L}
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM o),
        |s AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
        |  (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "q130_ols_trend" ->
      """WITH m AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(doc_id AS HUGEINT)) AS sx,
        |    sum(CAST(n_chars AS HUGEINT)) AS sy,
        |    sum(CAST(doc_id AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS sxy,
        |    sum(CAST(doc_id AS HUGEINT) * CAST(doc_id AS HUGEINT)) AS sxx,
        |    sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS syy
        |  FROM documents GROUP BY source),
        |t AS (
        |  SELECT source, n,
        |    CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS denx,
        |    CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS deny,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM m)
        |SELECT source, n,
        |  num / denx AS slope,
        |  (syd - (num / denx) * sxd) / CAST(n AS DOUBLE) AS intercept,
        |  (num * num) / (denx * deny) AS r2
        |FROM t ORDER BY source""".stripMargin,
    "q90_range_join_binned" ->
      """SELECT p.event_id, p.user_id, p.ts,
        |  CAST(count(v.ts) AS BIGINT) AS n_views
        |FROM events p
        |LEFT JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        |  AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin,
    "q91_sliding_distinct" ->
      """WITH e AS (
        |  SELECT date_trunc('day', ts) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d FROM e)
        |SELECT days.d AS day_out,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS u7
        |FROM days JOIN e
        |  ON e.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
        |GROUP BY days.d ORDER BY day_out""".stripMargin,
    "q98_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id)
        |SELECT c.cohort_week,
        |  CAST(datediff('day', CAST(c.cohort_week AS DATE), CAST(uw.week AS DATE)) // 7
        |    AS INT) AS week_k,
        |  CAST(count(DISTINCT uw.user_id) AS BIGINT) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q50_salted_join" ->
      """SELECT l_orderkey, l_linenumber, s_name
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber, s_name""".stripMargin,
    "q48_sample" ->
      """SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS sample_key
        |FROM documents
        |ORDER BY sample_key, doc_id LIMIT 100""".stripMargin,
    "q44_label_centroids" ->
      """WITH u AS (
        |  SELECT label, CAST(r.i AS INT) AS dim_idx, embedding[r.i + 1] AS v
        |  FROM embeddings, unnest(range(0, len(embedding))) AS r(i))
        |SELECT label, dim_idx,
        |  CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1.0e12 + 0.5)
        |      AS DECIMAL(30,0))) AS DOUBLE) / 1.0e12 /
        |    CAST(COUNT(*) AS DOUBLE) AS centroid,
        |  COUNT(*) AS n
        |FROM u GROUP BY label, dim_idx
        |ORDER BY label, dim_idx""".stripMargin,
    "q45_event_funnel" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT user_id, ts AS purchase_ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT s.user_id, s.signup_ts,
        |  min(p.purchase_ts) AS first_purchase_ts,
        |  CAST((epoch_us(min(p.purchase_ts)) - epoch_us(s.signup_ts)) // 1000000
        |    AS BIGINT) AS seconds_to_convert
        |FROM s LEFT JOIN p
        |  ON s.user_id = p.user_id AND p.purchase_ts >= s.signup_ts
        |GROUP BY s.user_id, s.signup_ts
        |ORDER BY s.user_id""".stripMargin,
    "q46_profile" ->
      """SELECT
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity_nulls,
        |  CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS l_quantity_distinct,
        |  MIN(l_quantity) AS l_quantity_min, MAX(l_quantity) AS l_quantity_max,
        |  CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_extendedprice_nulls,
        |  CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS l_extendedprice_distinct,
        |  MIN(l_extendedprice) AS l_extendedprice_min, MAX(l_extendedprice) AS l_extendedprice_max,
        |  CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_discount_nulls,
        |  CAST(COUNT(DISTINCT l_discount) AS BIGINT) AS l_discount_distinct,
        |  MIN(l_discount) AS l_discount_min, MAX(l_discount) AS l_discount_max,
        |  CAST(SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_tax_nulls,
        |  CAST(COUNT(DISTINCT l_tax) AS BIGINT) AS l_tax_distinct,
        |  MIN(l_tax) AS l_tax_min, MAX(l_tax) AS l_tax_max
        |FROM lineitem""".stripMargin
  )
}
