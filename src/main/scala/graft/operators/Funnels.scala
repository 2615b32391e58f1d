package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-constrained sequential funnels — the ClickHouse
  * `windowFunnel` shape, deterministic first-match variant: for a
  * declared step sequence (e.g. view → click → purchase), each user's
  * step-i time is the EARLIEST event of step i that falls strictly
  * after their step-(i−1) time and within `windowUs` of it; `stage`
  * is the deepest step reached. First-match semantics make the result
  * a pure min-recurrence — exact integers, reproducible by any
  * engine, no sequential per-user scan.
  *
  * Scale: one filtered aggregate for step 1, then per later step one
  * user-keyed equi-join (events of that type only) + a conditional
  * min aggregate — all partial-agg shapes keyed on the user id. The
  * funnel depth is declared (small), so the chain is |steps|−1 joins,
  * never a per-user ordered traversal. */
object Funnels {

  /** Per-user funnel report: (user, t1..tN as epoch-µs, −1 where the
    * step was not reached, stage ∈ [1, N]). Users without the first
    * step are absent. */
  def windowFunnel(df: DataFrame, userCol: String, tsUsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "declare at least one step")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(windowUs > 0, "windowUs must be positive")
    var acc = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsUsCol)).as("t1"))
    for (i <- 1 until steps.size) {
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val cand = df.filter(col(typeCol) === steps(i))
        .select(col(userCol), col(tsUsCol).as("__ts"))
      val keys = (0 until i).map(j => col(s"t${j + 1}"))
      acc = acc.join(cand, Seq(userCol), "left")
        .groupBy((col(userCol) +: keys): _*)
        .agg(min(when(col(prev).isNotNull &&
            col("__ts") > col(prev) &&
            col("__ts") - col(prev) <= windowUs, col("__ts")))
          .as(cur))
    }
    val stage = (1 until steps.size).foldLeft(lit(1L)) { (s, i) =>
      s + when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L) }
    val tCols = (1 to steps.size).map(i =>
      coalesce(col(s"t$i"), lit(-1L)).as(s"t$i"))
    acc.select((col(userCol) +: tCols) :+ stage.as("stage"): _*)
  }

  /** STRICT-ORDER windowed funnel (the ClickHouse `strict_order` mode
    * next to [[windowFunnel]]'s loose first-match): the funnel only
    * advances when the steps are CONSECUTIVE events in the user's
    * stream — ANY intervening event (tracked or not) breaks the chain.
    * "view → click → purchase with nothing in between" measures flow
    * quality where the loose funnel measures eventual conversion.
    * Per user: `stage` = the longest step-prefix appearing as a
    * contiguous run within `windowUs` of its anchor, `t_anchor` = the
    * earliest anchor achieving it. Deterministic event order is
    * (ts, idCol).
    *
    * Scale: one user-keyed window with k−1 codegen'd lead() pairs —
    * row state only (the sessionize posture), no per-user arrays, one
    * shuffle; the per-user reduction is a partial-agg max(struct).
    * Output: (userCol, stage, t_anchor); users with no anchor event
    * don't appear. */
  def windowFunnelStrictOrder(df: DataFrame, userCol: String,
                              tsUsCol: String, idCol: String,
                              typeCol: String, steps: Seq[String],
                              windowUs: Long): DataFrame = {
    require(steps.size >= 2 && steps.size <= 8,
      "declare 2..8 steps (k−1 lead columns per extra step)")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(windowUs > 0, "windowUs must be positive")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__t"), col("__id"))
    var withLeads = df.select(col(userCol),
      col(tsUsCol).cast("long").as("__t"), col(idCol).as("__id"),
      col(typeCol).cast("string").as("__et"))
    for (j <- 1 until steps.size) {
      withLeads = withLeads
        .withColumn(s"__e$j", lead(col("__et"), j).over(w))
        .withColumn(s"__t$j", lead(col("__t"), j).over(w))
    }
    // chain(j) = the j following events are exactly steps(1..j) and
    // the j-th lands inside the window of the anchor
    val lvl = (1 until steps.size).foldLeft(lit(1L)) { (acc, j) =>
      val chainJ = (1 to j).map(i =>
        col(s"__e$i") === steps(i) &&
          col(s"__t$i") - col("__t") <= windowUs)
        .reduce(_ && _)
      acc + when(chainJ, 1L).otherwise(0L)
    }
    // `+ when(chain_j)` must not skip gaps: chain_j requires ALL
    // prefixes, so the sum is exactly the longest prefix length
    withLeads.filter(col("__et") === steps.head)
      .withColumn("__lvl", lvl)
      .groupBy(col(userCol))
      .agg(max(struct(col("__lvl"), (-col("__t")).as("__nt")))
        .as("__best"))
      .select(col(userCol), col("__best.__lvl").as("stage"),
        (-col("__best.__nt")).as("t_anchor"))
  }

  /** Last-touch conversion attribution: each conversion is credited to
    * the user's LATEST touch event STRICTLY before it and at most
    * `windowUs` old (NULL channel when no touch qualifies — "organic").
    * Ties are deterministic: among touches at the same microsecond the
    * highest `idCol` wins.
    *
    * Scale: the merge-as-of posture of [[AsOf.join]], not a range join —
    * touches and conversions union, shuffle ONCE on the user key, sort
    * by (ts, kind, id), and a last-non-null window carries the latest
    * touch struct onto each conversion. Conversions sort BEFORE touches
    * at equal ts (kind −1 < 0), which is exactly the strict-precedence
    * rule. One shuffle, one sort, zero fanout.
    *
    * Output: the conversion rows + `channel` (nullable). */
  def lastTouch(conversions: DataFrame, touches: DataFrame,
                userCol: String, tsUsCol: String, idCol: String,
                channelCol: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val payload = conversions.columns.toSeq.filterNot(_ == userCol)
    val tSide = touches.select(
      Seq(col(userCol), col(tsUsCol).cast("long").as("__t"),
        lit(0).as("__k"), col(idCol).cast("long").as("__oid"),
        col(channelCol).as("__ch")) ++
        payload.map(c => lit(null).cast(conversions.schema(c).dataType)
          .as(s"__c_$c")): _*)
    val cSide = conversions.select(
      Seq(col(userCol), col(tsUsCol).cast("long").as("__t"),
        lit(-1).as("__k"), col(idCol).cast("long").as("__oid"),
        lit(null).cast(touches.schema(channelCol).dataType).as("__ch")) ++
        payload.map(c => col(c).as(s"__c_$c")): _*)
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__t"), col("__k"), col("__oid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tSide.unionByName(cSide)
      .withColumn("__last", last(when(col("__k") === 0,
        struct(col("__t").as("t"), col("__ch").as("ch"))),
        ignoreNulls = true).over(w))
      .filter(col("__k") === -1)
      .select(col(userCol) +: payload.map(c => col(s"__c_$c").as(c)) :+
        when(col("__last").isNotNull &&
          col("__t") - col("__last.t") <= windowUs, col("__last.ch"))
          .as("channel"): _*)
  }

  /** Position-based (U-shaped) multi-touch attribution, exact-integer:
    * each conversion's credit (10^4 bp) splits over its qualifying
    * touch path — touches strictly before the conversion and at most
    * `windowUs` old, ordered by (ts, id). Split: one touch → 10000;
    * two → 5000/5000; k ≥ 3 → last 4000, middles 2000 div (k−2) each,
    * first 4000 plus the middle-division remainder (so every
    * conversion's credits sum to exactly 10000). Conversions with no
    * qualifying touch credit 10000 to `organic` — synthetic credit
    * rows, so `organic` reports `n_touches = 0`.
    *
    * Scale: one user-keyed equi-join conversions×touches filtered to
    * the window (fanout bounded by per-user touch activity inside
    * `windowUs`, never corpus-sized), windows partitioned by the
    * CONVERSION id (path-length partitions), then one channel-sized
    * partial agg. Output: (channel, n_conversions, n_touches,
    * credit_bp). */
  def positionalAttribution(conversions: DataFrame, touches: DataFrame,
                            userCol: String, tsUsCol: String,
                            idCol: String, channelCol: String,
                            windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val c = conversions.select(col(userCol).as("__u"),
      col(tsUsCol).cast("long").as("__ct"),
      col(idCol).cast("long").as("__cid"))
    val t = touches.select(col(userCol).as("__u"),
      col(tsUsCol).cast("long").as("__tt"),
      col(idCol).cast("long").as("__tid"),
      col(channelCol).as("__ch"))
    val qual = c.join(t, Seq("__u"))
      .filter(col("__tt") < col("__ct") &&
        col("__ct") - col("__tt") <= windowUs)
    val w = Window.partitionBy(col("__cid"))
    val ranked = qual
      .withColumn("__k", count(lit(1)).over(w))
      .withColumn("__rn",
        row_number().over(w.orderBy(col("__tt"), col("__tid"))))
    val mid = expr("2000L div (__k - 2)")
    val credit = when(col("__k") === 1, 10000L)
      .when(col("__k") === 2, 5000L)
      .when(col("__rn") === col("__k"), 4000L)
      .when(col("__rn") === 1, lit(4000L) + lit(2000L) -
        mid * (col("__k") - 2))
      .otherwise(mid)
    val credited = ranked.select(col("__cid"), col("__ch").as("channel"),
      credit.as("__credit"), lit(1L).as("__is_touch"))
    // organic rows are SYNTHETIC credit carriers (one per touchless
    // conversion), not touches — they must not inflate n_touches
    val organic = c.join(qual.select(col("__cid")).distinct(),
        Seq("__cid"), "left_anti")
      .select(col("__cid"), lit("organic").as("channel"),
        lit(10000L).as("__credit"), lit(0L).as("__is_touch"))
    credited.unionByName(organic)
      .groupBy(col("channel"))
      .agg(count_distinct(col("__cid")).as("n_conversions"),
        sum(col("__is_touch")).as("n_touches"),
        sum(col("__credit")).as("credit_bp"))
  }

  /** Time-decay multi-touch attribution, exact-integer: each
    * conversion's 10^4 bp of credit splits over its qualifying touch
    * path (strictly before the conversion, at most `windowUs` old)
    * proportionally to the half-life-decayed weight
    * `w = 10000 >> min(age div halfLifeUs, 13)` — a power-of-two decay
    * so every weight is an exact integer in [1, 10000] (the >= 13
    * half-lives floor keeps stale-but-qualifying touches at weight 1
    * instead of a zero-sum path). Shares floor-divide; the rounding
    * remainder goes to the LATEST touch (ts, id order), so every
    * conversion's credits sum to exactly 10000. Conversions with no
    * qualifying touch credit 10000 to `organic` — synthetic credit
    * rows, `n_touches = 0`.
    *
    * Scale: one user-keyed equi-join filtered to the window (fanout
    * bounded by per-user activity inside `windowUs`), two windows
    * partitioned by the CONVERSION id (path-length partitions), one
    * channel-sized partial agg. Output: (channel, n_conversions,
    * n_touches, credit_bp). */
  def timeDecayAttribution(conversions: DataFrame, touches: DataFrame,
                           userCol: String, tsUsCol: String,
                           idCol: String, channelCol: String,
                           windowUs: Long, halfLifeUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    require(halfLifeUs > 0, "halfLifeUs must be positive")
    val c = conversions.select(col(userCol).as("__u"),
      col(tsUsCol).cast("long").as("__ct"),
      col(idCol).cast("long").as("__cid"))
    val t = touches.select(col(userCol).as("__u"),
      col(tsUsCol).cast("long").as("__tt"),
      col(idCol).cast("long").as("__tid"),
      col(channelCol).as("__ch"))
    val qual = c.join(t, Seq("__u"))
      .filter(col("__tt") < col("__ct") &&
        col("__ct") - col("__tt") <= windowUs)
      .withColumn("__w", expr(
        s"shiftright(10000L, cast(least((__ct - __tt) div " +
          s"${halfLifeUs}L, 13L) as int))"))
    val w = Window.partitionBy(col("__cid"))
    val ranked = qual
      .withColumn("__sw", sum(col("__w")).over(w))
      .withColumn("__share", expr("(10000L * __w) div __sw"))
      .withColumn("__ssum", sum(col("__share")).over(w))
      .withColumn("__rn", row_number().over(
        w.orderBy(col("__tt").desc, col("__tid").desc)))
    val credited = ranked.select(col("__cid"), col("__ch").as("channel"),
      (col("__share") + when(col("__rn") === 1,
        lit(10000L) - col("__ssum")).otherwise(0L)).as("__credit"),
      lit(1L).as("__is_touch"))
    val organic = c.join(qual.select(col("__cid")).distinct(),
        Seq("__cid"), "left_anti")
      .select(col("__cid"), lit("organic").as("channel"),
        lit(10000L).as("__credit"), lit(0L).as("__is_touch"))
    credited.unionByName(organic)
      .groupBy(col("channel"))
      .agg(count_distinct(col("__cid")).as("n_conversions"),
        sum(col("__is_touch")).as("n_touches"),
        sum(col("__credit")).as("credit_bp"))
  }

  /** Exact rational for the driver-side Markov solve. */
  private case class Frac(n: BigInt, d: BigInt) {
    def +(o: Frac): Frac = Frac.norm(n * o.d + o.n * d, d * o.d)
    def -(o: Frac): Frac = Frac.norm(n * o.d - o.n * d, d * o.d)
    def *(o: Frac): Frac = Frac.norm(n * o.n, d * o.d)
    def /(o: Frac): Frac = Frac.norm(n * o.d, d * o.n)
    def isZero: Boolean = n == 0
  }
  private object Frac {
    val Zero = Frac(0, 1); val One = Frac(1, 1)
    def norm(n: BigInt, d: BigInt): Frac = {
      require(d != 0, "division by zero")
      val s = if (d < 0) -1 else 1
      val g = n.gcd(d); if (g == 0) Frac(0, 1)
      else Frac(s * n / g, s * d / g)
    }
  }

  /** Solve (I − T)·p = b over exact rationals (Gaussian elimination,
    * first-nonzero pivot; the matrix is states-sized, ≤ tens). */
  private def solve(tm: Array[Array[Frac]],
                    b: Array[Frac]): Array[Frac] = {
    val n = b.length
    val a = Array.tabulate(n, n) { (i, j) =>
      val id = if (i == j) Frac.One else Frac.Zero
      id - tm(i)(j)
    }
    val rhs = b.clone()
    for (c0 <- 0 until n) {
      val piv = (c0 until n).find(r => !a(r)(c0).isZero)
        .getOrElse(throw new IllegalStateException(
          "singular chain matrix")) // cannot happen: I−T is an
      // absorbing-chain fundamental matrix, always nonsingular
      val tmp = a(piv); a(piv) = a(c0); a(c0) = tmp
      val tb = rhs(piv); rhs(piv) = rhs(c0); rhs(c0) = tb
      val inv = Frac.One / a(c0)(c0)
      for (j <- c0 until n) a(c0)(j) = a(c0)(j) * inv
      rhs(c0) = rhs(c0) * inv
      for (r <- 0 until n if r != c0 && !a(r)(c0).isZero) {
        val f = a(r)(c0)
        for (j <- c0 until n) a(r)(j) = a(r)(j) - f * a(c0)(j)
        rhs(r) = rhs(r) - f * rhs(c0)
      }
    }
    rhs
  }

  /** Markov removal-effect attribution (Anderl et al. 2016, public
    * formulation): journeys become a first-order chain START →
    * channels → CONV/DROP; a channel's value is how much the absorbing
    * conversion probability falls when every transition INTO it is
    * redirected to DROP (no renormalization). Credits are the removal
    * effects normalized to 10^4 bp. All chain math runs in exact
    * BigInt rationals, floored once per reported bp value — bitwise
    * reproducible, but the matrix solve is not SQL-expressible →
    * rows-only (spec pins a hand-solvable chain).
    *
    * Scale: the cluster side is one per-user lead() window (partitions
    * = per-user journeys) collapsed to a (from, to) transition-count
    * aggregate — the ONLY collected artifact, (channels+2)²-sized
    * (budget-guarded), the sanctioned model-sized driver solve.
    * Output: (channel, removal_effect_bp, credit_bp). */
  def markovAttribution(touches: DataFrame, userCol: String,
                        tsUsCol: String, channelCol: String,
                        converters: DataFrame,
                        maxChannels: Int = 1000): DataFrame = {
    val spark = touches.sparkSession
    import spark.implicits._
    val conv = converters.select(col(userCol).as("__u")).distinct()
      .withColumn("__isConv", lit(1))
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__t"), col("__ch"))
    val seq0 = touches.select(col(userCol).as("__u"),
      col(tsUsCol).cast("long").as("__t"),
      col(channelCol).cast("string").as("__ch"))
    // budget gate BEFORE the transition collect: the collected matrix
    // is (channels+2)²-sized, so a high-cardinality channel column
    // (URLs) must fail fast cluster-side, not after a driver-sized
    // collect (the centroidClassify require-before-collect posture)
    val nCh = seq0.agg(count_distinct(col("__ch"))).first().getLong(0)
    require(nCh <= maxChannels,
      s"channel vocabulary $nCh exceeds the $maxChannels " +
        "driver-solve budget")
    val withNext = seq0
      .withColumn("__next", lead(col("__ch"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
    val starts = withNext.filter(col("__rn") === 1)
      .select(lit("__START__").as("__from"), col("__ch").as("__to"))
    val mids = withNext.filter(col("__next").isNotNull)
      .select(col("__ch").as("__from"), col("__next").as("__to"))
    val ends = withNext.filter(col("__next").isNull)
      .join(conv, Seq("__u"), "left")
      .select(col("__ch").as("__from"),
        when(col("__isConv") === 1, "__CONV__").otherwise("__DROP__")
          .as("__to"))
    val trans = starts.unionByName(mids).unionByName(ends)
      .groupBy(col("__from"), col("__to")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val channels = trans.flatMap(t => Seq(t._1, t._2))
      .filter(s => s != "__START__" && s != "__CONV__" && s != "__DROP__")
      .distinct.sorted // ⊆ the pre-checked __ch vocabulary
    val states = "__START__" +: channels // transient states
    val idx = states.zipWithIndex.toMap
    val outTotals = trans.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    def pConv(removed: Set[String]): Frac = {
      val n = states.length
      val tm = Array.fill(n, n)(Frac.Zero)
      val b = Array.fill(n)(Frac.Zero)
      for ((f, t, c) <- trans if idx.contains(f) && !removed(f)) {
        val p = Frac.norm(BigInt(c), BigInt(outTotals(f)))
        if (t == "__CONV__") b(idx(f)) = b(idx(f)) + p
        else if (idx.contains(t) && !removed(t))
          tm(idx(f))(idx(t)) = tm(idx(f))(idx(t)) + p
        // transitions into removed states / __DROP__ absorb at 0
      }
      solve(tm, b)(idx("__START__"))
    }
    // each conversion probability floors into 10^9 fixed point BEFORE
    // the removal-effect ratios (the Eval.cmhExactFp discipline): the
    // exact-rational ratios cross-multiply 4x4-determinant-sized
    // integers into ~10^100 products that overflow any 128-bit SQL
    // oracle at sf0.1+, while floors of each determinant ratio stay
    // inside HUGEINT on the oracle side and lose < 1e-9 per
    // probability (< 10^-5 of a basis point downstream). Floors are
    // monotone, so e_k = p0_fp - pk_fp stays >= 0 exactly like the
    // rational effect.
    val ProbScale = 1000000000L
    def fp(x: Frac): Long =
      if (x.isZero) 0L else ((x.n * ProbScale) / x.d).toLong
    val p0fp = fp(pConv(Set.empty))
    val effects = channels.map(c => c -> (p0fp - fp(pConv(Set(c)))))
    val total = effects.map(_._2).sum
    val rows = effects.map { case (c, e) =>
      val re = if (p0fp == 0L) 0L else 10000L * e / p0fp
      val cr = if (total == 0L) 0L else 10000L * e / total
      (c, re, cr)
    }.toSeq
    rows.toDF(channelCol, "removal_effect_bp", "credit_bp")
  }

  /** Shapley-value multi-touch attribution (Shapley 1953 applied to
    * journey coalitions, the order-independent complement to the
    * position/time-decay heuristics and the Markov removal effect):
    * the characteristic function is `v(S)` = conversions of journeys
    * whose DISTINCT touched-channel set ⊆ S, and each channel's credit
    * is its exact Shapley value under v. Computed entirely in integer /
    * BigInt arithmetic — `num_c = Σ_{S∌c} |S|!·(k−1−|S|)!·(v(S∪c)−v(S))`
    * with the k! denominator divided out ONCE per reported value — so
    * both `shapley_fp = ⌊scale·num_c / k!⌋` and
    * `credit_bp = ⌊10^4·num_c / (k!·v(C))⌋` are engine-exact (a DuckDB
    * oracle reproduces them from the same coalition counts).
    *
    * Scale: the cluster side is one distinct-(user, channel) aggregate
    * → per-converter sorted channel-set key → a set-count aggregate of
    * AT MOST 2^k rows (k ≤ `maxChannels`, REQUIREd cluster-side BEFORE
    * the collect, the markovAttribution posture); the driver holds the
    * 2^k coalition table and runs the O(k·2^k) subset-sum (zeta)
    * transform + Shapley fold — model-sized, never journey-sized.
    * Efficiency (Σ shapley = v(C) − v(∅)) is asserted exactly.
    *
    * Output: (channelCol, n_converters, shapley_fp, credit_bp), one
    * row per observed channel. */
  def shapleyAttribution(touches: DataFrame, userCol: String,
                         channelCol: String, converters: DataFrame,
                         scale: Long = 1000000L,
                         maxChannels: Int = 16): DataFrame = {
    val spark = touches.sparkSession
    import spark.implicits._
    require(maxChannels >= 1 && maxChannels <= 20,
      s"maxChannels $maxChannels outside the 2^k driver budget [1, 20]")
    val t = touches.select(col(userCol).as("__u"),
        col(channelCol).cast("string").as("__ch"))
      .filter(col("__u").isNotNull && col("__ch").isNotNull)
      .distinct()
    val nCh = t.agg(count_distinct(col("__ch"))).first().getLong(0)
    require(nCh <= maxChannels,
      s"channel vocabulary $nCh exceeds the $maxChannels " +
        "2^k coalition budget")
    // the channel universe is the FULL touch vocabulary, not just the
    // channels converters touched: a channel touched solely by
    // non-converters must still emit a (zero-credit) row, matching any
    // vocabulary-driven oracle. Collected only AFTER the cluster-side
    // REQUIRE above bounds it to ≤ maxChannels ≤ 20 strings.
    val vocab = t.select(col("__ch")).distinct().as[String].collect()
    val conv = converters.select(col(userCol).as("__u")).distinct()
    // ≤ 2^k coalition rows: (sorted distinct channel set, converters)
    val setCounts = t.join(conv, Seq("__u"))
      .groupBy(col("__u"))
      .agg(sort_array(collect_set(col("__ch"))).as("__set"))
      .groupBy(col("__set")).agg(count(lit(1)).as("__n"))
      .as[(Seq[String], Long)].collect()

    val channels = vocab.toSeq.sorted
    val k = channels.length
    if (k == 0)
      return Seq.empty[(String, Long, Long, Long)]
        .toDF(channelCol, "n_converters", "shapley_fp", "credit_bp")
    val bit = channels.zipWithIndex.toMap
    val v = Array.fill(1 << k)(BigInt(0))
    for ((set, n) <- setCounts)
      v(set.map(bit).foldLeft(0)((m, b) => m | (1 << b))) += n
    // zeta transform: v(S) = Σ_{T ⊆ S} count(T)
    for (i <- 0 until k; s <- 0 until (1 << k); if (s & (1 << i)) != 0)
      v(s) += v(s ^ (1 << i))
    val fact = new Array[BigInt](k + 1)
    fact(0) = BigInt(1)
    for (i <- 1 to k) fact(i) = fact(i - 1) * i
    val kFact = fact(k)
    val vFull = v((1 << k) - 1)
    val nums = channels.indices.map { i =>
      var num = BigInt(0)
      for (s <- 0 until (1 << k); if (s & (1 << i)) == 0) {
        val w = fact(Integer.bitCount(s)) * fact(k - 1 - Integer.bitCount(s))
        num += w * (v(s | (1 << i)) - v(s))
      }
      num
    }
    // efficiency: Σ_c num_c = k!·(v(C) − v(∅)); v(∅) = 0 by construction
    require(nums.sum == kFact * vFull,
      "Shapley efficiency violated — coalition table inconsistent")
    // ONE job for every per-channel converter tally (k separate
    // count() jobs would pay the job-scheduling floor k times)
    val nByCh = t.join(conv, Seq("__u"))
      .groupBy(col("__ch")).agg(count(lit(1)).as("__n"))
      .as[(String, Long)].collect().toMap
    val rows = channels.indices.map { i =>
      val credit = if (vFull == 0) 0L
        else ((nums(i) * 10000) / (kFact * vFull)).toLong
      (channels(i), nByCh.getOrElse(channels(i), 0L),
        ((nums(i) * scale) / kFact).toLong, credit)
    }
    rows.toDF(channelCol, "n_converters", "shapley_fp", "credit_bp")
  }
}
