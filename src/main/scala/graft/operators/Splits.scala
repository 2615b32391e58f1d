package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * The assignment hash is md5-based (not xxhash/murmur) so any engine —
  * and any future re-run — reproduces the exact same split from the id
  * alone: no sampling state, no order dependence, stable under
  * repartitioning and incremental appends.
  */
object Splits {

  /** Uniform bucket in [0, buckets) from the row id. Native codegen
    * kernel, bit-identical to the portable recipe
    * `conv(substring(md5(x),1,8),16,10) % buckets` every oracle
    * reproduces (the kernel skips the hex-string round-trip; parity is
    * re-proven by every md5-bucketed oracle query each round). */
  def bucket(id: Column, buckets: Int = 100): Column =
    graft.functions.NativeExprs.portableBucket(id.cast("string"),
      buckets.toLong)

  /** Deterministic per-stratum sampling: keep ~pct% of rows in every
    * group, chosen by id-hash bucket — reproducible, shuffle-free, and
    * append-stable (new rows don't change old rows' membership). */
  def stratifiedSample(id: Column, pct: Int): Column =
    bucket(id, 100) < pct

  /** Named split by cumulative percentage boundaries, e.g.
    * splits = Seq("train" -> 80, "val" -> 10, "test" -> 10). */
  def assign(id: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = bucket(id, 100)
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    splits.init.zip(bounds.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), hi)) =>
        Some(acc.fold(when(b < hi, name))(_.when(b < hi, name)))
      }
      .map(_.otherwise(splits.last._1))
      .getOrElse(lit(splits.last._1))
  }

  /** Leakage-safe dataset split: every row of a GROUP (source domain,
    * user, near-dup cluster id) lands in the SAME split — closing the
    * contamination vector a row-hash split leaves open, where
    * near-identical rows from one source straddle train and eval. The
    * assignment is the portable md5 bucket of the (seeded) group key,
    * so it is engine-reproducible and append-stable: new rows of a
    * known group inherit its split, new groups land by hash, and no
    * shuffle or state is involved — pure per-row scan work.
    * Proportions hold in expectation over GROUPS; size-weighted
    * deviation is the price of zero leakage (report it from the
    * output, never re-balance by rows — that would reopen the leak). */
  def splitByGroup(df: DataFrame, groupCol: String,
                   splits: Seq[(String, Int)],
                   seed: String = ""): DataFrame =
    df.withColumn("split",
      assign(concat(col(groupCol).cast("string"), lit("|" + seed)),
        splits))

  /** Group-aware k-fold cross-validation assignment: every row of a
    * group lands in the SAME fold (the k-fold twin of [[splitByGroup]]
    * — fold boundaries that cut a user/domain/near-dup cluster leak
    * exactly like a bad train/test split). `fold ∈ [0, k)` is the
    * portable md5 bucket of the seeded group key taken mod k, so folds
    * are engine-reproducible, append-stable, and shuffle-free (pure
    * per-row scan work); fold sizes balance in expectation over
    * GROUPS. Train membership for fold i is simply `fold =!= i` —
    * no materialized k-times blowup. */
  def kfoldByGroup(df: DataFrame, groupCol: String, k: Int,
                   seed: String = ""): DataFrame = {
    require(k >= 2, "kfoldByGroup: k must be >= 2")
    df.withColumn("fold",
      bucket(concat(col(groupCol).cast("string"), lit("|" + seed)),
        k).cast("long"))
  }

  /** Downsample a corpus to a target domain mix (e.g. re-weighting web
    * sources before training). `weights` maps group value → relative
    * target share. Keeps the LARGEST total N such that every group can
    * supply its share, then keeps exactly `(N * w_g) div ΣW` rows per
    * group — the rows with the smallest id-hash, so the sample is
    * deterministic and append-stable per group.
    *
    * All arithmetic is integer (floor divisions), so the kept set is
    * exactly reproducible by any engine. One count aggregate (broadcast
    * back), then [[Selection.hashRankFilter]] resolves the per-group
    * rank cutoff on bucket counts — no full-group window sort, so a
    * domain that IS most of the corpus still ranks in ~|group|/1e6-row
    * tasks.
    */
  def weightedMix(df: DataFrame, groupCol: String, idCol: String,
                  weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val totalW = weights.values.sum
    val wTbl = df.sparkSession.createDataFrame(
      weights.toSeq.map(kv => (kv._1, kv._2))).toDF(groupCol, "__w")

    // Max feasible N: min over WEIGHTED groups of (count_g * ΣW) div w_g.
    // Left join from the weights: a weighted group absent from the data
    // has count 0 → N = 0 → empty result, honoring "every group can
    // supply its share" instead of silently returning a wrong mix.
    // (Unweighted data groups are dropped by the final inner join.)
    val counts = wTbl.join(
        df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt")),
        Seq(groupCol), "left")
      .withColumn("__cnt", coalesce(col("__cnt"), lit(0L)))
    val n = counts
      .agg(min(expr(s"(__cnt * ${totalW}L) div __w")).as("n"))
      .head.getLong(0) // counts is never empty: weights is non-empty
    val keep = wTbl.withColumn("__keep", expr(s"(${n}L * __w) div ${totalW}L"))

    Selection.hashRankFilter(
        df.join(broadcast(keep), Seq(groupCol)),
        groupCol, idCol, bucket(col(idCol), 1000000), "__keep")
      .drop("__w", "__keep", "__rank")
  }

  /** Near-dup-aware leakage-safe split: [[splitByGroup]] where the
    * group is the document's near-duplicate CLUSTER, so two almost-
    * identical documents can never straddle train and eval — the
    * contamination vector that survives even a group split when the
    * same text re-appears under different sources/users. `clusters` is
    * the (idCol, cluster_id) output of [[Dedup.nearDupClusters]] (or
    * any clustering); unclustered docs form singleton groups keyed by
    * their own id (prefixed, so a doc id can never collide with a
    * cluster id). One uniform id-keyed join, then pure per-row hash
    * work — the split inherits splitByGroup's append stability, and
    * adding a NEW member to a known cluster lands it in the cluster's
    * existing split. */
  def dedupSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                     splits: Seq[(String, Int)],
                     seed: String = ""): DataFrame = {
    val c = clusters.select(col(idCol), col("cluster_id").as("__cl"))
    val grouped = df.join(c, Seq(idCol), "left")
      .withColumn("__split_grp",
        when(col("__cl").isNotNull,
          concat(lit("c|"), col("__cl").cast("string")))
          .otherwise(concat(lit("d|"), col(idCol).cast("string"))))
    splitByGroup(grouped, "__split_grp", splits, seed)
      .drop("__split_grp", "__cl")
  }

  /** Temporal train/test split with a purge embargo (the time-series /
    * financial-ML split discipline, López de Prado 2018 ch.7): the
    * earliest `trainBp`/10000 of rows by event time are `train`, rows
    * inside the `embargoUs` window after the cut are `embargo`
    * (excluded — features computed over trailing windows straddle the
    * boundary and leak the future into training), and later rows are
    * `test`. The cut is the EXACT value at rank
    * `greatest(1, n·trainBp div 10000)` of the ascending time order —
    * tie-invariant, so any engine reproduces the label from the
    * timestamp alone. `tsUsCol` must be an integral epoch column
    * (e.g. `unix_micros`), `embargoUs` in the same unit.
    *
    * Scale: the cut resolves through [[Selection.valueAtRanks]]'s
    * bucket histograms (no global sort, no window); labeling is pure
    * per-row scan work against the collected 1-row cut. NOT
    * append-stable by construction (the rank moves with n): pin the
    * returned boundary via [[temporalSplitAt]] for incremental use. */
  def temporalSplit(df: DataFrame, tsUsCol: String, trainBp: Int,
                    embargoUs: Long): DataFrame = {
    require(trainBp >= 1 && trainBp <= 9999,
      "trainBp must be in [1, 9999]")
    val cutRows = Selection.valueAtRanks(
        df.withColumn("__one", lit(1)), "__one", tsUsCol,
        Seq("cut" -> s"greatest(1L, (__n * ${trainBp}L) div 10000L)"))
      .collect()
    require(cutRows.nonEmpty, "temporalSplit: empty input")
    temporalSplitAt(df, tsUsCol, cutRows.head.getLong(2), embargoUs)
  }

  /** [[temporalSplit]] at an EXPLICIT cut — the append-stable variant:
    * new rows label purely by their own timestamp against the pinned
    * boundary, so an incremental pipeline re-labels nothing. */
  def temporalSplitAt(df: DataFrame, tsUsCol: String, cutUs: Long,
                      embargoUs: Long): DataFrame = {
    require(embargoUs >= 0, "embargoUs must be non-negative")
    df.withColumn("split",
      when(col(tsUsCol) <= cutUs, "train")
        .when(col(tsUsCol) > cutUs + embargoUs, "test")
        .otherwise("embargo"))
  }

  /** Token-budget mixture allocation: the planning step of data mixing
    * — given a total token `budget` and relative target `weights` per
    * group (domain, source, language), decide how many tokens each
    * group CONTRIBUTES, exactly. Targets are `(budget·w_g) div ΣW`
    * with the leftover `budget − Σ targets` distributed one token at a
    * time to the groups with the largest remainders (largest-remainder
    * / Hamilton apportionment — deterministic, ties broken by group
    * name), so Σ target_tokens == budget EXACTLY whenever every
    * weighted group is present. Allocations are capped by what the
    * group actually has (`alloc_tokens = min(target, avail)`), with
    * the deficit reported as `shortfall` rather than silently
    * re-balanced — re-weighting a short corpus is a POLICY decision
    * (epochs/upsampling), not something an allocator should hide.
    *
    * All arithmetic is 64-bit integer (`div`/`%`), so the plan is
    * engine-reproducible and hash-checkable. Plan shape: one partial
    * aggregate over the fact table, then windows over the |groups|-row
    * summary frame — the single-partition window holds GROUPS, never
    * rows (the accepted grid-window pattern, PLANS.md). Downstream,
    * [[weightedMix]]/[[acceptByWeight]] realize the plan row-wise.
    *
    * Output: (groupCol, avail_tokens, target_tokens, alloc_tokens,
    * shortfall) — weighted groups present in the data only. */
  def mixtureAllocate(df: DataFrame, groupCol: String, tokenCol: String,
                      budget: Long, weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    allocateFromAvail(
      df.groupBy(col(groupCol))
        .agg(sum(col(tokenCol)).cast("long").as("avail_tokens")),
      groupCol, budget, weights)
  }

  /** Largest-remainder apportionment over an already-aggregated
    * (group, avail_tokens) summary — [[mixtureAllocate]]'s arithmetic
    * half, shared with [[curriculumSchedule]] (which allocates every
    * phase off ONE corpus scan). Zero weights are allowed here — a
    * phase may switch a group off — as long as the total is positive. */
  private[graft] def allocateFromAvail(avail: DataFrame, groupCol: String,
                                       budget: Long,
                                       weights: Map[String, Long]): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0,
      "weights must be non-negative with a positive total")
    val totalW = weights.values.sum
    require(budget <= Long.MaxValue / totalW,
      "budget * totalW must fit in 64 bits")
    val w = org.apache.spark.sql.expressions.Window
    val wTbl = broadcast(avail.sparkSession.createDataFrame(
      weights.toSeq.map(kv => (kv._1, kv._2))).toDF(groupCol, "__w"))
    avail
      .join(wTbl, Seq(groupCol))
      .withColumn("__t", expr(s"(${budget}L * __w) div ${totalW}L"))
      .withColumn("__rem", expr(s"(${budget}L * __w) % ${totalW}L"))
      .withColumn("__left", lit(budget) - sum(col("__t")).over(
        w.partitionBy().rowsBetween(
          w.unboundedPreceding, w.unboundedFollowing)))
      .withColumn("__rn", row_number().over(
        w.orderBy(col("__rem").desc, col(groupCol))))
      .withColumn("target_tokens",
        col("__t") + when(col("__rn") <= col("__left"), 1L).otherwise(0L))
      .withColumn("alloc_tokens",
        least(col("target_tokens"), col("avail_tokens")))
      .withColumn("shortfall", col("target_tokens") - col("alloc_tokens"))
      .select(col(groupCol), col("avail_tokens"), col("target_tokens"),
        col("alloc_tokens"), col("shortfall"))
  }

  /** Curriculum data-mixing schedule: `budgets.length` training phases
    * whose relative group weights INTERPOLATE linearly from
    * `startWeights` to `endWeights` — the standard "web-heavy early,
    * curated-heavy late" curriculum — each phase apportioning its own
    * token budget by largest remainder. The interpolation is the exact
    * unnormalized integer lerp `w_p = start·(P−1−p) + end·p`
    * (apportionment only uses weight RATIOS, so no division, no
    * drift); a phase may interpolate a group's weight to zero. The
    * corpus is scanned ONCE for availability; every phase's allocation
    * is window work over the per-group summary. Output: (phase, group,
    * avail_tokens, target_tokens, alloc_tokens, shortfall). */
  def curriculumSchedule(df: DataFrame, groupCol: String,
                         tokenCol: String, budgets: Seq[Long],
                         startWeights: Map[String, Long],
                         endWeights: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "at least one phase")
    require(startWeights.keySet == endWeights.keySet,
      "start and end weights must cover the same groups")
    val nP = budgets.length
    // per-group availability is weights-map-sized: collect it to a
    // LITERAL relation (not localCheckpoint) so the nP phase branches
    // reuse the one corpus scan AND the allocation windows sit over a
    // frame the plan linter can prove bounded (LocalRelation leaf)
    val availAgg = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).cast("long").as("avail_tokens"))
    val avail = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(availAgg.collect(): _*), availAgg.schema)
    budgets.zipWithIndex.map { case (b, p) =>
      val wp =
        if (nP == 1) startWeights
        else startWeights.map { case (g, s) =>
          g -> (s * (nP - 1 - p) + endWeights(g) * p)
        }
      allocateFromAvail(avail, groupCol, b, wp)
        .withColumn("phase", lit(p))
    }.reduce(_ unionByName _)
      .select(col("phase"), col(groupCol), col("avail_tokens"),
        col("target_tokens"), col("alloc_tokens"), col("shortfall"))
  }

  /** Epoch/upsampling plan on top of [[mixtureAllocate]]: when the
    * mixture target EXCEEDS a group's availability, training repeats
    * the group's data — this decides, per group and in exact integers,
    * how many full passes (`epochs = target div avail`) plus what
    * fraction of one more pass (`final_frac_bp`) realize the target,
    * and flags groups repeated `maxEpochs`-or-more times (`over_cap`,
    * the diminishing-returns regime of data-constrained scaling,
    * Muennighoff et al. NeurIPS'23). Same shuffle shape as
    * [[mixtureAllocate]] — one per-group aggregate, windows only over
    * the group-count summary. */
  def epochPlan(df: DataFrame, groupCol: String, tokenCol: String,
                budget: Long, weights: Map[String, Long],
                maxEpochs: Int = 4): DataFrame = {
    require(maxEpochs > 0, "maxEpochs must be positive")
    require(budget <= Long.MaxValue / 10000L,
      "budget * 10000 must fit in 64 bits")
    mixtureAllocate(df, groupCol, tokenCol, budget, weights)
      .withColumn("__av", greatest(col("avail_tokens"), lit(1L)))
      .withColumn("epochs", expr("target_tokens div __av"))
      .withColumn("final_frac_bp",
        expr("(target_tokens % __av) * 10000L div __av"))
      .withColumn("over_cap",
        (col("epochs") >= maxEpochs).cast("int"))
      .select(col(groupCol), col("avail_tokens"), col("target_tokens"),
        col("epochs"), col("final_frac_bp"), col("over_cap"))
  }

  /** Exact-k deterministic sample per group: the k rows with the
    * smallest `(md5-bucket(id), id)` rank in each group — a seedable,
    * engine-reproducible stand-in for per-group reservoir sampling.
    * Unlike rate-based `stratifiedSample` (which keeps ~pct% and whose
    * group sizes fluctuate), this returns exactly `min(k, |group|)`
    * rows per group, with `sample_rank` (1-based) attached so callers
    * can take nested prefixes (rank ≤ j, j < k) that are themselves
    * valid samples. `seed` perturbs the hash so distinct draws are
    * independent.
    *
    * Plan: [[Selection.hashRankFilter]] — per-(group, hash-bucket)
    * counts resolve the cutoff, then only candidate buckets see a rank
    * window partitioned by (group, bucket). No full-group sort: the
    * hottest group's rank work is split 1e6 ways. */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                     k: Int, seed: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    val h = bucket(concat(col(idCol).cast("string"), lit("|" + seed)),
      1000000)
    Selection.hashRankFilter(
        df.withColumn("__keep", lit(k.toLong)), groupCol, idCol, h,
        "__keep")
      .withColumn("sample_rank", col("__rank").cast("int"))
      .drop("__keep", "__rank")
  }

  /** Deterministic export shard of a row: `md5(id|seed) mod nShards`.
    * The foundation of a reproducible training-data export — shard
    * membership depends only on (id, seed), so it is append-stable,
    * repartition-proof, and reproducible by any engine with md5. */
  def shardOf(id: Column, nShards: Int, seed: String): Column = {
    require(nShards > 0, "nShards must be positive")
    bucket(concat(id.cast("string"), lit("|" + seed)), nShards)
  }

  /** Shard-balance manifest for a planned export: per-shard row count
    * and payload bytes. md5 equidistributes ids, so at corpus scale
    * every shard holds ~N/nShards rows — this is the check that proves
    * it (and catches id-space pathologies) before paying for the
    * export shuffle. One partial-agg shuffle of (shard, count, bytes)
    * pairs; the payload itself never moves. */
  def shardStats(df: DataFrame, idCol: String, payloadCol: String,
                 nShards: Int, seed: String): DataFrame =
    df.select(shardOf(col(idCol), nShards, seed).as("shard"),
        octet_length(col(payloadCol).cast("string")).cast("long")
          .as("__bytes"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), sum(col("__bytes")).as("n_bytes"))

  /** Deterministic ACCEPTANCE sampling: keep a row with probability
    * `weightBp/10000` (basis points), decided purely by
    * `md5(id|seed) mod 10000 < weightBp` — per-row, shuffle-free,
    * append-stable, reproducible by any engine. The weight is a COLUMN,
    * so per-class retention rates (keep 100% of high-quality docs, 5%
    * of boilerplate) compose with any upstream scoring: quality-
    * weighted corpus thinning in one map-side filter. Draws with
    * different seeds are independent. */
  def acceptByWeight(df: DataFrame, idCol: String, weightBp: Column,
                     seed: String): DataFrame =
    df.filter(shardOf(col(idCol), 10000, seed) < weightBp)

  /** Materialize the export order: one hash exchange into `nShards`
    * output partitions keyed by the shard id, each partition locally
    * sorted by a SECOND, shard-independent hash — a deterministic
    * global shuffle of the corpus (what a training run wants: no
    * residual source ordering, byte-identical across re-runs). The
    * result is ready for a partitioned `write` with one file per
    * shard. */
  def exportShuffled(df: DataFrame, idCol: String, nShards: Int,
                     seed: String): DataFrame =
    df.withColumn("shard", shardOf(col(idCol), nShards, seed))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(
        bucket(concat(col(idCol).cast("string"), lit("|order|" + seed)),
          1000000),
        col(idCol))
}
