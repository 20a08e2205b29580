package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.{RhOps, VecOps}

/** Dev-loop measurement for the multi-probe schedule: for each sfDir
  * argument, sweep probe counts T and print threshold-pair recall
  * (q267's sample methodology) plus the FULL-corpus candidate count at
  * each T — the two numbers the [[RhOps.probesFor]] schedule trades.
  *
  * Usage: runMain graft.tools.LshProbe /root/testdata/sf0.1 /tmp/graft_sf1
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = "32", appName = "graft-lsh-probe")
    import graft.Tables
    for (dir <- args) {
      val emb = Tables.embeddings(spark, dir)
      val n = emb.count()
      val ppb = RhOps.planesFor(n)
      val smod = math.max(1L, n / 256)
      val toD = (c: org.apache.spark.sql.Column) =>
        transform(c, x => x.cast("double"))
      val sample = emb.filter(col("vec_id") % smod === 0)
        .select(col("vec_id"), toD(col("embedding")).as("v"))
      val truth = sample.select(col("vec_id").as("a_id"), col("v").as("va"))
        .crossJoin(broadcast(
          sample.select(col("vec_id").as("b_id"), col("v").as("vb"))))
        .filter(col("a_id") < col("b_id"))
        .filter(round(VecOps.dot(col("va"), col("vb")) /
          sqrt(VecOps.norm2(col("va")) * VecOps.norm2(col("vb"))), 6) >= 0.35)
        .select("a_id", "b_id")
      truth.cache()
      val nTrue = truth.count()
      println(s"== $dir n=$n base_ppb=$ppb sample=${sample.count()} true_pairs=$nTrue")
      // default: the candidate production schedule; SPARK_GRAFT_LSH_SWEEP=1
      // sweeps the full grid
      val explore = sys.env.contains("SPARK_GRAFT_LSH_COMBOS") ||
        sys.env.contains("SPARK_GRAFT_LSH_SWEEP")
      // asym applies ONLY to the sweep/combos exploration branches:
      // production q25 runs symmetric (base ∪ probes)² bucketPairs, so
      // an asymmetric reading on the DEFAULT path would masquerade as
      // a production measurement (r14 advisory)
      val asym = sys.env.contains("SPARK_GRAFT_LSH_ASYM") && explore
      if (sys.env.contains("SPARK_GRAFT_LSH_ASYM") && !explore)
        println("   [SPARK_GRAFT_LSH_ASYM ignored on the default " +
          "(production-schedule) path — set SWEEP or COMBOS to explore " +
          "asymmetric generation]")
      val combos =
        if (sys.env.contains("SPARK_GRAFT_LSH_COMBOS"))
          // explicit "w:t,w:t,…" pairs for targeted frontier probes
          sys.env("SPARK_GRAFT_LSH_COMBOS").split(",").toSeq.map { tok =>
            val a = tok.split(":")
            require(a.length == 2 && a.forall(_.trim.matches("\\d+")),
              s"SPARK_GRAFT_LSH_COMBOS: bad token '$tok' — expected " +
                "\"w:t,w:t,…\" with numeric w and t")
            (a(0).trim.toInt, a(1).trim.toInt)
          }
        else if (sys.env.contains("SPARK_GRAFT_LSH_SWEEP")) {
          // multi-bit probing makes T > ppb meaningful (candidates are
          // 1- and 2-plane flips: up to ppb + C(ppb,2) per band);
          // asymmetric candidate generation (probes join BASE keys, not
          // (base ∪ probes)²) cuts candidate cost from (1+T)² to 2(1+T),
          // affording far larger T at equal budget
          val tGrid = (w: Int) =>
            if (asym) Seq(w, 2 * w, 3 * w, 4 * w, 6 * w)
            else Seq(w * 3 / 4, w, w * 3 / 2, 2 * w)
          for (w <- ppb to math.min(ppb + 4, RhOps.maxPlanesPerBand);
               t <- tGrid(w).map(math.min(_, w * (w * w + 5) / 6)).distinct)
            yield (w, t)
        } else {
          val w = RhOps.probedPlanesFor(n)
          Seq((w, RhOps.probesFor(w)))
        }
      for ((w, t) <- combos) {
        def keys(df: org.apache.spark.sql.DataFrame) = df
          .select(col("vec_id"),
            posexplode(RhOps.probedBandKeysCol(col("v"), w, t)))
          .select(col("vec_id"), (col("pos") / (t + 1)).cast("int").as("band"),
            col("col").as("bkey"))
        def baseKeys(df: org.apache.spark.sql.DataFrame) = df
          .select(col("vec_id"),
            posexplode(RhOps.bandKeysCol(col("v"), w)))
          .select(col("vec_id"), col("pos").as("band"), col("col").as("bkey"))
        def cand(df: org.apache.spark.sql.DataFrame) =
          if (asym)
            keys(df).select(col("band"), col("bkey"), col("vec_id").as("p_id"))
              .join(baseKeys(df).select(col("band"), col("bkey"),
                col("vec_id").as("q_id")), Seq("band", "bkey"))
              .filter(col("p_id") =!= col("q_id"))
              .select(least(col("p_id"), col("q_id")).as("a_id"),
                greatest(col("p_id"), col("q_id")).as("b_id"))
              .distinct()
          else graft.ops.Dedup.bucketPairs(keys(df), "vec_id", Seq("band", "bkey"))
            .distinct()
        val hits = truth.join(cand(sample), Seq("a_id", "b_id"), "left_semi").count()
        val recall = if (nTrue == 0) -1.0 else hits * 100.0 / nTrue
        // every result line names its candidate-generation mode: asym
        // numbers are NOT production q25 measurements (r14 advisory)
        val mode = if (asym) "asym" else "sym"
        // recall prints BEFORE the full-corpus census so a ceiling
        // probe at a huge T (e.g. the all-flips 15:575) yields its
        // number even if the census leg would be prohibitive
        println(f"   [$mode] ppb=$w%2d T=$t%3d recall=$recall%6.2f%% ($hits/$nTrue)")
        if (recall >= 45.0) {
          val full = emb.select(col("vec_id"), toD(col("embedding")).as("v"))
          val t0 = System.nanoTime()
          // Sym census = candidate ROWS via the bucket-size histogram
          // (Σ k·(k−1)/2, O(buckets) — the same unit q267 reports and
          // LshRecallSpec pins). The previous pair-generate+DISTINCT
          // census OOM'd an 8g driver at the (15, 45) schedule on the
          // 4×-sf1 fixture (~1G pair rows) — the exact cost class the
          // q267 histogram rework removed from the engine in round 14.
          // Asym keeps the distinct-pair join (exploratory only; its
          // candidate stream is 2(1+T), never (1+T)²).
          val (candRows, unit) =
            if (asym) (cand(full).count(), "dist-pairs")
            else (keys(full).groupBy("band", "bkey")
              .agg(count(lit(1)).as("k"))
              .agg(coalesce(sum(expr("(k * (k - 1)) DIV 2")), lit(0L)))
              .collect()(0).getLong(0), "rows")
          val secs = (System.nanoTime() - t0) / 1e9
          // asym ALSO reports the pre-distinct candidate-ROW census
          // (Σ probe_k · base_k over the (band, key) histogram minus
          // the 4N self-matches — each vector's own base key sits in
          // its probe-side key set once per band), O(buckets): the
          // unit LshRecallSpec pins for the sym schedule, so the
          // sym-vs-asym frontier compares verify-stage work like for
          // like instead of rows against distinct pairs.
          val rowCensus = if (asym) {
            val ph = keys(full).groupBy("band", "bkey")
              .agg(count(lit(1)).as("pk"))
            val bh = baseKeys(full).groupBy("band", "bkey")
              .agg(count(lit(1)).as("bk"))
            val tot = ph.join(bh, Seq("band", "bkey"))
              .agg(coalesce(sum(col("pk") * col("bk")), lit(0L)))
              .collect()(0).getLong(0) - 4 * n
            f" rows_full=$tot%10d (${tot * 1.0 / n}%8.1f/vec)"
          } else ""
          println(f"   [$mode] ppb=$w%2d T=$t%3d recall=$recall%6.2f%% ($hits/$nTrue) " +
            f"cand_full=$candRows%10d $unit (${candRows * 1.0 / n}%8.1f/vec, ${secs}%6.2f s)" +
            rowCensus)
        } else
          println(f"   [$mode] ppb=$w%2d T=$t%3d   [cand census skipped: recall < 45%%]")
      }
      truth.unpersist()
    }
    spark.stop()
  }
}
