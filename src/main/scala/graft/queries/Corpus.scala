package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VecSum

/** Corpus-preparation operators for training-data pipelines: whole-
  * vector centroid aggregation, deterministic training-order shuffle +
  * sharding, per-user event-sequence reconstruction (secondary sort),
  * and zero-shuffle word-entropy scoring.
  *
  * Same portability contract as [[Pipeline]]/[[ScaleOps]]: hashes are
  * md5-derived ([[graft.functions.Portable.h32]]), sums that cross an
  * exchange are exact integer/decimal arithmetic, so every DuckDB
  * oracle replays the result bit-for-bit regardless of partitioning.
  */
object Corpus {

  /** q160: PER-LABEL EMBEDDING CENTROIDS through the whole-vector
    * [[VecSum]] aggregate — mean-pooling over an embedding column, the
    * centroid step of any clustering / class-prototype build (the
    * reference's Annoy index build averages nothing, but its kmeans
    * sibling in PICO_search.py:28-38 does; this is that step as a
    * first-class aggregate).
    *
    * 100 TB shape — and the reason this exists next to q77's
    * posexplode formulation: explode materializes N·D (group, dim,
    * value) rows in the scan stage before partial aggregation can
    * compress them (a D× row blow-up; D=1024 turns 100 TB into
    * 100k TB of intermediate rows). [[VecSum]] keeps the vector whole:
    * O(D) buffer per group per task, map-side combine, the exchange
    * carries exactly one D-long array per group per task. Quantization
    * (`floor(x·1e6)` longs, IvfKmeans.scala:27) keeps every sum exact,
    * so merge order cannot leak into the result.
    *
    * The output explodes the FINAL centroids (groups·D rows — tiny) so
    * the oracle compares scalars, not nested arrays.
    */
  private val q160VectorCentroids = Q(
    "q160_vector_centroids",
    (s, d) => {
      val q = Tables.embeddings(s, d).select(col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1e6)).cast("long")).as("q"))
      q.groupBy("label").agg(VecSum.vecSum(col("q")).as("vs"))
        .select(col("label"), col("vs.n").as("n_members"),
          posexplode(col("vs.s")))
        .select(col("label"), col("pos").cast("int").as("dim"),
          floor(col("col").cast("double") / col("n_members"))
            .cast("long").as("cval"),
          col("n_members"))
        .orderBy("label", "dim")
    },
    Some("""WITH el AS (SELECT label,
        CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
        CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qv
      FROM embeddings)
      SELECT label, dim,
        CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS cval,
        CAST(count(*) AS BIGINT) AS n_members
      FROM el GROUP BY 1, 2 ORDER BY 1, 2"""),
    bench = true)

  /** q161: DETERMINISTIC TRAINING-ORDER SHUFFLE + SHARDING — the
    * global permutation every pre-training run needs (fixed seed →
    * identical epoch order on any cluster). Order is
    * `(h32(doc_id‖':shuf'), doc_id)`; shard = h % 8; position =
    * row_number within the shard. A loader consuming shards
    * round-robin reads the full permutation without any single
    * machine ever holding a global order.
    *
    * 100 TB shape: one map-side hash projection, ONE exchange on the
    * uniform shard key, an in-partition sort — no global sort, no
    * driver-side state, no skew (the key is a hash). Shard count
    * scales with the cluster (here 8; at 100 TB, thousands), and
    * per-shard positions + round-robin give a loader the exact global
    * order without a second pass, so nothing here changes shape with
    * corpus size.
    */
  private val q161GlobalShuffle = Q(
    "q161_global_shuffle",
    (s, d) => {
      val h = Tables.documents(s, d).select(col("doc_id"),
        graft.functions.Portable.h32(
          concat(col("doc_id").cast("string"), lit(":shuf"))).as("h"))
      val w = Window.partitionBy(col("h") % 8).orderBy("h", "doc_id")
      h.select(col("doc_id"), (col("h") % 8).as("shard"),
          row_number().over(w).cast("long").as("pos"))
        .orderBy("shard", "pos")
    },
    Some("""WITH h AS (SELECT doc_id,
        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf'), 1, 8)
          AS BIGINT) AS h
      FROM documents)
      SELECT doc_id, h % 8 AS shard,
        CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
          AS BIGINT) AS pos
      FROM h ORDER BY shard, pos"""))

  /** q162: PER-USER EVENT-SEQUENCE RECONSTRUCTION (secondary sort) —
    * the behavioral-sequence / session-corpus build: each user's
    * events in (ts, event_id) order collapsed to an ordered
    * event-type string. The GROUP-AND-SORT-WITHIN shape: one exchange
    * on user_id, `array_sort` of per-group structs (ts first, then
    * event_id — the struct field order IS the sort key, giving a
    * deterministic tie-break) — no window function, no second
    * shuffle.
    *
    * 100 TB note: per-group state is one user's events (bounded by
    * user activity, not corpus size). For genuinely unbounded groups
    * the same operator becomes repartition(user_id) +
    * sortWithinPartitions(user_id, ts, event_id) + mapPartitions
    * streaming emit — same single-exchange plan, O(1) memory; the
    * collect_list form is the right default while groups fit a task.
    */
  private val q162UserSequences = Q(
    "q162_user_sequences",
    (s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          array_join(
            transform(
              array_sort(collect_list(
                struct(col("ts"), col("event_id"), col("event_type")))),
              x => x.getField("event_type")),
            "|").as("seq"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        string_agg(event_type, '|' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id ORDER BY user_id"""),
    bench = true)

  /** q163: WORD-DISTRIBUTION ENTROPY per document with ZERO shuffle —
    * the information-density quality signal (low-entropy docs are
    * boilerplate/spam; complements q68's repetition ratios). Shannon
    * entropy needs per-word counts; the naive shape explodes tokens
    * and re-aggregates (two shuffles on doc_id at 100 TB). Here the
    * whole computation stays inside one projection: sort the token
    * array, find run starts (`filter` over indices where w[i] ≠
    * w[i-1]), run lengths = adjacent start differences (`zip_with`),
    * then Σ c·ln(c) with each term cast to DECIMAL(28,6) before the
    * sum ([[graft.functions.Portable.dsum6]] discipline — summation
    * order cannot leak, so DuckDB's group-by-word order and our
    * sorted-run order agree exactly). Emits the sum, not the entropy
    * ratio, for the q93-documented reason: `ln(n) − slnc/n` can land
    * on a decimal rounding tie; the filter predicate `H ≤ τ` is the
    * same as `slnc ≥ (ln(n) − τ)·n`, which stays in exact arithmetic.
    *
    * O(L log L) per row, map-side, codegen-adjacent (native
    * higher-order expressions, no UDF) — at 100 TB this runs in the
    * scan stage and shuffles nothing.
    */
  private val q163WordEntropy = Q(
    "q163_word_entropy",
    (s, d) => {
      val ws = sort_array(split(col("text"), " "))
      val withWs = Tables.documents(s, d).select(col("doc_id"), ws.as("ws"))
      val starts = filter(
        sequence(lit(0), size(col("ws")) - 1),
        i => (i === lit(0)) ||
          element_at(col("ws"), i + 1) =!= element_at(col("ws"), i))
      val withStarts = withWs.select(col("doc_id"), col("ws"),
        starts.as("starts"))
      val ends = concat(
        slice(col("starts"), lit(2), greatest(size(col("starts")) - 1, lit(0))),
        array(size(col("ws"))))
      val counts = zip_with(col("starts"), ends, (a, b) => b - a)
      withStarts.select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          size(col("starts")).cast("long").as("n_distinct"),
          aggregate(
            transform(counts, c =>
              (c.cast("double") * log(c.cast("double")))
                .cast("decimal(28,6)")),
            lit(0).cast("decimal(28,6)"),
            (acc, x) => (acc + x).cast("decimal(28,6)"))
            .cast("double").as("slnc"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents),
      g AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2)
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        CAST(count(*) AS BIGINT) AS n_distinct,
        CAST(SUM(CAST(c * ln(c) AS DECIMAL(28,6))) AS DOUBLE) AS slnc
      FROM g GROUP BY 1 ORDER BY 1"""),
    bench = true)

  val queries: Seq[Q] = Seq(
    q160VectorCentroids, q161GlobalShuffle, q162UserSequences,
    q163WordEntropy)
}
