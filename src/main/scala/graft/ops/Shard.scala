package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Shard-assignment stability under cluster resize — the reason
  * rendezvous (highest-random-weight) hashing exists: growing a
  * mod-hashed layout from S to S+1 shards moves ~S/(S+1) of ALL keys
  * (every byte reshuffles — at 100 TB that is the outage), while
  * rendezvous hashing moves only the ~1/(S+1) of keys whose new shard
  * WINS their weight race (Thaler & Ravishankar 1998; the same
  * property consistent-ring hashing buys, with no ring state — just a
  * per-(key, shard) hash and an argmax).
  *
  * The operator quantifies exactly that on the document corpus: assign
  * every doc under mod-16/mod-17 and rendezvous-16/rendezvous-17 and
  * report the moved fraction of each scheme in basis points. The
  * numbers a platform team reads before choosing a partitioning
  * scheme for a growing store.
  *
  * Scale shape: pure map stage — the per-doc rendezvous argmax runs
  * inside one higher-order expression over a 16/17-element array (no
  * explode, no shuffle; the row count never multiplies), mod
  * assignment is one hash; the report is a single combinable
  * aggregate. Weights ride the [[Hashing.md5Long60]] cross-engine
  * contract; argmax ties break (weight, shard)-lexicographic — exact
  * on both engines.
  */
object Shard {

  /** Rendezvous winner among shards 0..n-1 for the doc_id key, as an
    * int column: argmax over md5-derived per-(key, shard) weights. */
  private def rdv(n: Int): String =
    s"""array_max(transform(sequence(0, ${n - 1}), j -> struct(
       |  cast(conv(substring(md5(concat(cast(doc_id as string), ':',
       |    cast(j as string))), 1, 15), 16, 10) as bigint) as w,
       |  j as j))).j""".stripMargin

  /** q_shard_rebalance entry: moved-key accounting for the 16 → 17
    * shard grow under both schemes — one row. */
  def rebalanceQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = Hashing.md5Long60($"doc_id".cast("string"))
    t(s, dir, "documents")
      .select($"doc_id",
        (h % 16).as("m16"), (h % 17).as("m17"),
        expr(rdv(16)).as("r16"), expr(rdv(17)).as("r17"))
      .agg(count(lit(1)).as("n_docs"),
        sum(($"m16" =!= $"m17").cast("long")).as("moved_mod"),
        sum(($"r16" =!= $"r17").cast("long")).as("moved_rdv"))
      .select($"n_docs".cast("long").as("n_docs"),
        $"moved_mod".cast("long").as("moved_mod"),
        expr("(10000 * moved_mod) div n_docs").as("moved_mod_bp"),
        $"moved_rdv".cast("long").as("moved_rdv"),
        expr("(10000 * moved_rdv) div n_docs").as("moved_rdv_bp"))
  }

  /** DuckDB twin: the argmax races run as per-doc rank windows over an
    * unnested (doc, shard) grid — fine at oracle scale; tie order
    * (w DESC, j DESC) mirrors array_max's (w, j)-lexicographic max. */
  val rebalanceSql: String = {
    def win(n: Int, out: String): String =
      s"""$out AS (
         |  SELECT doc_id, j FROM (
         |    SELECT doc_id, j, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
         |        j::VARCHAR), 1, 15))::UBIGINT::BIGINT DESC, j DESC) AS rk
         |    FROM documents, range(0, $n) t(j))
         |  WHERE rk = 1)""".stripMargin
    s"""WITH ${win(16, "r16")},
      |${win(17, "r17")},
      |m AS (
      |  SELECT d.doc_id,
      |    ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
      |      % 16 AS m16,
      |    ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
      |      % 17 AS m17,
      |    r16.j AS rj16, r17.j AS rj17
      |  FROM documents d
      |  JOIN r16 ON d.doc_id = r16.doc_id
      |  JOIN r17 ON d.doc_id = r17.doc_id),
      |a AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CASE WHEN m16 <> m17 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS moved_mod,
      |    CAST(SUM(CASE WHEN rj16 <> rj17 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS moved_rdv
      |  FROM m)
      |SELECT n_docs, moved_mod,
      |  CAST((10000 * moved_mod) // n_docs AS BIGINT) AS moved_mod_bp,
      |  moved_rdv,
      |  CAST((10000 * moved_rdv) // n_docs AS BIGINT) AS moved_rdv_bp
      |FROM a""".stripMargin
  }

  /** q_shard_ring entry: CONSISTENT-RING HASHING with virtual nodes
    * (Karger et al., STOC 1997 — the scheme behind Dynamo/Cassandra
    * partitioning and most distributed caches): each node owns 16
    * pinned-hash positions on a ring; a key belongs to the first node
    * position clockwise from the key's hash. The operator assigns every
    * customer key under an 8-node and a 9-node ring and reports, per
    * node: key counts before/after the grow and how many moved IN. Two
    * theorems are visible in the output: (1) ~1/9 of keys move on a
    * 8→9 grow, (2) EVERY moved key lands on the new node — n_moved_in
    * is zero for all pre-existing nodes, the locality guarantee that
    * distinguishes the ring from rehash-everything (and that
    * [[rebalanceQ]]'s rendezvous scheme shares but cannot show
    * per-node, having no ring to localize on). Virtual nodes are what
    * keeps per-node load within a few percent of fair — the spread is
    * readable directly from n_after.
    *
    * Scale shape: the ring's ≤144 positions partition the hash space
    * into half-open INTERVALS (lo, hi] each owned by the node at hi
    * (plus one wrap interval owned by the min-position node); keys
    * broadcast-range-join the interval table, so every output row
    * carries only (key, node) — narrow and codegen'd. The first build
    * shipped the whole ring as a per-row ARRAY through an interpreted
    * higher-order filter: ~5 KB of struct copies per key row, measured
    * 16.6×/decade at the sf1 bench (33 s); the interval join is the
    * same assignment at 1.3×/decade. The per-node rollup is one
    * combinable groupBy over ≤ 9 distinct values.
    *
    * Determinism: positions and key hashes ride [[Hashing.md5Long60]];
    * intervals come from a lag window ordered (pos, node), so even a
    * 60-bit collision would order identically in both engines. */
  def ringQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    // (lo, hi, node): keys with lo < kpos <= hi belong to node; the wrap
    // row (maxpos, Long.Max] belongs to the min-position node
    def intervalsOf(nNodes: Int): DataFrame = {
      val ring = s.range(nNodes)
        .select(concat(lit("n"), $"id").as("node"))
        .crossJoin(s.range(16).select($"id".as("v")))
        .select(
          Hashing.md5Long60(concat(lit("ring:"), $"node", lit(":"), $"v"))
            .as("pos"),
          $"node")
      val w = Window.partitionBy(lit(0)).orderBy($"pos", $"node")
      val ivals = ring
        .select(coalesce(lag($"pos", 1).over(w), lit(-1L)).as("lo"),
          $"pos".as("hi"), $"node")
      val wrap = ring.agg(max($"pos").as("lo"),
        lit(Long.MaxValue).as("hi"),
        min(struct($"pos", $"node")).getField("node").as("node"))
      ivals.unionByName(wrap)
    }
    val keys = t(s, dir, "customer").select(
      $"c_custkey".as("key"),
      Hashing.md5Long60(concat(lit("key:"), $"c_custkey".cast("string")))
        .as("kpos"))
    def assign(ivals: DataFrame, as: String): DataFrame =
      keys.join(broadcast(ivals), $"kpos" > $"lo" && $"kpos" <= $"hi")
        .select($"key", $"node".as(as))
    val assigned = assign(intervalsOf(8), "before")
      .join(assign(intervalsOf(9), "after"), "key")
    val nodes = s.range(9).select(concat(lit("n"), $"id").as("node"))
    val nb = assigned.groupBy($"before".as("node"))
      .agg(count(lit(1)).as("n_before"))
    val na = assigned.groupBy($"after".as("node"))
      .agg(count(lit(1)).as("n_after"))
    val mi = assigned.filter($"before" =!= $"after")
      .groupBy($"after".as("node")).agg(count(lit(1)).as("n_moved_in"))
    val wAll = Window.partitionBy(lit(0))
    nodes
      .join(nb, Seq("node"), "left")
      .join(na, Seq("node"), "left")
      .join(mi, Seq("node"), "left")
      .select($"node",
        coalesce($"n_before", lit(0L)).cast("long").as("n_before"),
        coalesce($"n_after", lit(0L)).cast("long").as("n_after"),
        coalesce($"n_moved_in", lit(0L)).cast("long").as("n_moved_in"))
      .withColumn("moved_fraction",
        round(sum($"n_moved_in").over(wAll).cast("double")
          / sum($"n_after").over(wAll), 6))
      .orderBy($"node")
  }

  /** DuckDB twin: the clockwise-successor lookup runs as a MIN-over-
    * following window on the unioned (keys + ring) position axis —
    * MIN skips the key rows' NULLs, so no IGNORE NULLS dependency. */
  val ringSql: String = {
    // NOTE: fragments are embedded in an outer stripMargin string, so no
    // continuation line here may START with "||" (the outer strip would
    // eat one pipe and leave a bitwise-or)
    def ring(n: Int, out: String): String =
      s"""$out AS (
         |  SELECT ('0x' || substr(md5('ring:n' || nd.range::VARCHAR ||
         |      ':' || v.range::VARCHAR), 1, 15))::UBIGINT::BIGINT AS pos,
         |    'n' || nd.range::VARCHAR AS node
         |  FROM range(0, $n) nd, range(0, 16) v)""".stripMargin
    def assign(ringName: String, out: String): String =
      s"""${out}_c AS (
         |  SELECT kpos AS pos, 0 AS is_ring, key,
         |    NULL::VARCHAR AS rnode FROM keys
         |  UNION ALL
         |  SELECT pos, 1, NULL, node FROM $ringName),
         |${out}_w AS (
         |  SELECT key,
         |    MIN(CASE WHEN is_ring = 1 THEN pos END) OVER (
         |      ORDER BY pos, is_ring
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
         |  FROM ${out}_c),
         |$out AS (
         |  SELECT w.key, r.node
         |  FROM ${out}_w w
         |  JOIN $ringName r ON r.pos = COALESCE(w.nxt,
         |    (SELECT MIN(pos) FROM $ringName))
         |  WHERE w.key IS NOT NULL)""".stripMargin
    s"""WITH ${ring(8, "ring8")},
      |${ring(9, "ring9")},
      |keys AS (
      |  SELECT c_custkey AS key,
      |    ('0x' || substr(md5('key:' || c_custkey::VARCHAR), 1, 15))
      |      ::UBIGINT::BIGINT AS kpos
      |  FROM customer),
      |${assign("ring8", "a8")},
      |${assign("ring9", "a9")},
      |ba AS (
      |  SELECT a8.key, a8.node AS b_node, a9.node AS a_node
      |  FROM a8 JOIN a9 USING (key)),
      |nodes AS (SELECT 'n' || r.range::VARCHAR AS node FROM range(0, 9) r),
      |nb AS (SELECT b_node AS node, COUNT(*) AS n_before FROM ba GROUP BY 1),
      |na AS (SELECT a_node AS node, COUNT(*) AS n_after FROM ba GROUP BY 1),
      |mi AS (SELECT a_node AS node, COUNT(*) AS n_moved_in
      |  FROM ba WHERE b_node <> a_node GROUP BY 1)
      |SELECT n.node,
      |  CAST(COALESCE(nb.n_before, 0) AS BIGINT) AS n_before,
      |  CAST(COALESCE(na.n_after, 0) AS BIGINT) AS n_after,
      |  CAST(COALESCE(mi.n_moved_in, 0) AS BIGINT) AS n_moved_in,
      |  ROUND(CAST(SUM(COALESCE(mi.n_moved_in, 0)) OVER () AS DOUBLE)
      |    / SUM(COALESCE(na.n_after, 0)) OVER (), 6) AS moved_fraction
      |FROM nodes n
      |LEFT JOIN nb ON n.node = nb.node
      |LEFT JOIN na ON n.node = na.node
      |LEFT JOIN mi ON n.node = mi.node
      |ORDER BY n.node""".stripMargin
  }

  /** q_shard_range_bounds entry: RANGE-PARTITIONER BOUNDARY PLANNING —
    * exactly what Spark's own RangePartitioner (and any sorted-table /
    * Z-ordered writer) must do before a 100 TB sort: draw a cheap
    * deterministic sample, read k−1 quantile boundaries off it, then
    * audit how evenly the FULL corpus lands in the resulting k ranges.
    * Sample = orders whose seeded [[Hashing.md5Long60]] lands in 1/16
    * of hash space (a pure map — no coordination, replayable anywhere);
    * boundaries = the i·nₛ/8 order statistics of sampled o_totalprice
    * (i = 1..7, k = 8); the audit assigns every order by counting
    * boundaries below its price with one higher-order filter over the
    * broadcast 7-element boundary array (pure map, no explode).
    * Per-partition row share in basis points answers "did the sample
    * plan a balanced sort?" — the skew number that decides whether the
    * shuffle will straggle.
    *
    * Scale shape: sample selection is map+filter; the boundary sort
    * touches only the ~1/16 sample (at 100 TB one samples ~20·k rows
    * per partition instead — the shape is unchanged); assignment is
    * one scan with a 7-element array probe; the audit is a combinable
    * groupBy(pid). Determinism: prices compare as exact DECIMAL(18,2);
    * order statistics pick concrete rows (rank ties broken by
    * orderkey); counts are integers, shares integer basis points. */
  def rangeBoundsQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val k = 8
    val price = $"o_totalprice".cast("decimal(18,2)")
    val orders = t(s, dir, "orders").select($"o_orderkey", price.as("p"))
    val sample = orders
      .filter(Hashing.md5Long60(concat(lit("rb:"),
        $"o_orderkey".cast("string"))) % 16 === 0)
    // The 1-in-16 sample is still rows/16 at 100 TB: rank it through
    // the distributed [[Rank.orderedPrefix]] (which also delivers the
    // sample count), not a single-partition window.
    val ranked = Rank.orderedPrefix(sample,
      order = Seq($"p", $"o_orderkey"),
      rnOut = Some("rk"), countOut = Some("ns"))
    val bounds = ranked
      .filter((1 until k).map(i =>
        $"rk" === expr(s"(ns * $i) div $k")).reduce(_ || _))
      .agg(sort_array(collect_list($"p")).as("bnds"))
    val assigned = orders.crossJoin(broadcast(bounds))
      .withColumn("pid", expr("size(filter(bnds, b -> p > b))"))
    val perPid = assigned.groupBy($"pid")
      .agg(count(lit(1)).as("n_rows"),
        min($"p").as("lo"), max($"p").as("hi"))
    perPid
      .crossJoin(broadcast(orders.agg(count(lit(1)).as("total"))))
      .select($"pid".cast("int").as("pid"),
        $"n_rows".cast("long").as("n_rows"),
        $"lo".cast("double").as("lo"), $"hi".cast("double").as("hi"),
        expr("(n_rows * 10000) div total").cast("long").as("share_bp"))
      .orderBy($"pid")
  }

  val rangeBoundsSql: String =
    """WITH orders_p AS (
      |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |sample AS (
      |  SELECT * FROM orders_p
      |  WHERE ('0x' || substr(md5('rb:' || CAST(o_orderkey AS VARCHAR)),
      |    1, 15))::UBIGINT::BIGINT % 16 = 0),
      |ns AS (SELECT COUNT(*) AS ns FROM sample),
      |ranked AS (
      |  SELECT p, ROW_NUMBER() OVER (ORDER BY p, o_orderkey) AS rk, ns
      |  FROM sample CROSS JOIN ns),
      |bounds AS (
      |  SELECT list_sort(list(p)) AS bnds FROM ranked
      |  WHERE rk IN (ns * 1 // 8, ns * 2 // 8, ns * 3 // 8, ns * 4 // 8,
      |    ns * 5 // 8, ns * 6 // 8, ns * 7 // 8)),
      |assigned AS (
      |  SELECT pid, COUNT(*) AS n_rows, MIN(p) AS lo, MAX(p) AS hi FROM (
      |    SELECT p, len(list_filter(bnds, b -> p > b)) AS pid
      |    FROM orders_p CROSS JOIN bounds) GROUP BY 1),
      |tot AS (SELECT SUM(n_rows) AS total FROM assigned)
      |SELECT CAST(pid AS INT) AS pid, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi,
      |  CAST(n_rows * 10000 // total AS BIGINT) AS share_bp
      |FROM assigned CROSS JOIN tot
      |ORDER BY pid""".stripMargin

  /** q_shard_zcurve entry: Z-ORDER (Morton) LAYOUT AUDIT — the
    * multi-dimensional clustering question behind every Z-ordered /
    * Hilbert-ordered table write: interleave the bits of two query
    * dimensions (price bucket × order-date bucket, 8 bits each) into a
    * 16-bit Morton key, group rows into 256-key file-sized "blocks"
    * (z >> 8), and audit a fixed 2-D range query: how many blocks
    * actually CONTAIN matching rows (what a perfect skip index reads)
    * vs the contiguous z-span a naive min/max-z scan would read, vs
    * the blocks a 1-D price-only sort would touch. The read-
    * amplification numbers that decide whether Z-ordering the table
    * pays — the data-layout decision 100 TB tables live or die by.
    *
    * Scale shape: the Morton key is a pure map (16 unrolled shift/mask
    * integer terms — codegen'd, no UDF); every audit number is a
    * combinable aggregate over (block) collapses. Determinism: all
    * integers end to end. */
  def zcurveQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // 8-bit buckets: price 0..199 (2.5k steps), date 0..240 (10-day steps
    // from the fixture's 1995-01-01 epoch)
    val x = least(lit(255L), floor($"o_totalprice".cast("decimal(18,2)") /
      lit(2500)).cast("long")).as("x")
    val y = least(lit(255L), expr(
      "datediff(o_orderdate, timestamp'1995-01-01') div 10")).as("y")
    val interleave = (0 until 8).map { j =>
      s"(shiftleft(shiftright(x, $j) & 1, ${2 * j}) + " +
        s"shiftleft(shiftright(y, $j) & 1, ${2 * j + 1}))"
    }.mkString(" + ")
    val keyed = t(s, dir, "orders")
      .select(x, y)
      .withColumn("z", expr(interleave))
      .withColumn("zblock", expr("z div 256"))
      .withColumn("xblock", expr("x div 2")) // 1-D sort: 128 blocks of 2 buckets
      .withColumn("hit",
        ($"x" >= 64 && $"x" < 128 && $"y" >= 32 && $"y" < 96).cast("long"))
    val agg = keyed.agg(
      count(lit(1)).as("n_rows"), sum($"hit").as("n_match"),
      countDistinct(when($"hit" === 1, $"zblock")).as("z_blocks_hit"),
      countDistinct($"zblock").as("z_blocks_total"),
      (max(when($"hit" === 1, $"zblock")) -
        min(when($"hit" === 1, $"zblock")) + 1).as("z_span"),
      countDistinct(when($"hit" === 1, $"xblock")).as("x_blocks_hit"),
      countDistinct($"xblock").as("x_blocks_total"))
    agg.select(
      $"n_rows".cast("long").as("n_rows"),
      $"n_match".cast("long").as("n_match"),
      $"z_blocks_hit".cast("long").as("z_blocks_hit"),
      $"z_blocks_total".cast("long").as("z_blocks_total"),
      $"z_span".cast("long").as("z_span"),
      $"x_blocks_hit".cast("long").as("x_blocks_hit"),
      $"x_blocks_total".cast("long").as("x_blocks_total"),
      expr("(10000 * z_blocks_hit) div z_blocks_total").as("z_read_bp"),
      expr("(10000 * x_blocks_hit) div x_blocks_total").as("x_read_bp"))
  }

  val zcurveSql: String = {
    val interleave = (0 until 8).map { j =>
      s"((((x >> $j) & 1) << ${2 * j}) + (((y >> $j) & 1) << ${2 * j + 1}))"
    }.mkString(" + ")
    s"""WITH keyed AS (
       |  SELECT x, y, ($interleave) AS z FROM (
       |    SELECT
       |      LEAST(255, CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2))
       |        / 2500) AS BIGINT)) AS x,
       |      LEAST(255, datediff('day', TIMESTAMP '1995-01-01',
       |        o_orderdate) // 10) AS y
       |    FROM orders)),
       |marked AS (
       |  SELECT z // 256 AS zblock, x // 2 AS xblock,
       |    CASE WHEN x >= 64 AND x < 128 AND y >= 32 AND y < 96
       |      THEN 1 ELSE 0 END AS hit
       |  FROM keyed),
       |a AS (
       |  SELECT COUNT(*) AS n_rows, SUM(hit) AS n_match,
       |    COUNT(DISTINCT CASE WHEN hit = 1 THEN zblock END)
       |      AS z_blocks_hit,
       |    COUNT(DISTINCT zblock) AS z_blocks_total,
       |    MAX(CASE WHEN hit = 1 THEN zblock END)
       |      - MIN(CASE WHEN hit = 1 THEN zblock END) + 1 AS z_span,
       |    COUNT(DISTINCT CASE WHEN hit = 1 THEN xblock END)
       |      AS x_blocks_hit,
       |    COUNT(DISTINCT xblock) AS x_blocks_total
       |  FROM marked)
       |SELECT CAST(n_rows AS BIGINT) AS n_rows,
       |  CAST(n_match AS BIGINT) AS n_match,
       |  CAST(z_blocks_hit AS BIGINT) AS z_blocks_hit,
       |  CAST(z_blocks_total AS BIGINT) AS z_blocks_total,
       |  CAST(z_span AS BIGINT) AS z_span,
       |  CAST(x_blocks_hit AS BIGINT) AS x_blocks_hit,
       |  CAST(x_blocks_total AS BIGINT) AS x_blocks_total,
       |  CAST((10000 * z_blocks_hit) // z_blocks_total AS BIGINT)
       |    AS z_read_bp,
       |  CAST((10000 * x_blocks_hit) // x_blocks_total AS BIGINT)
       |    AS x_read_bp
       |FROM a""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shard_rebalance" -> rebalanceQ,
    "q_shard_range_bounds" -> rangeBoundsQ,
    "q_shard_zcurve" -> zcurveQ,
    "q_shard_ring" -> ringQ)

  def oracle: Map[String, String] = Map(
    "q_shard_rebalance" -> rebalanceSql,
    "q_shard_range_bounds" -> rangeBoundsSql,
    "q_shard_zcurve" -> zcurveSql,
    "q_shard_ring" -> ringSql)
}
