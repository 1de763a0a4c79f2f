package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** PII detection and redaction — the compliance pass every training-data
  * pipeline runs before a corpus ships: find personally-identifying
  * spans (emails, phone numbers, IP addresses) and replace them with
  * typed placeholders, keeping per-document counts for audit.
  *
  * Pure map over the text column — zero exchange, filters at scan
  * speed, trivially 100 TB-safe. Patterns are codegen'd
  * `regexp_extract_all` / `regexp_replace` (no UDF SerDe), kept to the
  * regex subset (character classes, bounded repetition, `\b`) that
  * Java's engine and RE2-family engines interpret identically, so the
  * same patterns run in the DuckDB oracle.
  *
  * The test corpus is synthetic word-salad with no real PII, so the
  * registered query plants deterministic contacts derived from
  * (doc_id, source) in-query — same construction on both engines —
  * then detects and redacts them. Counts vary by doc_id residues to
  * exercise 0..2 matches per class.
  */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Per-class match counts + fully redacted text. Redaction order
    * matters: emails first (an email's domain would otherwise survive
    * as an IP-lookalike never — but keep one canonical order anyway). */
  def signals(text: Column): (Column, Column, Column, Column) = {
    val nEmails = size(regexp_extract_all(text, lit(emailRe), lit(0)))
    val nPhones = size(regexp_extract_all(text, lit(phoneRe), lit(0)))
    val nIps = size(regexp_extract_all(text, lit(ipv4Re), lit(0)))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipv4Re, "[IP]")
    (nEmails, nPhones, nIps, redacted)
  }

  def redactQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val contact = concat($"text",
      lit(" contact user"), $"doc_id", lit("@"), $"source", lit(".com"),
      when($"doc_id" % 7 === 0,
        concat(lit(" cc admin"), $"doc_id", lit("@"), $"source", lit(".org")))
        .otherwise(lit("")),
      when($"doc_id" % 3 === 0,
        concat(lit(" call 555-010-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when($"doc_id" % 5 === 0,
        concat(lit(" from 10."), ($"doc_id" % 256).cast("string"),
          lit(".0."), (($"doc_id" * 7) % 256).cast("string")))
        .otherwise(lit("")))
    val withContact = t(s, dir, "documents")
      .select($"doc_id", contact.as("contact"))
    val (ne, np, ni, red) = signals($"contact")
    withContact
      .select($"doc_id",
        ne.as("n_emails"), np.as("n_phones"), ni.as("n_ips"),
        red.as("redacted"))
      .orderBy($"doc_id")
      .limit(300)
  }

  val redactSql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id || '@' || source || '.com'
      |    || CASE WHEN doc_id % 7 = 0
      |            THEN ' cc admin' || doc_id || '@' || source || '.org'
      |            ELSE '' END
      |    || CASE WHEN doc_id % 3 = 0
      |            THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |            ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0
      |            THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
      |                 || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
      |            ELSE '' END AS contact
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(contact, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(contact, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS INT) AS n_phones,
      |  CAST(len(regexp_extract_all(contact, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
      |  regexp_replace(regexp_replace(regexp_replace(contact,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g'),
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS redacted
      |FROM c ORDER BY doc_id LIMIT 300""".stripMargin

  /** q_privacy_kanon entry: k-anonymity / l-diversity audit — group the
    * table by its QUASI-IDENTIFIER projection (nation × market segment:
    * the columns an adversary can link externally) and account each
    * equivalence class: size (k-anonymity = min size), distinct
    * sensitive values (l-diversity; sensitive attribute = account-
    * balance k$-bucket), and an at-risk flag (size < 15). The
    * release-readiness audit run before publishing any per-record
    * extract — [[redactQ]] removes direct identifiers; this measures
    * re-identification risk from the columns that remain.
    *
    * Scale shape: ONE combinable groupBy over the QI projection
    * (classes ≤ the QI domain product, data-independent); both k and l
    * come from the same aggregate (count + count distinct). At 100 TB
    * this is a single scan-speed pass. */
  def kanonQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .groupBy($"c_nationkey".as("nationkey"), $"c_mktsegment".as("segment"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(floor($"c_acctbal" / 1000).cast("long")).as("l_diversity"))
      .select($"nationkey", $"segment", $"class_size", $"l_diversity",
        ($"class_size" < 15).as("at_risk"))
      .orderBy($"nationkey", $"segment")
  }

  val kanonSql: String =
    """SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
      |  CAST(COUNT(*) AS BIGINT) AS class_size,
      |  CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS BIGINT)
      |    AS l_diversity,
      |  COUNT(*) < 15 AS at_risk
      |FROM customer GROUP BY 1, 2 ORDER BY nationkey, segment""".stripMargin

  /** q_privacy_dp_hist entry: ε-differentially-private histogram
    * release — the Laplace mechanism (Dwork et al. 2006) over the
    * per-language document counts: each count is published with
    * Laplace(1/ε) noise (sensitivity 1 for a disjoint histogram) and
    * clamped at zero. The released-aggregate complement of
    * [[kanonQ]]'s row-level audit: k-anonymity gates what microdata
    * may leave, the DP histogram is how AGGREGATES leave.
    *
    * Noise is SEEDED through the [[graft.ops.Hashing.md5Long60]]
    * contract (inverse-CDF of an md5-derived uniform) — the test-mode
    * discipline for DP pipelines: the mechanism's transform is exactly
    * the production one, but replayable, so the release is assertable
    * in CI; production swaps the seeded uniform for a CSPRNG draw and
    * nothing else changes. The true counts ride alongside for
    * calibration audits of the mechanism itself (never published).
    *
    * Scale shape: one combinable groupBy to the |langs|-row histogram;
    * the mechanism is a per-row scalar expression. */
  def dpHistQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val eps = 1.0
    // u in (0,1): 60-bit hash reduced to 1e6 grid, offset half a cell
    val u = (Hashing.md5Long60(concat(lit("dp:"), $"lang")) % 1000000)
      .cast("double").plus(0.5).divide(1000000.0)
    val lap = when(u < 0.5, lit(1.0 / eps) * log(u * 2.0))
      .otherwise(lit(-1.0 / eps) * log((lit(1.0) - u) * 2.0))
    t(s, dir, "documents")
      .groupBy($"lang").agg(count(lit(1)).as("n_true"))
      .select($"lang", $"n_true".cast("long").as("n_true"),
        round(lap, 6).as("noise"),
        greatest(lit(0L),
          floor($"n_true".cast("double") + lap).cast("long"))
          .as("n_released"),
        lit(eps).as("epsilon"))
      .orderBy($"lang")
  }

  val dpHistSql: String =
    """WITH h AS (SELECT lang, COUNT(*) AS n_true FROM documents GROUP BY lang),
      |m AS (
      |  SELECT lang, n_true,
      |    (CAST(('0x' || substr(md5('dp:' || lang), 1, 15))::UBIGINT::BIGINT
      |      % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS u
      |  FROM h),
      |n AS (
      |  SELECT lang, n_true,
      |    CASE WHEN u < 0.5 THEN 1.0 * ln(u * 2.0)
      |         ELSE -1.0 * ln((1.0 - u) * 2.0) END AS lap
      |  FROM m)
      |SELECT lang, CAST(n_true AS BIGINT) AS n_true,
      |  ROUND(lap, 6) AS noise,
      |  GREATEST(0, CAST(FLOOR(CAST(n_true AS DOUBLE) + lap) AS BIGINT))
      |    AS n_released,
      |  CAST(1.0 AS DOUBLE) AS epsilon
      |FROM n ORDER BY lang""".stripMargin

  /** q_text_secrets entry: SECRET / CREDENTIAL detection — the safety
    * filter a training-data pipeline runs before [[redactQ]]'s PII
    * pass, because leaked API keys in a corpus are verbatim-memorizable
    * and revocation-critical. Two detector classes: (a) a structural
    * pattern (AWS-style `AKIA` key id), (b) the GENERIC high-entropy
    * screen — any long alnum token whose character Shannon entropy
    * clears 3.0 bits — which is how scanners catch credentials with no
    * known prefix. The fixture plants, per doc, a deterministic key id,
    * a `tok_`+md5 bearer token on every 4th doc, and a LOW-entropy
    * 24×'a' decoy on every 5th doc that matches the length screen but
    * must NOT be flagged — the entropy gate is doing real work, not
    * just length matching. Redaction rides along.
    *
    * Scale shape: detection is a narrow regex map over the scan; the
    * char-frequency entropy runs only on CANDIDATE tokens (≥ 20 alnum
    * chars — a few per doc, not corpus tokens), keyed by (doc, token)
    * so group size is token-length-bounded. Determinism: entropy terms
    * round to 9 dp and sum as DECIMAL(28,9) (the [[graft.ops.Text]]
    * entropy contract); the ≥ 3.0-bit flag compares that exact
    * decimal. */
  def secretsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyRe = "AKIA[0-9A-F]{16}"
    val tokRe = "tok_[0-9a-f]{32}"
    val candRe = "[A-Za-z0-9_]{20,}"
    val planted = t(s, dir, "documents").select($"doc_id",
      concat($"text",
        lit(" key AKIA"),
        upper(substring(md5($"doc_id".cast("string")), 1, 16)),
        when($"doc_id" % 4 === 0,
          concat(lit(" tok_"), md5(concat($"doc_id".cast("string"), lit("t")))))
          .otherwise(lit("")),
        when($"doc_id" % 5 === 0, lit(" aaaaaaaaaaaaaaaaaaaaaaaa"))
          .otherwise(lit(""))).as("body"))
    // r15: the per-token char entropy is a pure function of the token,
    // so the explode-chars → groupBy(doc,tok,ch) → groupBy(doc,tok) →
    // groupBy(doc) three-shuffle cascade (8-Exchange plan, 9.0 s at
    // sf0.1 — the suite's slowest query) collapses into ONE map-side
    // projection with higher-order functions: per distinct token,
    // per distinct char, p = in-token frequency; terms round to 9 dp
    // and merge as DECIMAL exactly like the old sum(decimal) — decimal
    // addition is exact and order-free, so every h (and the ≥3.0 flag)
    // is bit-identical to the shuffled form. n_candidates counted the
    // DISTINCT (doc, tok) groups; array_distinct preserves that. Docs
    // with no candidate token were dropped by the old inner join; the
    // planted AKIA key guarantees ≥1 candidate per doc, and the filter
    // keeps the old semantics explicit. The plan is now scan → project
    // → TakeOrderedAndProject: zero exchanges.
    val hExpr =
      """aggregate(
        |  array_distinct(transform(sequence(1, length(tok)),
        |    i -> substring(tok, i, 1))),
        |  cast(0 as decimal(20,9)),
        |  (acc, c) -> cast(acc + cast(round(
        |    -(size(filter(transform(sequence(1, length(tok)),
        |        i -> substring(tok, i, 1)), x -> x = c))
        |      / cast(length(tok) as double))
        |    * ln(size(filter(transform(sequence(1, length(tok)),
        |        i -> substring(tok, i, 1)), x -> x = c))
        |      / cast(length(tok) as double)) / ln(2.0D), 9)
        |    as decimal(20,9)) as decimal(20,9)))""".stripMargin
    planted
      .withColumn("toks",
        array_distinct(regexp_extract_all($"body", lit(candRe), lit(0))))
      .filter(size($"toks") > 0)
      .select($"doc_id",
        size(regexp_extract_all($"body", lit(keyRe), lit(0))).as("n_keys"),
        size($"toks").as("n_candidates"),
        size(expr(s"filter(toks, tok -> $hExpr >= 3.0)"))
          .as("n_high_entropy"),
        regexp_replace(regexp_replace($"body", keyRe, "[KEY]"),
          tokRe, "[TOKEN]").as("redacted"))
      .orderBy($"doc_id")
      .limit(300)
  }

  val secretsSql: String =
    """WITH b AS (
      |  SELECT doc_id, text || ' key AKIA'
      |    || upper(substr(md5(doc_id::VARCHAR), 1, 16))
      |    || CASE WHEN doc_id % 4 = 0
      |         THEN ' tok_' || md5(doc_id::VARCHAR || 't') ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0
      |         THEN ' aaaaaaaaaaaaaaaaaaaaaaaa' ELSE '' END AS body
      |  FROM documents),
      |cand AS (
      |  SELECT doc_id,
      |    unnest(regexp_extract_all(body, '[A-Za-z0-9_]{20,}')) AS tok
      |  FROM b),
      |f AS (
      |  SELECT doc_id, tok, ch, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, tok,
      |          unnest(list_transform(range(1, length(tok) + 1),
      |            i -> tok[i:i])) AS ch
      |        FROM cand)
      |  GROUP BY 1, 2, 3),
      |ent AS (
      |  SELECT doc_id, tok,
      |    SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / length(tok))
      |      * LN(CAST(c AS DOUBLE) / length(tok)) / LN(2), 9)
      |      AS DECIMAL(28,9))) AS h
      |  FROM f GROUP BY 1, 2),
      |per AS (
      |  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_candidates,
      |    CAST(SUM(CASE WHEN h >= 3.0 THEN 1 ELSE 0 END) AS INT)
      |      AS n_high_entropy
      |  FROM ent GROUP BY doc_id)
      |SELECT b.doc_id,
      |  CAST(len(regexp_extract_all(body, 'AKIA[0-9A-F]{16}')) AS INT)
      |    AS n_keys,
      |  per.n_candidates, per.n_high_entropy,
      |  regexp_replace(regexp_replace(body,
      |    'AKIA[0-9A-F]{16}', '[KEY]', 'g'),
      |    'tok_[0-9a-f]{32}', '[TOKEN]', 'g') AS redacted
      |FROM b JOIN per ON b.doc_id = per.doc_id
      |ORDER BY b.doc_id LIMIT 300""".stripMargin

  /** q_privacy_rr entry: LOCAL differential privacy by generalized
    * RANDOMIZED RESPONSE — the collection-side counterpart of
    * [[dpHistQ]]'s curator-side Laplace release: each event reports
    * its TRUE type with probability p = 3/4 and each of the other 4
    * types with q = 1/16 (ε = ln(p/q) = ln 12 ≈ 2.48), then the
    * aggregator DEBIASES the noisy counts with the closed form
    * n̂_v = (16·f_v − n)/11 and the true counts ride along as the
    * accuracy audit. Rational design probabilities make the mechanism
    * EXACT integer arithmetic: the per-row coin is
    * md5(event_id) mod 16 (< 12 → truth; else the (r−12)-th other
    * value in sorted-type order) — the pinned cross-engine hash, so
    * even the "random" reports are bit-reproducible and the oracle
    * compares estimates exactly.
    *
    * Scale shape: the mechanism is a narrow projection (broadcast
    * 5-row type dimension for index mapping); reported and true
    * counts are two combinable groupBys; the total arrives as a
    * broadcast 1-row frame. */
  def rrQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val e = t(s, dir, "events")
    val types = e.select($"event_type").distinct()
      .withColumn("ti",
        row_number().over(Window.orderBy($"event_type")) - 1)
    val coin = Hashing.md5Long60(concat($"event_id".cast("string"),
      lit(":rr"))) % 16
    val rep = e.join(broadcast(types), "event_type")
      .withColumn("r", coin)
      .withColumn("rep_ti",
        when($"r" < 12, $"ti")
          .otherwise(when($"r" - 12 < $"ti", $"r" - 12)
            .otherwise($"r" - 12 + 1)))
    val f = rep.join(broadcast(types
        .select($"ti".as("rep_ti"), $"event_type".as("reported"))), "rep_ti")
      .groupBy($"reported").agg(count(lit(1)).as("f"))
    val truth = e.groupBy($"event_type").agg(count(lit(1)).as("n_true"))
    val tot = e.agg(count(lit(1)).as("n"))
    truth.join(f, $"event_type" === $"reported")
      .crossJoin(broadcast(tot))
      .select($"event_type", $"n_true", $"f".as("n_reported"),
        round((lit(16d) * $"f" - $"n") / 11d, 6).as("est"),
        round(abs((lit(16d) * $"f" - $"n") / 11d - $"n_true"), 6)
          .as("abs_err"),
        expr(s"(10000 * abs(16 * f - n - 11 * n_true)) div (11 * n)")
          .as("err_share_bp"))
      .orderBy($"event_type")
  }

  val rrSql: String =
    """WITH e AS (SELECT event_id, event_type FROM events),
      |types AS (
      |  SELECT event_type,
      |    ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS ti
      |  FROM (SELECT DISTINCT event_type FROM e)),
      |rep AS (
      |  SELECT e.event_type, t.ti,
      |    ('0x' || substr(md5(e.event_id::VARCHAR || ':rr'), 1, 15))
      |      ::UBIGINT::BIGINT % 16 AS r
      |  FROM e JOIN types t ON e.event_type = t.event_type),
      |rp AS (
      |  SELECT CASE WHEN r < 12 THEN ti
      |              WHEN r - 12 < ti THEN r - 12
      |              ELSE r - 12 + 1 END AS rep_ti
      |  FROM rep),
      |f AS (
      |  SELECT t.event_type AS reported, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM rp JOIN types t ON rp.rep_ti = t.ti
      |  GROUP BY 1),
      |truth AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
      |  FROM e GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
      |SELECT truth.event_type, n_true, f AS n_reported,
      |  ROUND((16.0::DOUBLE * f - n) / 11, 6) AS est,
      |  ROUND(ABS((16.0::DOUBLE * f - n) / 11 - n_true), 6) AS abs_err,
      |  (10000 * ABS(16 * f - n - 11 * n_true)) // (11 * n)
      |    AS err_share_bp
      |FROM truth JOIN f ON truth.event_type = f.reported, tot
      |ORDER BY truth.event_type""".stripMargin

  /** q_privacy_dp_mean entry: ε-DP CLIPPED-MEAN release of per-user
    * spend by event type — the third mechanism of the privacy family
    * (histogram = counting query, randomized response = local DP, this
    * = the bounded-sensitivity NUMERIC aggregate every DP deployment
    * actually releases). Per-user totals clip at C (the contribution
    * bound that caps sensitivity at C/n per user), the Laplace noise
    * on the SUM has scale C/ε, and the released mean divides by the
    * true user count. The clip fraction is the utility-audit column:
    * a cap that bites 30% of users biases the mean more than the
    * noise does.
    *
    * Determinism: same pinned-uniform Laplace derivation as
    * [[dpHistQ]] (60-bit md5 → 1e6 grid → inverse CDF) keyed by the
    * release group, so both engines draw the identical noise — the
    * pattern that makes a randomized mechanism oracle-testable.
    * Scale: one (user, type) combinable collapse, one 5-row release
    * frame. */
  def dpMeanQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val eps = 1.0
    val capCents = 100000L // clip per-user totals at 1000.00
    val perUser = t(s, dir, "events")
      .groupBy($"event_type", $"user_id")
      .agg(sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
      .select($"event_type",
        least($"cents", lit(capCents)).as("clipped"),
        ($"cents" > capCents).cast("long").as("at_cap"))
    val u = (Hashing.md5Long60(concat(lit("dpmean:"), $"event_type"))
      % 1000000).cast("double").plus(0.5).divide(1000000.0)
    val lap = when(u < 0.5, lit(capCents / eps) * log(u * 2.0))
      .otherwise(lit(-capCents / eps) * log((lit(1.0) - u) * 2.0))
    perUser.groupBy($"event_type")
      .agg(count(lit(1)).as("n_users"),
        sum($"clipped").as("csum"),
        sum($"at_cap").as("n_clipped"))
      .select($"event_type", $"n_users", $"n_clipped",
        round($"n_clipped".cast("double") / $"n_users", 6).as("clip_frac"),
        round($"csum".cast("double") / $"n_users" / 100.0, 6)
          .as("true_mean"),
        round(lap / 100.0, 6).as("noise"),
        round(($"csum".cast("double") + lap) / $"n_users" / 100.0, 6)
          .as("released_mean"),
        lit(eps).as("epsilon"))
      .orderBy($"event_type")
  }

  val dpMeanSql: String =
    """WITH pu AS (
      |  SELECT event_type, user_id,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |cl AS (
      |  SELECT event_type, LEAST(cents, 100000) AS clipped,
      |    CASE WHEN cents > 100000 THEN 1 ELSE 0 END AS at_cap
      |  FROM pu),
      |ag AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(clipped) AS BIGINT) AS csum,
      |    CAST(SUM(at_cap) AS BIGINT) AS n_clipped
      |  FROM cl GROUP BY 1),
      |m AS (
      |  SELECT *,
      |    (CAST(('0x' || substr(md5('dpmean:' || event_type), 1, 15))
      |      ::UBIGINT::BIGINT % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS u
      |  FROM ag),
      |n AS (
      |  SELECT *, CASE WHEN u < 0.5 THEN 100000.0 * ln(u * 2.0)
      |    ELSE -100000.0 * ln((1.0 - u) * 2.0) END AS lap
      |  FROM m)
      |SELECT event_type, n_users, n_clipped,
      |  ROUND(CAST(n_clipped AS DOUBLE) / n_users, 6) AS clip_frac,
      |  ROUND(CAST(csum AS DOUBLE) / n_users / 100.0, 6) AS true_mean,
      |  ROUND(lap / 100.0, 6) AS noise,
      |  ROUND((CAST(csum AS DOUBLE) + lap) / n_users / 100.0, 6)
      |    AS released_mean,
      |  CAST(1.0 AS DOUBLE) AS epsilon
      |FROM n ORDER BY event_type""".stripMargin

  private val SuppressK = 8L // minimum publishable cell size

  /** q_privacy_suppress entry: SMALL-CELL SUPPRESSION with
    * COMPLEMENTARY suppression — the tabular-release discipline (the
    * census-bureau practice) the DP mechanisms here sit beside: cells
    * of the nation × market-segment customer cross-tab below
    * [[SuppressK]] are primary-suppressed, and any nation with EXACTLY
    * ONE primary suppression also suppresses its smallest released
    * cell — because a single suppressed cell is recoverable from the
    * published nation margin, which is the subtraction attack
    * complementary suppression exists to block. Per nation: cell
    * counts, primary/complementary suppression counts, and
    * released/suppressed mass (the margins a reviewer checks).
    *
    * Scale shape: one combinable cross-tab aggregate, then windows over
    * the |nations|×|segments| ≤ 125-cell frame — release auditing
    * never touches row-level data again. All-integer arithmetic. */
  def suppressQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val cells = t(s, dir, "customer")
      .join(t(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), $"c_mktsegment".as("seg"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("primary", $"cnt" < SuppressK)
    val byNation = Window.partitionBy($"nation")
    val relRank = Window.partitionBy($"nation", $"primary")
      .orderBy($"cnt", $"seg")
    val marked = cells
      .withColumn("n_primary",
        sum(when($"primary", 1L).otherwise(0L)).over(byNation))
      .withColumn("rel_rank", row_number().over(relRank))
      .withColumn("complementary",
        !$"primary" && $"n_primary" === 1 && $"rel_rank" === 1)
      .withColumn("suppressed", $"primary" || $"complementary")
    marked.groupBy($"nation")
      .agg(count(lit(1)).as("n_cells"),
        sum(when($"primary", 1L).otherwise(0L)).as("n_primary"),
        sum(when($"complementary", 1L).otherwise(0L)).as("n_complementary"),
        sum(when(!$"suppressed", $"cnt").otherwise(0L)).as("released_mass"),
        sum(when($"suppressed", $"cnt").otherwise(0L)).as("suppressed_mass"))
      .orderBy($"nation")
  }

  val suppressSql: String =
    s"""WITH cells AS (
       |  SELECT n_name AS nation, c_mktsegment AS seg, COUNT(*) AS cnt,
       |    COUNT(*) < $SuppressK AS pri
       |  FROM customer JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2),
       |marked AS (
       |  SELECT *,
       |    SUM(CASE WHEN pri THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY nation) AS n_primary,
       |    ROW_NUMBER() OVER (PARTITION BY nation, pri
       |      ORDER BY cnt, seg) AS rel_rank
       |  FROM cells),
       |fin AS (
       |  SELECT *,
       |    (NOT pri) AND n_primary = 1 AND rel_rank = 1 AS comp,
       |    pri OR ((NOT pri) AND n_primary = 1 AND rel_rank = 1)
       |      AS suppressed
       |  FROM marked)
       |SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_cells,
       |  CAST(SUM(CASE WHEN pri THEN 1 ELSE 0 END) AS BIGINT) AS n_primary,
       |  CAST(SUM(CASE WHEN comp THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_complementary,
       |  CAST(SUM(CASE WHEN NOT suppressed THEN cnt ELSE 0 END) AS BIGINT)
       |    AS released_mass,
       |  CAST(SUM(CASE WHEN suppressed THEN cnt ELSE 0 END) AS BIGINT)
       |    AS suppressed_mass
       |FROM fin GROUP BY nation ORDER BY nation""".stripMargin

  /** q_privacy_tclose entry: T-CLOSENESS audit (Li, Li & Venkatasubramanian,
    * ICDE 2007) — the release gate k-anonymity and l-diversity miss:
    * a class can be large AND diverse yet still leak if its SENSITIVE
    * distribution differs from the table's (the "everyone in this
    * class is in the top balance band" attack). For each
    * quasi-identifier class (nationkey, segment) — the same classes
    * [[kanonQ]] audits — compute the Earth-Mover's Distance between
    * the class's account-balance band distribution and the global one
    * over the ORDERED bands (1000-width, the l-diversity bucketing),
    * EMD = Σ_k |cumulative(p−q)| / (m−1), and flag classes past
    * t = 0.2.
    *
    * Determinism: the cumulative difference at band k is carried as
    * the exact integer N·C_k − n_c·G_k (class/global cumulative
    * counts cross-multiplied), so EMD is ONE division of exact
    * bigints, rounded to 6 dp — partitioning-independent.
    *
    * Scale shape: two combinable groupBys (class×band, band) over one
    * scan; the EMD windows run on the |classes|×|bands| grid (125×11
    * here — bounded by the released table's dimensionality, never by
    * row count), with the band dimension and the 1-row total
    * BROADCAST. */
  def tcloseQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cust = t(s, dir, "customer")
      .select($"c_nationkey".as("nationkey"), $"c_mktsegment".as("segment"),
        floor($"c_acctbal" / 1000).cast("long").as("b"))
    val global = cust.groupBy($"b").agg(count(lit(1)).as("g"))
    val totals = cust.agg(count(lit(1)).as("nt"))
    val classes = cust.groupBy($"nationkey", $"segment")
      .agg(count(lit(1)).as("nc"))
    val classCnt = cust.groupBy($"nationkey", $"segment", $"b")
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy($"nationkey", $"segment").orderBy($"b")
    val wf = Window.partitionBy($"nationkey", $"segment")
    classes.crossJoin(broadcast(global)).crossJoin(broadcast(totals))
      .join(classCnt, Seq("nationkey", "segment", "b"), "left")
      .withColumn("c", coalesce($"c", lit(0L)))
      .withColumn("ck", sum($"c").over(wc))
      .withColumn("gk", sum($"g").over(wc))
      .withColumn("rn", row_number().over(wc))
      .withColumn("m", count(lit(1)).over(wf))
      .filter($"rn" < $"m")
      .groupBy($"nationkey", $"segment")
      .agg(max($"nc").as("class_size"), max($"nt").as("nt"),
        max($"m").as("m"),
        sum(abs($"nt" * $"ck" - $"nc" * $"gk")).as("emdnum"))
      .select($"nationkey", $"segment",
        $"class_size".cast("long").as("class_size"),
        round($"emdnum".cast("double") /
          ($"class_size" * $"nt" * ($"m" - 1)).cast("double"), 6).as("emd"))
      .withColumn("exceeds_t", $"emd" > 0.2)
      .orderBy($"nationkey", $"segment")
  }

  val tcloseSql: String =
    """WITH cust AS (
      |  SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
      |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS b
      |  FROM customer),
      |global AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS g FROM cust GROUP BY 1),
      |totals AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM cust),
      |classes AS (
      |  SELECT nationkey, segment, CAST(COUNT(*) AS BIGINT) AS nc
      |  FROM cust GROUP BY 1, 2),
      |cc AS (
      |  SELECT nationkey, segment, b, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM cust GROUP BY 1, 2, 3),
      |grid AS (
      |  SELECT cl.nationkey, cl.segment, cl.nc, t.nt, g.b, g.g,
      |    COALESCE(cc.c, 0) AS c
      |  FROM classes cl CROSS JOIN global g CROSS JOIN totals t
      |  LEFT JOIN cc ON cc.nationkey = cl.nationkey
      |    AND cc.segment = cl.segment AND cc.b = g.b),
      |cum AS (
      |  SELECT nationkey, segment, nc, nt,
      |    SUM(c) OVER (PARTITION BY nationkey, segment ORDER BY b) AS ck,
      |    SUM(g) OVER (PARTITION BY nationkey, segment ORDER BY b) AS gk,
      |    ROW_NUMBER() OVER (PARTITION BY nationkey, segment ORDER BY b) AS rn,
      |    COUNT(*) OVER (PARTITION BY nationkey, segment) AS m
      |  FROM grid),
      |agg AS (
      |  SELECT nationkey, segment, MAX(nc) AS class_size, MAX(nt) AS nt,
      |    MAX(m) AS m,
      |    SUM(ABS(nt * ck - nc * gk)) AS emdnum
      |  FROM cum WHERE rn < m GROUP BY 1, 2)
      |SELECT nationkey, segment, CAST(class_size AS BIGINT) AS class_size,
      |  ROUND(CAST(emdnum AS DOUBLE)
      |    / CAST(class_size * nt * (m - 1) AS DOUBLE), 6) AS emd,
      |  ROUND(CAST(emdnum AS DOUBLE)
      |    / CAST(class_size * nt * (m - 1) AS DOUBLE), 6) > 0.2 AS exceeds_t
      |FROM agg ORDER BY nationkey, segment""".stripMargin

  /** q_privacy_exponential entry: the EXPONENTIAL MECHANISM (McSherry &
    * Talwar, FOCS 2007) — ε-DP selection of a DISCRETE output, the
    * third of the three canonical DP primitives after the Laplace
    * release ([[dpHistQ]]) and randomized response ([[rrQ]]): when the
    * release is a category (the majority language per source, the best
    * split point, the top query), adding noise to counts and arg-maxing
    * leaks through ties — the exponential mechanism instead samples
    * candidate r with probability ∝ exp(ε·score(r)/(2Δ)). Implemented
    * by the Gumbel-max identity (argmax of score/(2Δ/ε) + Gumbel noise
    * IS an exponential-mechanism draw — how production DP-SQL engines
    * implement it): per candidate, a pinned uniform (60-bit md5 → 1e6
    * grid, the [[dpHistQ]] derivation, keyed by source × candidate) →
    * Gumbel −ln(−ln u), added to ε·count/2 (Δ = 1 for disjoint counts).
    *
    * The candidate DOMAIN is the global language set — public,
    * data-independent per source (a per-source support set would leak
    * which languages exist in a source) — hence the deliberate
    * domain-grid cross join (audit-whitelisted, |langs| per source).
    * The true majority is reported alongside as the utility audit (the
    * [[dpMeanQ]] clip-fraction pattern): at ε = 1 most sources release
    * their true winner; disagreements mark close races, which is
    * exactly the mechanism's privacy working.
    *
    * Scale: one combinable (source, lang) count, a bounded domain grid,
    * one per-source top-1 window. Gumbel keys differ at O(1) while ln
    * ulp noise is 1e-16 — argmax is engine-stable. */
  def exponentialQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val eps = 1.0
    val docs = t(s, dir, "documents")
    val counts = docs.groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n"))
    val grid = docs.select($"source").distinct()
      .crossJoin(broadcast(docs.select($"lang").distinct()))
      .join(counts, Seq("source", "lang"), "left")
      .withColumn("n", coalesce($"n", lit(0L)))
    val u = (Hashing.md5Long60(concat(lit("em:"), $"source", lit(":"),
        $"lang")) % 1000000).cast("double").plus(0.5).divide(1000000.0)
    val keyed = grid
      .withColumn("gumbel", -log(-log(u)))
      .withColumn("key", lit(eps / 2.0) * $"n" + $"gumbel")
    val wSel = Window.partitionBy($"source").orderBy($"key".desc, $"lang")
    val wTrue = Window.partitionBy($"source").orderBy($"n".desc, $"lang")
    keyed
      .withColumn("rn", row_number().over(wSel))
      .withColumn("true_lang", first($"lang").over(wTrue))
      .filter($"rn" === 1)
      .select($"source", $"lang".as("lang_released"),
        $"n".cast("long").as("n_released_lang"),
        $"true_lang", ($"lang" === $"true_lang").as("matches_true"),
        lit(eps).as("epsilon"))
      .orderBy($"source")
  }

  val exponentialSql: String =
    """WITH counts AS (
      |  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
      |grid AS (
      |  SELECT s.source, l.lang, COALESCE(c.n, 0) AS n
      |  FROM (SELECT DISTINCT source FROM documents) s
      |  CROSS JOIN (SELECT DISTINCT lang FROM documents) l
      |  LEFT JOIN counts c ON c.source = s.source AND c.lang = l.lang),
      |keyed AS (
      |  SELECT *,
      |    -ln(-ln((CAST(('0x' || substr(md5('em:' || source || ':' || lang),
      |        1, 15))::UBIGINT::BIGINT % 1000000 AS DOUBLE) + 0.5)
      |      / 1000000.0)) AS gumbel
      |  FROM grid),
      |sel AS (
      |  SELECT *, 0.5 * n + gumbel AS key,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY 0.5 * n + gumbel DESC, lang) AS rn,
      |    first_value(lang) OVER (PARTITION BY source
      |      ORDER BY n DESC, lang) AS true_lang
      |  FROM keyed)
      |SELECT source, lang AS lang_released,
      |  CAST(n AS BIGINT) AS n_released_lang, true_lang,
      |  lang = true_lang AS matches_true, CAST(1.0 AS DOUBLE) AS epsilon
      |FROM sel WHERE rn = 1 ORDER BY source""".stripMargin

  /** q_privacy_ldiv entry: ℓ-DIVERSITY audit (Machanavajjhala et al.
    * 2007) — the refinement k-anonymity ([[kanonQ]]) misses: a class
    * can be large yet reveal everyone's sensitive value if that value
    * is near-constant. Quasi-identifiers here are (nationkey,
    * account-balance band of width 2000) and the sensitive attribute
    * is the market segment (the INVERSE framing of kanonQ, which
    * treats segment as quasi-identifying — together they audit both
    * release shapes). Per class: distinct-ℓ, the top sensitive count
    * r₁, RECURSIVE (c, ℓ)-diversity at (c=3, ℓ=2) — r₁ < 3·(n − r₁),
    * an exact integer test — and ENTROPY ℓ-diversity: H(class) =
    * −Σ (rᵢ/n)·ln(rᵢ/n) ≥ ln 2, i.e. effective diversity exp(H) ≥ 2.
    *
    * Scale shape: one combinable groupBy to (class, sensitive) counts
    * (bounded by |nations|·|bands|·|segments|), then class-bounded
    * frames. Determinism: counts and the recursive test are exact
    * integers; entropy terms are the shared-order IEEE chain rounded
    * to 12 dp and summed as DECIMAL(38,12) (order-independent), the
    * ln 2 threshold computed as the same expression in both engines. */
  def ldivQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val cnt = t(s, dir, "customer")
      .groupBy($"c_nationkey".as("nationkey"),
        floor($"c_acctbal" / lit(2000.0)).cast("long").as("band"),
        $"c_mktsegment".as("seg"))
      .agg(count(lit(1)).as("r"))
    val cls = Window.partitionBy($"nationkey", $"band")
    val frac = $"r".cast("double") / $"n".cast("double")
    cnt
      .withColumn("n", sum($"r").over(cls))
      .withColumn("term",
        round(-(frac * log(frac)), 12).cast("decimal(38,12)"))
      .groupBy($"nationkey", $"band")
      .agg(max($"n").as("n"), count(lit(1)).as("l_distinct"),
        max($"r").as("r1"), sum($"term").cast("double").as("h"))
      .select($"nationkey", $"band",
        $"n".cast("long").as("n"),
        $"l_distinct".cast("long").as("l_distinct"),
        $"r1".cast("long").as("r1"),
        ($"r1" < lit(3) * ($"n" - $"r1")).cast("int").as("rec_3_2"),
        round($"h", 6).as("entropy"),
        ($"h" >= log(lit(2.0))).cast("int").as("entropy_2"))
      .orderBy($"nationkey", $"band")
  }

  val ldivSql: String =
    """WITH cnt AS (
      |  SELECT c_nationkey AS nationkey,
      |    CAST(FLOOR(c_acctbal / CAST(2000 AS DOUBLE)) AS BIGINT) AS band,
      |    c_mktsegment AS seg, COUNT(*) AS r
      |  FROM customer GROUP BY 1, 2, 3),
      |wn AS (
      |  SELECT *, SUM(r) OVER (PARTITION BY nationkey, band) AS n
      |  FROM cnt),
      |cls AS (
      |  SELECT nationkey, band, MAX(n) AS n, COUNT(*) AS l_distinct,
      |    MAX(r) AS r1,
      |    CAST(SUM(CAST(ROUND(-((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
      |      * LN(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))), 12)
      |      AS DECIMAL(38,12))) AS DOUBLE) AS h
      |  FROM wn GROUP BY 1, 2)
      |SELECT nationkey, band, CAST(n AS BIGINT) AS n,
      |  CAST(l_distinct AS BIGINT) AS l_distinct,
      |  CAST(r1 AS BIGINT) AS r1,
      |  CAST(CASE WHEN r1 < 3 * (n - r1) THEN 1 ELSE 0 END AS INT)
      |    AS rec_3_2,
      |  ROUND(h, 6) AS entropy,
      |  CAST(CASE WHEN h >= LN(CAST(2 AS DOUBLE)) THEN 1 ELSE 0 END AS INT)
      |    AS entropy_2
      |FROM cls ORDER BY nationkey, band""".stripMargin

  /** q_privacy_dp_quantile entry: DIFFERENTIALLY-PRIVATE MEDIAN of the
    * order-value distribution via the EXPONENTIAL MECHANISM over
    * inter-value intervals (Smith 2011; the standard DP quantile) —
    * candidate = the open interval between consecutive distinct sorted
    * values, utility u(I) = −|rank(I) − n/2| (how many records the
    * interval's rank misses the median by), selection probability
    * ∝ width·exp(ε·u/2), released value = the winning interval's
    * midpoint. ε = 1. Sampling is the seeded replayable Gumbel-argmax
    * ([[exponentialQ]] contract): key = ln(width) + (ε/2)·u + Gumbel,
    * one deterministic argmax.
    *
    * Scale shape: distinct-value collapse (combinable) → one
    * distributed [[Rank.orderedPrefix]] pass over the value-bounded
    * frame → a global argmax (TakeOrdered, no full sort of raw rows,
    * no SinglePartition window). True median
    * = the exact lower-median order statistic, reported beside the
    * release so the privacy/accuracy gap is visible. Determinism:
    * ranks and widths exact (DECIMAL cents), one shared IEEE key
    * chain, ties broken on value. */
  def dpQuantileQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val eps = 1.0
    val vals = t(s, dir, "orders")
      .groupBy($"o_totalprice".cast("decimal(18,2)").as("v"))
      .agg(count(lit(1)).as("c"))
    // distributed prefix counts + the interval upper end in ONE Rank
    // pass: `vnext` is the pass's global k-lead (r15) — in-bucket
    // window lead plus a broadcast bucket-head patch — replacing the
    // r13–r14 equi self-join on rn+1, which shuffled every distinct
    // value a SECOND time keyed by rn. Filtering vnext IS NOT NULL
    // drops the last support point exactly as the inner join did. The
    // exponential-mechanism winner stays a distributed top-1
    // (TakeOrdered), not a rank-then-filter.
    val ranked = Rank.orderedPrefix(vals, order = Seq($"v"),
      cums = Seq(Rank.Cum($"c", "cum")),
      totals = Seq(($"c", "n")),
      leads = Seq(Rank.Lead($"v", "vnext")))
    val iv = ranked.filter($"vnext".isNotNull)
    val u = (Hashing.md5Long60(concat(lit("dpq:"), $"v".cast("string")))
      % 1000000).cast("double").plus(0.5).divide(1000000.0)
    val keyed = iv
      .withColumn("util",
        -abs($"cum".cast("double") - $"n".cast("double") / 2))
      .withColumn("key",
        log(($"vnext" - $"v").cast("double")) +
          lit(eps / 2.0) * $"util" + -log(-log(u)))
    val winner = keyed.orderBy($"key".desc, $"v").limit(1)
    val trueMed = ranked
      .filter($"cum" >= expr("(n + 1) div 2") &&
        $"cum" - $"c" < expr("(n + 1) div 2"))
      .select($"v".cast("double").as("true_median"),
        $"n".cast("long").as("n"))
    winner
      .select($"v", $"vnext",
        abs($"cum".cast("double") - $"n".cast("double") / 2)
          .cast("long").as("rank_miss"))
      .crossJoin(broadcast(trueMed))
      .select($"n", $"true_median",
        round((($"v" + $"vnext") / 2).cast("double"), 6).as("released"),
        $"rank_miss", lit(eps).as("epsilon"))
  }

  val dpQuantileSql: String =
    """WITH vals AS (
      |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v, COUNT(*) AS c
      |  FROM orders GROUP BY 1),
      |iv AS (
      |  SELECT v, c,
      |    SUM(c) OVER () AS n,
      |    SUM(c) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    lead(v, 1) OVER (ORDER BY v) AS vnext
      |  FROM vals),
      |keyed AS (
      |  SELECT *,
      |    -ABS(CAST(cum AS DOUBLE) - CAST(n AS DOUBLE) / 2) AS util,
      |    LN(CAST(vnext - v AS DOUBLE))
      |      + 0.5 * (-ABS(CAST(cum AS DOUBLE) - CAST(n AS DOUBLE) / 2))
      |      + -LN(-LN((CAST(('0x' || substr(md5('dpq:' || v::VARCHAR),
      |          1, 15))::UBIGINT::BIGINT % 1000000 AS DOUBLE) + 0.5)
      |        / 1000000.0)) AS key
      |  FROM iv WHERE vnext IS NOT NULL),
      |winner AS (
      |  SELECT * FROM keyed ORDER BY key DESC, v LIMIT 1),
      |tm AS (
      |  SELECT CAST(v AS DOUBLE) AS true_median, CAST(n AS BIGINT) AS n
      |  FROM iv
      |  WHERE cum >= (n + 1) // 2
      |  ORDER BY v LIMIT 1)
      |SELECT tm.n, tm.true_median,
      |  ROUND(CAST((w.v + w.vnext) / 2 AS DOUBLE), 6) AS released,
      |  CAST(ABS(CAST(w.cum AS DOUBLE) - CAST(w.n AS DOUBLE) / 2) AS BIGINT)
      |    AS rank_miss,
      |  CAST(1.0 AS DOUBLE) AS epsilon
      |FROM winner w CROSS JOIN tm""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_privacy_dp_quantile" -> dpQuantileQ,
    "q_privacy_ldiv" -> ldivQ,
    "q_privacy_exponential" -> exponentialQ,
    "q_privacy_tclose" -> tcloseQ,
    "q_privacy_suppress" -> suppressQ,
    "q_text_pii" -> redactQ,
    "q_text_secrets" -> secretsQ,
    "q_privacy_rr" -> rrQ,
    "q_privacy_kanon" -> kanonQ,
    "q_privacy_dp_hist" -> dpHistQ,
    "q_privacy_dp_mean" -> dpMeanQ)

  def oracle: Map[String, String] = Map(
    "q_privacy_dp_quantile" -> dpQuantileSql,
    "q_privacy_ldiv" -> ldivSql,
    "q_privacy_exponential" -> exponentialSql,
    "q_privacy_tclose" -> tcloseSql,
    "q_privacy_suppress" -> suppressSql,
    "q_text_pii" -> redactSql,
    "q_text_secrets" -> secretsSql,
    "q_privacy_rr" -> rrSql,
    "q_privacy_kanon" -> kanonSql,
    "q_privacy_dp_hist" -> dpHistSql,
    "q_privacy_dp_mean" -> dpMeanSql)
}
