"""Statistical-learning and graph-analysis faces: multi-predictor OLS
by distributed normal equations, token/label mutual information
(feature selection), BFS shortest paths (proven against a DuckDB
recursive CTE — an independent traversal engine), and a trigram-set
string-similarity join (the inverted-index shape that replaces
all-pairs levenshtein at scale).

Cross-engine float discipline (functions/compat.py): every aggregate
moment is an exact DECIMAL(20,6) sum; scalar formulas on the finalized
doubles are SINGLE-SOURCED as SQL strings evaluated by both engines
(`F.expr` on the Spark side, pasted verbatim into the oracle), so the
IEEE op sequence is identical and hashes cannot diverge. Log-domain
scores use the established 1e-9 fixed-point floor; set-similarity uses
pure integer arithmetic (scaled integer division, no doubles at all).

All names sort after "minhash_near_dup" (driver-window rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import davg, dsum, sql_davg, sql_dsum
from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.components import bfs_distances
from mobility_etl_spark.operators.sampling import sql_hash_bucket
from mobility_etl_spark.registry import register

# --------------------------------------------------------------------
# regression_multi_events: y = b0 + b1·x1 + b2·x2 via normal equations
# --------------------------------------------------------------------
# Cramer's-rule solve of the 3×3 system A·[b0,b1,b2]ᵀ = rhs where
#   A = [[n, sx1, sx2], [sx1, s11, s12], [sx2, s12, s22]]
#   rhs = [sy, s1y, s2y]
# Single-sourced: the SAME strings run as Spark `F.expr` and inside
# the DuckDB oracle, so both engines execute the identical IEEE
# expression tree over identical (decimal-exact) moments.
_DET = (
    "(nd*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2)"
    " + sx2*(sx1*s12 - s11*sx2))"
)
_DET0 = (
    "(sy*(s11*s22 - s12*s12) - s1y*(sx1*s22 - sx2*s12)"
    " + s2y*(sx1*s12 - sx2*s11))"
)
_DET1 = (
    "(nd*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2)"
    " + sx2*(sx1*s2y - s1y*sx2))"
)
_DET2 = (
    "(nd*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2)"
    " + sy*(sx1*s12 - s11*sx2))"
)


@register(
    "regression_multi_events",
    oracle=f"""
    WITH t AS (
        SELECT event_type,
               CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x1,
               CAST(EXTRACT(dow FROM ts) + 1 AS DOUBLE) AS x2,
               value AS y
        FROM events
    ),
    m AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               {sql_dsum("x1", "sx1")},
               {sql_dsum("x2", "sx2")},
               {sql_dsum("y", "sy")},
               {sql_dsum("x1 * x1", "s11")},
               {sql_dsum("x1 * x2", "s12")},
               {sql_dsum("x2 * x2", "s22")},
               {sql_dsum("x1 * y", "s1y")},
               {sql_dsum("x2 * y", "s2y")}
        FROM t GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(FLOOR(({_DET0} / {_DET}) * 1000000.0) AS BIGINT) AS b0_fx,
           CAST(FLOOR(({_DET1} / {_DET}) * 1000000.0) AS BIGINT) AS b1_fx,
           CAST(FLOOR(({_DET2} / {_DET}) * 1000000.0) AS BIGINT) AS b2_fx
    FROM m
    """,
    tags=("E13", "N9"),
)
def regression_multi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression (value on hour-of-day and
    day-of-week, per event type) solved DISTRIBUTED via normal
    equations: one pass accumulates the nine sufficient moments
    (n, Σx₁, Σx₂, Σy, Σx₁², Σx₁x₂, Σx₂², Σx₁y, Σx₂y) as exact decimal
    sums — mergeable partials, so a 1000-executor cluster computes the
    same bits — then a 3×3 Cramer's-rule solve runs as pure scalar
    arithmetic in the projection. This is the p-small/n-huge regime
    where XᵀX fits in a register file and the data never leaves the
    executors: the same shape as operators/linalg.py's Gram matrix but
    fully SQL-expressible, hence exactly oracle-checked (the Cramer
    formulas are single-sourced strings run by BOTH engines). The
    built-in ``regr_slope``/MLlib fits are order-dependent doubles and
    could not be hash-compared."""
    events = load_table(spark, sf_dir, "events")
    t = events.select(
        "event_type",
        F.hour("ts").cast("double").alias("x1"),
        F.expr("CAST(dayofweek(ts) AS DOUBLE)").alias("x2"),
        F.col("value").alias("y"),
    )
    m = t.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("*").cast("double").alias("nd"),
        dsum(F.col("x1"), "sx1"),
        dsum(F.col("x2"), "sx2"),
        dsum(F.col("y"), "sy"),
        dsum(F.col("x1") * F.col("x1"), "s11"),
        dsum(F.col("x1") * F.col("x2"), "s12"),
        dsum(F.col("x2") * F.col("x2"), "s22"),
        dsum(F.col("x1") * F.col("y"), "s1y"),
        dsum(F.col("x2") * F.col("y"), "s2y"),
    )
    # 1e-6 fixed point, NOT ROUND(x, 6): on identical doubles FLOOR of
    # the scaled value is engine-identical, while ROUND is not — Spark
    # half-ups the shortest decimal representation (BigDecimal.valueOf)
    # where DuckDB computes round(x*1e6)/1e6, and the two disagree on
    # half-way values (~1.7% of a uniform sample, measured).
    return m.select(
        "event_type",
        "n",
        F.expr(f"CAST(FLOOR(({_DET0} / {_DET}) * 1000000.0) AS BIGINT)").alias("b0_fx"),
        F.expr(f"CAST(FLOOR(({_DET1} / {_DET}) * 1000000.0) AS BIGINT)").alias("b1_fx"),
        F.expr(f"CAST(FLOOR(({_DET2} / {_DET}) * 1000000.0) AS BIGINT)").alias("b2_fx"),
    )


# --------------------------------------------------------------------
# mutual_information_tokens: I(token-presence ; language)
# --------------------------------------------------------------------
#: Per-(token, class) MI contribution — present + absent cell of the
#: 2×|classes| table — floored to 1e-9 fixed point so the cross-class
#: sum is an exact integer add. Inputs are all integers (counts), so
#: the double arithmetic inside is the same IEEE sequence on both
#: engines. Zero cells contribute 0 (the information-theoretic limit).
_MI_TERM = """
    CAST(FLOOR(1000000000.0 * (
        CASE WHEN n_tc > 0 THEN
            (CAST(n_tc AS DOUBLE) / bign)
            * LN(bign * CAST(n_tc AS DOUBLE) / (CAST(df_t AS DOUBLE) * n_c))
        ELSE 0.0 END
        +
        CASE WHEN n_c - n_tc > 0 THEN
            (CAST(n_c - n_tc AS DOUBLE) / bign)
            * LN(bign * CAST(n_c - n_tc AS DOUBLE)
                 / (CAST(bign - df_t AS DOUBLE) * n_c))
        ELSE 0.0 END
    )) AS BIGINT)
"""

_MI_MIN_DF = 10
_MI_TOPK = 50


@register(
    "mutual_information_tokens",
    oracle=f"""
    WITH docs_t AS (
        SELECT doc_id, lang,
               unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents
    ),
    n_total AS (SELECT COUNT(*) AS bign FROM documents),
    classes AS (SELECT lang, COUNT(*) AS n_c FROM documents GROUP BY lang),
    df AS (
        SELECT token, COUNT(*) AS df_t FROM docs_t GROUP BY token
        HAVING COUNT(*) >= {_MI_MIN_DF}
           AND COUNT(*) <= (SELECT bign FROM n_total) - {_MI_MIN_DF}
    ),
    joint AS (
        SELECT token, lang, COUNT(*) AS n_tc FROM docs_t GROUP BY token, lang
    ),
    grid AS (
        SELECT df.token, df.df_t, c.lang,
               CAST(c.n_c AS DOUBLE) AS n_c,
               COALESCE(j.n_tc, 0) AS n_tc,
               (SELECT CAST(bign AS DOUBLE) FROM n_total) AS bign
        FROM df CROSS JOIN classes c
        LEFT JOIN joint j ON j.token = df.token AND j.lang = c.lang
    ),
    terms AS (
        SELECT token, df_t,
               {_MI_TERM} AS term_fx
        FROM grid
    )
    SELECT token, df_t, CAST(SUM(term_fx) AS BIGINT) AS mi_fx
    FROM terms GROUP BY token, df_t
    ORDER BY mi_fx DESC, token LIMIT {_MI_TOPK}
    """,
    tags=("N5", "E13"),
)
def mutual_information_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(token-presence; language) — the classic
    feature-selection / corpus-drift statistic. For each token above a
    document-frequency floor, the full 2×|lang| contingency table is
    reconstructed from ONE tokenization pass: the (token, lang) joint
    counts are the only corpus-wide aggregate; token document frequency
    is its cross-class roll-up (df_t = Σ_c n_tc — summing vocab-sized
    counts, never re-reading documents), and the corpus size is the sum
    of the collected 5-row class table (a control-plane scalar, no
    extra count() action). The token×class grid comes from a broadcast
    cross join against that class table, so the only document-scale
    shuffle is the single token-keyed groupBy. Each cell's MI
    contribution is floored to 1e-9 fixed point BEFORE the cross-class
    sum, making the reduction an exact integer add (the
    text_token_entropy technique) — bit-stable at any parallelism and
    hash-comparable against the oracle, which rebuilds the identical
    table in SQL. Top-50 by MI with a token tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    )
    # control-plane: |classes| rows, collected once — yields the corpus
    # size without a count() action AND a local relation for the grid's
    # broadcast side, so the lang column is scanned exactly once
    class_rows = docs.groupBy("lang").agg(F.count("*").alias("n_c")).collect()
    bign = sum(r.n_c for r in class_rows)
    classes = spark.createDataFrame(
        [(r.lang, r.n_c) for r in class_rows], "lang string, n_c bigint"
    )
    joint = tok.groupBy("token", "lang").agg(F.count("*").alias("n_tc"))
    # ONE corpus-scale shuffle total: the second token groupBy folds the
    # per-class counts into a map, so df_t AND every class cell come out
    # of the same aggregate — a naive df_t-then-left-join-back-to-joint
    # shape makes Catalyst recompute the explode+groupBy lineage for the
    # join side (pushed filters defeat ReuseExchange) and tokenize the
    # corpus twice (caught by reading the dumped plan, not the code).
    tok_stats = (
        joint.groupBy("token")
        .agg(
            F.sum("n_tc").alias("df_t"),
            F.map_from_entries(
                F.collect_list(F.struct("lang", "n_tc"))
            ).alias("per_class"),
        )
        .filter(
            (F.col("df_t") >= _MI_MIN_DF) & (F.col("df_t") <= bign - _MI_MIN_DF)
        )
    )
    grid = tok_stats.crossJoin(F.broadcast(classes)).select(
        "token",
        "df_t",
        F.col("n_c").cast("double").alias("n_c"),
        F.coalesce(F.col("per_class")[F.col("lang")], F.lit(0)).alias("n_tc"),
        F.lit(float(bign)).alias("bign"),
    )
    terms = grid.select(
        "token", "df_t", F.expr(_MI_TERM).alias("term_fx")
    )
    return (
        terms.groupBy("token", "df_t")
        .agg(F.sum("term_fx").alias("mi_fx"))
        .orderBy(F.desc("mi_fx"), "token")
        .limit(_MI_TOPK)
    )


# --------------------------------------------------------------------
# shortest_paths_bfs
# --------------------------------------------------------------------
_BFS_MAX_ORDERS = 2000
_BFS_MAX_DEPTH = 12


@register(
    "shortest_paths_bfs",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        WHERE a.l_orderkey < {_BFS_MAX_ORDERS}
          AND b.l_orderkey < {_BFS_MAX_ORDERS}
    ),
    r(node, dist) AS (
        SELECT MIN(u), 0 FROM pairs
        UNION
        SELECT p.v, r.dist + 1
        FROM r JOIN pairs p ON p.u = r.node
        WHERE r.dist < {_BFS_MAX_DEPTH}
    )
    SELECT node, CAST(MIN(dist) AS INTEGER) AS dist
    FROM r GROUP BY node
    """,
    tags=("N9",),
)
def shortest_paths_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted shortest-path distances from the minimum supplier id
    over the supplier co-occurrence graph (suppliers sharing an order,
    first 2000 orders) — frontier-expansion BFS
    (operators/components.bfs_distances): each level is one
    frontier ⋈ edges equi-join plus an anti-join against the visited
    set, shuffle volume O(frontier × degree), lineage truncated per
    level. The oracle is a DuckDB RECURSIVE CTE — a genuinely
    independent traversal implementation — with MIN(dist) collapsing
    its walk enumeration to the same first-arrival semantics, so the
    hash comparison proves the iterative Spark loop converges to the
    true distance function (completes the graph trio:
    components = reachability, pagerank = stationary mass, BFS =
    metric structure)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < _BFS_MAX_ORDERS
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("v"))
    # the u<>v self-join emits BOTH (u,v) and (v,u), so the edge set is
    # symmetric by construction — symmetrize=False skips the operator's
    # redundant reverse-union + second distinct shuffle
    edges = (
        a.join(b, "ok").filter(F.col("u") != F.col("v")).select("u", "v").distinct()
    )
    sources = edges.agg(F.min("u").alias("node"))
    return bfs_distances(
        edges, "u", "v", sources, max_depth=_BFS_MAX_DEPTH, symmetrize=False
    )


# --------------------------------------------------------------------
# trigram_similarity_join
# --------------------------------------------------------------------
_TRIGRAM_SIM_MIN_1E6 = 500_000  # Jaccard >= 0.5


@register(
    "trigram_similarity_join",
    oracle=f"""
    WITH names AS (
        SELECT MIN(p_partkey) AS pk, lower(p_name) AS name FROM part
        WHERE length(p_name) >= 3
        GROUP BY lower(p_name)
    ),
    positions AS (
        SELECT CAST(unnest(range(1, (SELECT MAX(length(name)) - 1 FROM names)))
                    AS INTEGER) AS i
    ),
    grams AS (
        SELECT DISTINCT pk, substr(name, i, 3) AS g
        FROM names JOIN positions ON i <= length(name) - 2
    ),
    sizes AS (SELECT pk, COUNT(*) AS n_g FROM grams GROUP BY pk),
    shared AS (
        SELECT a.pk AS a_key, b.pk AS b_key, COUNT(*) AS n_shared
        FROM grams a JOIN grams b ON a.g = b.g AND a.pk < b.pk
        GROUP BY a.pk, b.pk
    )
    SELECT s.a_key, s.b_key, s.n_shared,
           sa.n_g AS a_size, sb.n_g AS b_size,
           (s.n_shared * 1000000) // (sa.n_g + sb.n_g - s.n_shared)
               AS sim_1e6
    FROM shared s
    JOIN sizes sa ON sa.pk = s.a_key
    JOIN sizes sb ON sb.pk = s.b_key
    WHERE (s.n_shared * 1000000) // (sa.n_g + sb.n_g - s.n_shared)
          >= {_TRIGRAM_SIM_MIN_1E6}
    """,
    tags=("E10", "N2", "E23"),
)
def trigram_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity self-join on part names by trigram-set
    Jaccard — the INVERTED-INDEX shape that replaces all-pairs
    levenshtein (`fuzzy_match_sources` is the bounded-slice exact
    face; a cartesian edit-distance join is quadratic and dies at
    scale). The corpus is first collapsed to DISTINCT name strings
    (min partkey as the stable representative) — identical strings are
    exact-dedup's job, and skipping this step makes every duplicated
    literal a quadratic pair bomb. Each name explodes to its distinct
    character trigrams,
    the self-equi-join on the trigram key yields only pairs sharing
    ≥1 gram (candidate pruning exactly like minhash banding, but
    lossless for set Jaccard), one count aggregate recovers
    |A∩B|, and |A∪B| comes from the two broadcastable size tables.
    Similarity is pure INTEGER arithmetic — scaled integer division,
    no doubles anywhere — so the oracle comparison is exact by
    construction. Hot trigrams (stop-grams) are the known skew risk:
    at corpus scale the standard fix is dropping the top-percentile
    grams (prefix filtering), which only ADDS candidates never drops
    true pairs below threshold; at part-name scale AQE skew handling
    suffices."""
    part = load_table(spark, sf_dir, "part").filter(F.length("p_name") >= 3)
    names = (
        part.groupBy(F.lower("p_name").alias("name"))
        .agg(F.min("p_partkey").alias("pk"))
    )
    grams = names.select(
        "pk",
        F.explode(
            F.array_distinct(
                F.expr("transform(sequence(1, length(name) - 2),"
                       " i -> substr(name, i, 3))")
            )
        ).alias("g"),
    )
    sizes = grams.groupBy("pk").agg(F.count("*").alias("n_g"))
    shared = (
        grams.select(F.col("pk").alias("a_key"), "g")
        .join(grams.select(F.col("pk").alias("b_key"), "g"), "g")
        .filter(F.col("a_key") < F.col("b_key"))
        .groupBy("a_key", "b_key")
        .agg(F.count("*").alias("n_shared"))
    )
    sim = (
        shared.join(
            F.broadcast(sizes.select(F.col("pk").alias("a_key"),
                                     F.col("n_g").alias("a_size"))),
            "a_key",
        )
        .join(
            F.broadcast(sizes.select(F.col("pk").alias("b_key"),
                                     F.col("n_g").alias("b_size"))),
            "b_key",
        )
        .withColumn(
            "sim_1e6",
            F.expr("(n_shared * 1000000) DIV (a_size + b_size - n_shared)"),
        )
    )
    return sim.filter(F.col("sim_1e6") >= _TRIGRAM_SIM_MIN_1E6).select(
        "a_key", "b_key", "n_shared", "a_size", "b_size", "sim_1e6"
    )


# --------------------------------------------------------------------
# feature hashing (the "hashing trick" vectorizer)
# --------------------------------------------------------------------
_FH_DIM = 32


@register(
    "vectorize_feature_hash",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    SELECT doc_id,
           CAST(('0x' || substr(md5(token), 1, 8))::BIGINT % {_FH_DIM}
                AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM tok
    GROUP BY doc_id, bucket
    """,
    tags=("N5", "E26"),
)
def vectorize_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing ("hashing trick") — the vectorizer that needs NO
    vocabulary pass: each token maps straight to one of 32
    buckets via a portable md5-derived hash (the count-min bucketing,
    queries/sketch_graph.py), so featurization is a single map-side
    pass with one (doc, bucket) aggregation behind it — no dictionary
    to build, broadcast, or keep consistent between training runs, the
    property that matters when the vocabulary is trillions of tokens.
    Emitted as sparse (doc_id, bucket, n) triples — the natural
    shuffle-narrow representation; densifying to array<32> is a
    map-side collect_list away when a consumer wants it. Because the
    bucketing is engine-portable the oracle rebuilds the identical
    sparse matrix and the comparison is exact (vs MLlib's
    HashingTF, whose murmur3 seed is JVM-specific and would force a
    rows-only check)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint")
        % _FH_DIM
    )
    return tok.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count("*").alias("n")
    )


# --------------------------------------------------------------------
# quantile estimation from a deterministic hash sample
# --------------------------------------------------------------------
_QHS_BUCKETS = 10
_QHS_KEEP = 3  # 30% sample


@register(
    "quantile_hash_sample_events",
    oracle=f"""
    WITH s AS (
        SELECT event_type, value FROM events
        WHERE {sql_hash_bucket("event_id", _QHS_BUCKETS)} < {_QHS_KEEP}
    )
    SELECT event_type,
           COUNT(*) AS n_sampled,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50_est,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90_est,
           percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99_est
    FROM s GROUP BY event_type
    """,
    tags=("E13", "E14", "N7"),
)
def quantile_hash_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a DETERMINISTIC 30% hash sample — the
    third quantile strategy alongside the exact per-group sort
    (percentile_disc_events) and the GK sketch
    (approx_percentile_events), and the one that composes with
    everything else hash-based in this engine: membership is a pure
    function of the row key (operators/sampling.hash_bucket — no RNG
    state, no Exchange for the filter, layout-invariant), so the
    sample — and therefore the estimate — is bit-reproducible across
    runs, partitionings, and engines, which neither a seeded
    Bernoulli sample nor a sketch can offer. Unlike the GK face this
    IS exactly oracle-checkable: both engines filter the identical
    sample and take discrete percentiles over the identical multiset.
    At 100 TB the sample keeps per-group sort cost at 30% (or 0.1% at
    a deeper bucket split — one constant) while the rank error decays
    as O(1/√(p·n_group)); tests gate the estimates against the exact
    face's values at the observed group sizes."""
    from mobility_etl_spark.operators.sampling import hash_bucket

    events = load_table(spark, sf_dir, "events")
    sampled = events.filter(
        hash_bucket(F.col("event_id"), _QHS_BUCKETS) < _QHS_KEEP
    )
    sampled.createOrReplaceTempView("__qhs_events")
    return spark.sql(
        """SELECT event_type,
                  COUNT(*) AS n_sampled,
                  percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50_est,
                  percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90_est,
                  percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99_est
           FROM __qhs_events GROUP BY event_type"""
    )


# --------------------------------------------------------------------
# NULL-semantics differential face
# --------------------------------------------------------------------


@register(
    "sql_null_semantics_events",
    oracle=f"""
    WITH t AS (
        SELECT CASE WHEN event_id % 11 = 0 THEN NULL
                    ELSE user_id % 5 END AS key_n,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS val_n,
               value
        FROM events
    )
    SELECT key_n,
           COUNT(*) AS n_rows,
           COUNT(val_n) AS n_vals,
           COUNT(*) - COUNT(val_n) AS n_nulls,
           {sql_davg("val_n", "avg_vals")},
           COUNT(*) FILTER (WHERE val_n IS NOT DISTINCT FROM NULL)
               AS n_nullsafe_null,
           COUNT(*) FILTER (WHERE val_n + 1.0 IS NULL) AS n_prop,
           COUNT(*) FILTER (WHERE COALESCE(val_n, -1.0) = -1.0)
               AS n_coalesced,
           COUNT(*) FILTER (WHERE NULLIF(value, value) IS NULL) AS n_nullif
    FROM t GROUP BY key_n
    """,
    tags=("E7", "E8", "E13"),
)
def sql_null_semantics_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NULL minefield as a differential face: deterministic NULL
    injection (every 11th key, every 7th value), then one aggregation
    exercising each notorious semantic — COUNT(*) vs COUNT(col), AVG
    over missing values, the NULL GROUP KEY (grouped as its own bucket,
    not dropped), null-safe equality (Spark `<=>` ≡ DuckDB
    IS NOT DISTINCT FROM), arithmetic propagation (NULL + 1 IS NULL),
    COALESCE defaulting and NULLIF self-annulment. Hash equality
    across two independent engines pins the ANSI behavior an engine
    migration silently breaks (classic example: systems that drop NULL
    group keys or count them in COUNT(col))."""
    events = load_table(spark, sf_dir, "events")
    t = events.select(
        F.when(F.col("event_id") % 11 == 0, F.lit(None))
        .otherwise(F.col("user_id") % 5)
        .alias("key_n"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("val_n"),
        "value",
    )
    return t.groupBy("key_n").agg(
        F.count("*").alias("n_rows"),
        F.count("val_n").alias("n_vals"),
        (F.count("*") - F.count("val_n")).alias("n_nulls"),
        davg("val_n", "avg_vals"),
        F.count_if(F.col("val_n").eqNullSafe(F.lit(None))).alias(
            "n_nullsafe_null"
        ),
        F.count_if((F.col("val_n") + 1.0).isNull()).alias("n_prop"),
        F.count_if(F.coalesce("val_n", F.lit(-1.0)) == -1.0).alias(
            "n_coalesced"
        ),
        F.count_if(F.nullif("value", "value").isNull()).alias("n_nullif"),
    )


@register(
    "psi_drift_events",
    oracle="""
    WITH bucketed AS (
        SELECT event_type,
               CAST(LEAST(9, GREATEST(0,
                   FLOOR(COALESCE(value, 0) / 50.0))) AS BIGINT) AS bkt,
               event_id % 2 AS half
        FROM events
    ),
    cells AS (
        SELECT event_type, bkt,
               CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cnt_ref,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cnt_cur
        FROM bucketed GROUP BY event_type, bkt
    ),
    tot AS (
        SELECT event_type,
               CAST(SUM(cnt_ref) AS BIGINT) AS n_ref,
               CAST(SUM(cnt_cur) AS BIGINT) AS n_cur
        FROM cells GROUP BY event_type
    ),
    terms AS (
        SELECT c.event_type, t.n_ref, t.n_cur,
               CAST(FLOOR(
                   ((c.cnt_ref + 1) / CAST(t.n_ref + 10 AS DOUBLE)
                    - (c.cnt_cur + 1) / CAST(t.n_cur + 10 AS DOUBLE))
                   * ln(((c.cnt_ref + 1) / CAST(t.n_ref + 10 AS DOUBLE))
                        / ((c.cnt_cur + 1) / CAST(t.n_cur + 10 AS DOUBLE)))
                   * 1e9) AS BIGINT) AS term_fx
        FROM cells c JOIN tot t ON c.event_type = t.event_type
    )
    SELECT event_type,
           CAST(SUM(term_fx) AS BIGINT) AS psi_fx,
           MIN(n_ref) AS n_ref,
           MIN(n_cur) AS n_cur
    FROM terms GROUP BY event_type
    """,
    tags=("E13", "N5"),
)
def psi_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the ML-monitoring drift metric —
    between a deterministic reference/current split (event_id parity)
    of each event type's value distribution over 10 fixed-width
    buckets, add-one smoothed so empty cells stay finite. PSI =
    Σ (p−q)·ln(p/q): each term is two exact integer-ratio divisions,
    one ln, one product — floored to 1e-9 fixed point so the per-type
    reduction is an exact integer sum at any parallelism (the same
    cross-engine ln discipline as text_token_entropy and
    mutual_information_tokens). Plan: one scan, one (type, bucket)
    aggregation, a per-type roll-up joined back — all shuffles are
    |types|·|buckets|-sized, nothing fact-scale after the first
    aggregate. The drift monitor every production training pipeline
    runs daily against its feature store."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0),
                F.floor(F.coalesce(F.col("value"), F.lit(0.0)) / 50.0),
            ),
        )
        .cast("long")
        .alias("bkt"),
        (F.col("event_id") % 2).alias("half"),
    )
    cells = ev.groupBy("event_type", "bkt").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("cnt_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cnt_cur"),
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("cnt_ref").alias("n_ref"), F.sum("cnt_cur").alias("n_cur")
    )
    p = (F.col("cnt_ref") + 1) / (F.col("n_ref") + 10).cast("double")
    q = (F.col("cnt_cur") + 1) / (F.col("n_cur") + 10).cast("double")
    term_fx = F.floor((p - q) * F.log(p / q) * 1e9).cast("long")
    return (
        cells.join(F.broadcast(tot), "event_type")
        .select("event_type", "n_ref", "n_cur", term_fx.alias("term_fx"))
        .groupBy("event_type")
        .agg(
            F.sum("term_fx").alias("psi_fx"),
            F.min("n_ref").alias("n_ref"),
            F.min("n_cur").alias("n_cur"),
        )
        .select("event_type", "psi_fx", "n_ref", "n_cur")
    )
