"""Subword tokenization (greedy BPE encode with a fixed merge table)
— the step between corpus curation and sequence packing in an LLM
data pipeline: every upstream face counts whitespace tokens; training
consumes SUBWORD counts, and packing decisions (operators/packing.py)
are only as good as those counts.

BPE encoding is an iterative, data-dependent rewrite (merge the
best-ranked adjacent pair, repeat) — and since r11 BOTH the encoder
and the trainer carry exact DuckDB oracles anyway: the per-word
rewrite is a recursive CTE splicing one merge per step (rank lookup
inlined as a CASE lambda over the fixed table), and the trainer's
merge-all-occurrences round is one recursive step using window
functions (global argmax via FIRST_VALUE over the pair weights,
left-to-right non-overlap via gaps-and-islands run parity). The full
third-engine Python recompute plus structural invariants
(losslessness, monotone symbol counts) stay gated in
tests/test_round5_faces.py / test_round7_faces.py. The Spark shape
is the canonical tokenizer deployment: mapInPandas with the merge
table baked into the closure (a few hundred bytes broadcast once per
task — at 100 TB a real 50k-merge table ships the same way, well under
executor memory), Arrow batches in and out, per-word LRU-less dict
cache per batch so repeated words (Zipf's law) tokenize once.

Name sorts after "minhash_near_dup" (driver-window rule).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register

#: Merge table in priority order (rank = index). Deliberately small
#: and character-level, tuned to the fixture vocabulary so merges
#: actually fire; a production table is learned, not hand-picked, but
#: the ENCODER under test is the same greedy algorithm either way.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("i", "n"),
    ("e", "r"),
    ("o", "r"),
    ("s", "t"),
    ("r", "o"),
    ("ro", "w"),
    ("a", "t"),
    ("o", "n"),
    ("a", "r"),
    ("q", "u"),
    ("qu", "er"),
    ("quer", "y"),
    ("s", "c"),
    ("sc", "an"),
    ("t", "a"),
    ("ta", "b"),
    ("tab", "l"),
    ("tabl", "e"),
)


def _bpe_encode_oracle() -> str:
    """DuckDB replay of the greedy rank-ordered BPE ENCODER: per
    distinct word, a recursive CTE splices exactly one merge per step
    — the best-ranked pair at its first position, as one scalar
    ``rank*1000000 + position`` key (positions wrap only past
    million-symbol words — far beyond any real token) — until no
    table pair remains; the
    rank lookup is the fixed merge table inlined as a CASE lambda (no
    join, so the recursive term stays single-reference). Doc-level
    outputs re-assemble from the word encodings by position."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    branches = " ".join(
        f"WHEN syms[i] = '{esc(l)}' AND syms[i + 1] = '{esc(r)}' "
        f"THEN CAST({rank} * 1000000 + i AS BIGINT)"
        for rank, (l, r) in enumerate(BPE_MERGES)
    )
    key = (
        "list_min(list_filter(list_transform("
        "generate_series(1, len(syms) - 1), "
        f"i -> CASE {branches} ELSE NULL END), x -> x IS NOT NULL))"
    )
    return f"""
    WITH RECURSIVE doct AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN text = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split(text, ' ') END AS toks
        FROM documents
    ),
    words0 AS MATERIALIZED (
        SELECT DISTINCT toks[g.i] AS w
        FROM doct, UNNEST(generate_series(1, len(toks))) AS g(i)
    ),
    enc(step, w, syms) AS (
        SELECT 0, w,
               list_transform(generate_series(1, length(w)), i -> w[i])
        FROM words0
        UNION ALL
        SELECT step + 1, w,
               list_slice(syms, 1, (key % 1000000) - 1)
               || [syms[key % 1000000] || syms[(key % 1000000) + 1]]
               || list_slice(syms, (key % 1000000) + 2, len(syms))
        FROM (
            SELECT step, w, syms, {key} AS key FROM enc
        ) WHERE key IS NOT NULL
    ),
    finals AS MATERIALIZED (
        SELECT w, syms FROM enc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY w ORDER BY step DESC) = 1
    ),
    docw AS (
        SELECT doc_id, toks[g.i] AS w, g.i AS ord
        FROM doct, UNNEST(generate_series(1, len(toks))) AS g(i)
    ),
    agg AS (
        SELECT d.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(len(f.syms)) AS BIGINT) AS n_subwords,
               array_to_string(
                   list_slice(flatten(list(f.syms ORDER BY d.ord)), 1, 8),
                   ' ') AS subword_sample
        FROM docw d JOIN finals f ON f.w = d.w
        GROUP BY d.doc_id
    )
    SELECT doc.doc_id,
           COALESCE(a.n_words, 0) AS n_words,
           COALESCE(a.n_subwords, 0) AS n_subwords,
           COALESCE(a.subword_sample, '') AS subword_sample
    FROM doct doc LEFT JOIN agg a ON a.doc_id = doc.doc_id
    """


#: DuckDB replay of the distributed BPE TRAINER (8 merges): one
#: recursive step per round. The working table carries every word's
#: current segmentation; the round's winning pair is computed INSIDE
#: the step by windows over the exploded adjacent-pair occurrences
#: (SUM(cnt) per pair, then a full-frame FIRST_VALUE ordered by the
#: Sennrich tie-break weight desc / left asc / right asc), and the
#: merge-all-occurrences rewrite is the gaps-and-islands run-parity
#: rule (left-to-right non-overlap: within a consecutive match run,
#: every even offset starts a merge). Each row carries the round's
#: (bl, br, bw), so the merge table falls out as SELECT DISTINCT.
_BPE_TRAIN_N = 8
_BPE_TRAIN_ORACLE = f"""
    WITH RECURSIVE vocab0 AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
               list_transform(generate_series(1, length(w)), i -> w[i])
                   AS syms
        FROM (
            SELECT toks[g.i] AS w
            FROM (SELECT CASE WHEN text = '' THEN CAST([] AS VARCHAR[])
                              ELSE string_split(lower(text), ' ') END
                             AS toks
                  FROM documents),
                 UNNEST(generate_series(1, len(toks))) AS g(i)
        ) WHERE length(w) > 0
        GROUP BY w
    ),
    seg(it, w, cnt, syms, bl, br, bw) AS (
        SELECT 0, w, cnt, syms, CAST(NULL AS VARCHAR),
               CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
        FROM vocab0
        UNION ALL
        SELECT it + 1, w, cnt,
               list_filter(
                   list(CASE WHEN mstart THEN bl || br
                             WHEN COALESCE(prev_mstart, FALSE) THEN NULL
                             ELSE sym END ORDER BY j),
                   x -> x IS NOT NULL) AS new_syms,
               bl, br, bw
        FROM (
            SELECT *, LAG(mstart) OVER (PARTITION BY w ORDER BY j)
                          AS prev_mstart
            FROM (
                SELECT *,
                       mtch AND ((j - MIN(CASE WHEN mtch THEN j END) OVER
                           (PARTITION BY w,
                            CASE WHEN mtch THEN j - mrn END)) % 2 = 0)
                           AS mstart
                FROM (
                    SELECT *,
                           (l IS NOT NULL AND l = bl AND r = br) AS mtch,
                           SUM(CASE WHEN l IS NOT NULL AND l = bl
                                         AND r = br
                               THEN 1 ELSE 0 END) OVER
                               (PARTITION BY w ORDER BY j) AS mrn
                    FROM (
                        SELECT it, w, cnt, syms, j, sym, l, r,
                               FIRST_VALUE(l) OVER wbest AS bl,
                               FIRST_VALUE(r) OVER wbest AS br,
                               CAST(FIRST_VALUE(wp) OVER wbest AS BIGINT)
                                   AS bw
                        FROM (
                            SELECT e.it, e.w, e.cnt, e.syms, g.j,
                                   e.syms[g.j] AS sym,
                                   CASE WHEN g.j < len(e.syms)
                                        THEN e.syms[g.j] END AS l,
                                   CASE WHEN g.j < len(e.syms)
                                        THEN e.syms[g.j + 1] END AS r,
                                   CASE WHEN g.j < len(e.syms) THEN
                                       SUM(CASE WHEN g.j < len(e.syms)
                                           THEN e.cnt END)
                                       OVER (PARTITION BY
                                           CASE WHEN g.j < len(e.syms)
                                                THEN e.syms[g.j] END,
                                           CASE WHEN g.j < len(e.syms)
                                                THEN e.syms[g.j + 1] END)
                                   END AS wp
                            FROM seg e,
                                 UNNEST(generate_series(1, len(e.syms)))
                                     AS g(j)
                            WHERE e.it < {_BPE_TRAIN_N}
                        )
                        WINDOW wbest AS (
                            ORDER BY wp DESC NULLS LAST, l ASC, r ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)
                    )
                )
            )
        )
        GROUP BY it, w, cnt, bl, br, bw
        HAVING bl IS NOT NULL
    )
    SELECT DISTINCT CAST(it - 1 AS INT) AS rank, bl AS "left",
           br AS "right", bw AS pair_weight
    FROM seg WHERE it >= 1 ORDER BY rank
"""


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE: repeatedly merge the best-ranked adjacent symbol
    pair until no pair is in the table. Pure function of (word,
    ranks); the test suite runs this exact function as the reference
    (same code, but over rows pulled to the driver — a genuinely
    independent execution path from the distributed mapInPandas)."""
    symbols = list(word)
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [
            symbols[best_i] + symbols[best_i + 1]
        ]
    return symbols


@register(
    "tokenize_bpe_docs",
    oracle=_bpe_encode_oracle(),
    tags=("N5", "N12", "E38"),
)
def tokenize_bpe_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-BPE subword tokenization of every document: per doc, the
    whitespace word count, the subword count after encoding, and the
    first 8 subwords (space-joined) as a spot-checkable sample.
    mapInPandas iterator form — the merge-rank dict builds once per
    task, a per-batch word cache collapses Zipf-repeated words, and
    only counts plus a bounded sample leave Python, so Arrow traffic
    stays narrow no matter how long the documents are."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def encode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        ranks = {pair: i for i, pair in enumerate(BPE_MERGES)}
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            doc_ids, n_words, n_subwords, samples = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = text.split(" ") if text else []
                subs: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = bpe_encode(w, ranks)
                        cache[w] = enc
                    subs.extend(enc)
                doc_ids.append(int(doc_id))
                n_words.append(len(words))
                n_subwords.append(len(subs))
                samples.append(" ".join(subs[:8]))
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "n_words": n_words,
                    "n_subwords": n_subwords,
                    "subword_sample": samples,
                }
            )

    return docs.mapInPandas(
        encode_batches,
        "doc_id long, n_words long, n_subwords long, subword_sample string",
    )


def learn_bpe_reference(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side reference BPE TRAINER (Sennrich get_stats/merge
    loop): the third engine for tokenizer_train_bpe, run by the test
    suite over collected word counts. Overlapping adjacent positions
    all count (the standard counting rule); ties break on
    (weight desc, left asc, right asc) — mirrored exactly by the
    distributed top-pair selection."""
    vocab = {w: list(w) for w in word_counts}
    out: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        (left, right), weight = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, left, right, weight))
        for w, syms in vocab.items():
            j, merged = 0, []
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == left
                    and syms[j + 1] == right
                ):
                    merged.append(left + right)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            vocab[w] = merged
    return out


def _bpe_merge_udf(left: str, right: str):
    """Vectorized greedy left-to-right single-pair merge (the
    encoder's rule) as a pandas UDF — shared by both trainer paths."""
    from pyspark.sql import functions as F

    @F.pandas_udf("array<string>")
    def merge(col: pd.Series) -> pd.Series:
        out = []
        for syms in col:
            j, merged = 0, []
            n = len(syms)
            while j < n:
                if j + 1 < n and syms[j] == left and syms[j + 1] == right:
                    merged.append(left + right)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            out.append(merged)
        return pd.Series(out)

    return merge


def _adjacent_pairs(df: DataFrame, syms_col: str, sign: int):
    """Explode every adjacent symbol pair of ``syms_col`` weighted by
    ``sign * cnt`` — the additive unit of BPE pair statistics (the
    Sennrich counting rule: overlapping positions all count)."""
    from pyspark.sql import functions as F

    return (
        df.filter(F.size(syms_col) >= 2)
        .select(
            (F.col("cnt") * sign).alias("d"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, size({syms_col}) - 2), "
                    f"i -> struct({syms_col}[i] AS l, "
                    f"{syms_col}[i + 1] AS r))"
                )
            ).alias("p"),
        )
        .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "d")
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    stats: list | None = None,
) -> list[tuple[int, str, str, int]]:
    """DISTRIBUTED INCREMENTAL-PAIR BPE trainer — learns the merge
    table tokenize_bpe_docs only applies, at production merge counts.

    The naive trainer (r6) re-exploded and re-aggregated ALL adjacent
    pairs of the whole vocabulary every round: fine at 8 merges,
    hopeless at a production ~32k (32k full pair shuffles). This
    version maintains the pair statistics as STATE and patches them
    with per-round deltas, exploiting the key algebraic fact that BPE
    pair counts are additive per word: merging (l, r) only changes the
    pair multiset of words that actually CONTAIN the adjacent pair
    (l, r), so

        counts' = counts - pairs(affected, old) + pairs(affected, new)

    Per merge round:

    1. argmax over the maintained ``pair_counts`` table (weight desc,
       pair asc — the Sennrich tie-break) via orderBy().limit(1):
       TakeOrderedAndProject, ONE-ROW collect (control-plane).
    2. ``affected`` = vocab rows whose syms contain adjacent (l, r) —
       a map-only EXISTS filter, materialized once; typically a small
       Zipf tail fraction of |vocab| (the per-round count is recorded
       in ``stats`` and gated by tests/test_round7_faces.py against a
       reference recomputation, proving the explode never sees the
       full vocabulary).
    3. the winning pair merges into ONLY the affected words
       (vectorized pandas UDF, greedy left-to-right — the encoder's
       rule); the pair delta = old-pairs(affected, -cnt) UNION ALL
       new-pairs(affected, +cnt), aggregated — a shuffle sized by the
       affected subset, not the vocabulary.
    4. ``pair_counts`` += delta by a full-outer join keyed on (l, r),
       dropping rows at weight 0; both state tables localCheckpoint
       (lineage truncated per round, the same bounded-working-set
       iteration discipline as operators/components.py).

    The corpus is touched exactly once (initial word-count agg); the
    full-vocabulary pair explode happens exactly once (round-0 init);
    every subsequent round's data-plane work is proportional to the
    affected subset. ``stats``, if given, receives one dict per round:
    ``{"rank", "affected_words", "vocab_words", "delta_pairs"}``.

    Returns [(rank, left, right, pair_weight)] — pure function of the
    corpus; tests replay learn_bpe_reference over driver-collected
    word counts and require the EXACT same merge sequence (gate at 64
    merges in tests/test_round7_faces.py).
    """
    from pyspark.sql import functions as F

    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).filter(F.length("w") > 0)
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select("cnt", F.split("w", "").alias("syms"))
        .localCheckpoint(eager=True)
    )
    pair_counts = (
        _adjacent_pairs(vocab, "syms", 1)
        .groupBy("l", "r")
        .agg(F.sum("d").cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )

    # The per-round union (kept-vocab ∪ merged-affected) CONCATENATES
    # partition lists, so without a bound the vocab's partition count
    # doubles every round — 8 → 8192 by round 10, and the per-round
    # wall clock drowns in empty-task overhead long before merge 256
    # (found by the SCALING.md rounds-vs-wall-clock measurement).
    # coalesce back to the initial width each round: narrow (no
    # shuffle), and the state is vocabulary-sized, never corpus-sized.
    n_vocab_parts = vocab.rdd.getNumPartitions()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = pair_counts.orderBy(
            F.col("w").desc(), "l", "r"
        ).limit(1).collect()  # control-plane: exactly one row per round
        if not top:
            break
        left, right, weight = top[0]["l"], top[0]["r"], int(top[0]["w"])
        merges.append((rank, left, right, weight))

        pairs_arr = F.expr(
            "transform(sequence(0, size(syms) - 2), "
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))"
        )
        has_pair = F.when(
            F.size("syms") >= 2,
            F.exists(
                pairs_arr,
                lambda p: (p.l == F.lit(left)) & (p.r == F.lit(right)),
            ),
        ).otherwise(F.lit(False))

        affected = (
            vocab.filter(has_pair)
            .withColumn(
                "new_syms", _bpe_merge_udf(left, right)(F.col("syms"))
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            _adjacent_pairs(affected, "syms", -1)
            .unionByName(_adjacent_pairs(affected, "new_syms", 1))
            .groupBy("l", "r")
            .agg(F.sum("d").cast("long").alias("d"))
            .filter(F.col("d") != 0)
        )
        pair_counts = (
            pair_counts.join(delta, ["l", "r"], "full_outer")
            .select(
                "l",
                "r",
                (
                    F.coalesce(F.col("w"), F.lit(0))
                    + F.coalesce(F.col("d"), F.lit(0))
                ).alias("w"),
            )
            .filter(F.col("w") > 0)
            .localCheckpoint(eager=True)
        )
        vocab = (
            vocab.filter(~has_pair)
            .unionByName(
                affected.select("cnt", F.col("new_syms").alias("syms"))
            )
            .coalesce(n_vocab_parts)
            .localCheckpoint(eager=True)
        )
        if stats is not None:
            stats.append(
                {
                    "rank": rank,
                    "affected_words": affected.count(),
                    "vocab_words": vocab.count(),
                    "delta_pairs": delta.count(),
                }
            )
    return merges


@register("tokenizer_train_bpe", oracle=_BPE_TRAIN_ORACLE, tags=("N5", "N8", "E38"))
def tokenizer_train_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 8 BPE merges from the documents corpus with the
    distributed trainer (:func:`learn_bpe_merges`). EXACT-oracle
    checked since r11 session 2 (_BPE_TRAIN_ORACLE replays every
    round: windowed argmax + gaps-and-islands non-overlap merge);
    exactness gates stay in tests/test_round6_faces.py:
    the merge sequence equals the driver-side reference trainer's
    exactly, and pair weights are non-increasing in rank (each round's
    argmax can only shrink — merging never creates a pair heavier than
    the one it consumed)."""
    merges = learn_bpe_merges(load_table(spark, sf_dir, "documents"), 8)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_weight long"
    )
