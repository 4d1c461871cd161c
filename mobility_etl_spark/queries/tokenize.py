"""Subword tokenization (greedy BPE encode with a fixed merge table)
— the step between corpus curation and sequence packing in an LLM
data pipeline: every upstream face counts whitespace tokens; training
consumes SUBWORD counts, and packing decisions (operators/packing.py)
are only as good as those counts.

BPE encoding is an iterative, data-dependent rewrite (merge the
best-ranked adjacent pair, repeat), so it is not SQL-expressible: the
face registers rows-only and its exactness gate is a full third-engine
recompute in plain Python plus structural invariants (losslessness,
monotone symbol counts) in tests/test_round5_faces.py. The Spark shape
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
    oracle=None,  # iterative rewrite: third-engine parity gate instead
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
