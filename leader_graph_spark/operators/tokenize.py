"""BPE tokenizer APPLICATION: encode text with a fixed merge table.

``plans/text_queries.py:bpe_merge_candidates`` covers the training side
(counting merge candidates); this is the other half — applying a
trained merge list to a corpus, which is what a data pipeline actually
runs at scale (token counts for packing budgets, length filtering, and
cost estimates must come from the REAL tokenizer, not a whitespace
proxy: the two disagree by 2-4× on non-English text).

Algorithm (standard BPE encode): each whitespace word starts as its
character sequence; repeatedly merge the adjacent pair with the LOWEST
merge-table rank until no listed pair remains. Deterministic given the
merge list — no RNG, no state.

Spark shape: the merge table is a plain python dict broadcast inside
the ``mapInPandas`` closure (merge tables are ~50k entries — kilobytes
to low MB, the textbook broadcast case), and encoding is Arrow-batched
per partition — the sanctioned Python seam (production swaps the loop
for a native tokenizer library behind the same columnar signature; the
plumbing — schema, batching, broadcast — is what this operator pins).
Per-row work is O(word_len²·words) worst case, independent of corpus
size; no shuffle at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose with F)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_words", IntegerType()),
        StructField("n_bpe_tokens", IntegerType()),
        StructField("tokens_fp", StringType()),
    ]
)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Pure-python BPE encode of one word (exported for the model
    tests): lowest-rank adjacent pair merges first; left-most wins
    rank ties (can only happen if the same pair occurs twice — merging
    left-most first is the reference BPE behavior)."""
    parts = list(word)
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def bpe_encode_stats(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per-document stats from applying the BPE merge list: word count,
    BPE token count, and an md5 fingerprint of the token sequence (so
    any change in the encoding — merge order bugs included — changes a
    checkable value without shipping the full token stream)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = (text or "").strip().lower().split()
                toks: list[str] = []
                for w in words:
                    toks.extend(encode_word(w, ranks))
                fp = hashlib.md5(" ".join(toks).encode()).hexdigest()
                out.append((doc_id, len(words), len(toks), fp))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_words", "n_bpe_tokens", "tokens_fp"]
            )

    return src.mapInPandas(encode, _OUT_SCHEMA)
