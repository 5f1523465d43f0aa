"""Deduplication operators for the corpus pipeline.

Exact (hash groupBy), latest-crawl (as-of window, J10 in SURVEY.md §2.3),
MinHash+LSH banded near-dup, SimHash hamming near-dup, n-gram Jaccard
verification. Candidate generation is always an equi-join on bucket keys
(band hash / simhash band / md5) — never a cross join — so the shuffle
volume is O(candidate pairs), the property that survives 100x scale-up.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.text_udfs import N_MINHASH, minhash_udf, simhash64_udf, word_shingles


def latest_crawl_dedup(pages: DataFrame, key: str = "url", ts: str = "warc_ts") -> DataFrame:
    """Keep the latest crawl per url (deterministic: ts desc, then all
    remaining columns are identical by construction of the key)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).desc())
    return pages.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-content dedup -> (content_hash, canonical_id, dup_count)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col).alias("_id"))
        .groupBy("content_hash")
        .agg(F.min("_id").alias("canonical_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def _band_cols(sig_col: str, bands: int, rows_per_band: int) -> list:
    """Band key = xxhash of the band's slice of the minhash signature."""
    out = []
    for b in range(bands):
        sl = F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band)
        out.append(F.xxhash64(F.lit(b), F.concat_ws(",", F.transform(sl, lambda x: x.cast("string")))))
    return out


@F.pandas_udf(T.DoubleType())
def _shingle_jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        sa, sb = set(word_shingles(x or "")), set(word_shingles(y or ""))
        if not sa and not sb:
            out.append(1.0)
        else:
            u = sa | sb
            out.append(len(sa & sb) / len(u) if u else 1.0)
    return pd.Series(out)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    bands: int = 16,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs -> (id_a, id_b, jaccard).

    shingle -> minhash (64 perms) -> band -> bucket equi-join -> exact
    shingle-set Jaccard verification >= threshold. id_a < id_b.
    """
    rows_per_band = N_MINHASH // bands
    sig = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text"),
        minhash_udf(F.col(text_col)).alias("_sig"),
    )
    banded = sig.select(
        "_id", "_text",
        F.explode(F.array(*_band_cols("_sig", bands, rows_per_band))).alias("band_key"),
    )
    left = banded.select(F.col("_id").alias("id_a"), F.col("_text").alias("text_a"), "band_key")
    right = banded.select(F.col("_id").alias("id_b"), F.col("_text").alias("text_b"), "band_key")
    cand = (
        left.join(right, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", _shingle_jaccard_udf("text_a", "text_b"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs -> (id_a, id_b, hamming).

    4 x 16-bit bands: a pair within hamming distance 3 must agree on at
    least one band (pigeonhole), so banding loses nothing. Verification is
    JVM-side bit_count(a XOR b).
    """
    sh = df.select(F.col(id_col).alias("_id"), simhash64_udf(F.col(text_col)).alias("_sh"))
    banded = sh.select(
        "_id", "_sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_no"),
                    F.shiftrightunsigned(F.col("_sh"), 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("band_val"),
                )
                for b in range(4)
            ])
        ).alias("band"),
    ).select("_id", "_sh", "band.band_no", "band.band_val")
    left = banded.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), "band_no", "band_val")
    right = banded.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), "band_no", "band_val")
    cand = (
        left.join(right, ["band_no", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float,
    n: int = 3,
) -> DataFrame:
    """Word n-gram set Jaccard over candidate pairs blocked by ``block_col``.

    Pure relational formulation (explodable to SQL, hence oracle-checkable):
    explode distinct n-grams -> self-join within block -> |A∩B| via count,
    |A∪B| = |A| + |B| - |A∩B|. id_a < id_b.
    """
    grams = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(block_col).alias("_blk"),
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(0),
                            F.greatest(F.size(F.split(F.col(text_col), r"\s+")) - n, F.lit(0)),
                        ),
                        lambda i: F.array_join(
                            F.slice(F.split(F.col(text_col), r"\s+"), i + 1, n), " "
                        ),
                    )
                )
            ).alias("gram"),
        )
        .filter(F.length("gram") > 0)
    )
    sizes = grams.groupBy("_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = grams.select(F.col("_id").alias("id_a"), F.col("_blk").alias("blk"), "gram")
    b = grams.select(F.col("_id").alias("id_b"), F.col("_blk").alias("blk"), "gram")
    inter = (
        a.join(b, ["blk", "gram"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
