"""Distributed seeded project-pair corpus (the cascade-at-scale input).

One reference "analysis" (core/file_matcher.py's single run) covers ONE
(original, modified) project pair; web scale means millions of pairs.
This source fans the deterministic fixture generator
(fixtures/project_pairs.py — pure Python, no Spark) out over pair ids
with mapInPandas, so corpus generation itself is linear in executors and
never materializes on the driver. Pair ``pid`` is seeded ``seed0 + pid``
— the corpus is fully reproducible from (n_pairs, seed0) alone.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAIR_FILES_SCHEMA = (
    "pair_id long, side string, path string, filetype string, content string"
)


def build_pair_files_df(
    spark: SparkSession, n_pairs: int, seed0: int = 42, partitions: int | None = None
) -> DataFrame:
    """-> (pair_id, side, path, filetype, content), ~34 file rows per pair.

    Generated executor-side: spark.range(n_pairs) carries only the 8-byte
    pair id into each task; the ~8 KB of file content per pair is built
    inside the Arrow batch and flows straight to the consumer (or a
    parquet cache) without a driver round-trip.
    """
    from ..fixtures.project_pairs import project_pair_rows

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for pid in pdf["id"].astype("int64"):
                out.extend(
                    (int(pid), side, path, ftype, content)
                    for side, path, ftype, content in project_pair_rows(
                        seed=seed0 + int(pid)
                    )
                )
            yield pd.DataFrame(
                out, columns=["pair_id", "side", "path", "filetype", "content"]
            )

    n_part = partitions or max(32, n_pairs // 500)
    return spark.range(0, n_pairs, 1, n_part).mapInPandas(
        gen, schema=PAIR_FILES_SCHEMA
    )
