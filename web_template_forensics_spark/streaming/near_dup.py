"""Streaming near-duplicate detection: SimHash band-bucket dedup as a
custom stateful operator.

``simhash_pairs_stream`` turns the batch banded self-join
(operators/dedup.py hamming_band_pairs) into a Structured Streaming
pipeline: each arriving document is simhashed and exploded into the
SAME pigeonhole bands as the batch face (shared ``band_struct_cols``),
then ``applyInPandasWithState`` keyed by (band_no, band_val) holds the
(id, hash) members ever seen in that bucket and emits, per new arrival,
the verified pairs (hamming <= radius) against ALL history plus
earlier arrivals of the same batch. Exactness model: the emitted pair
SET over any batch split of a corpus equals the batch operator's
output on the full corpus (pytest-pinned across splits; the driver
gate compares against the same DuckDB oracle as ``simhash_pairs``).

Scale notes (the 100 TB story):
- the only shuffle is groupBy(band_no, band_val) — ids + 64-bit hashes,
  never text; buckets never communicate — linear scale-out.
- state is O(corpus) across all buckets, which is INHERENT to
  unbounded-retention near-dup (a new document must be comparable
  against all history); per-bucket state is small because band keys
  spread uniformly (8-16 bits/band at the default radius). Pipelines
  wanting bounded state put a TTL on membership (state.remove on an
  event-time timeout) and accept bounded-window dedup semantics.
- a pair within the radius agrees on >= 1 band (pigeonhole), so it is
  emitted by each agreeing bucket: the stream's raw output carries
  cross-band duplicates with IDENTICAL rows. The gate face distincts
  them after the drain; a fully-streaming consumer chains
  dropDuplicatesWithinWatermark at scale.

Reference parity: no streaming surface exists in the reference (a
single-process Flask tool); this is SURVEY.md §2.9 graft surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash_pairs_stream(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int | None = None,
) -> DataFrame:
    """documents stream -> (id_a, id_b, hamming) append stream.

    Emits each verified pair once PER AGREEING BAND (see module
    docstring); id_a < id_b within every row."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from ..functions.text_udfs import simhash64_udf
    from ..operators.dedup import band_struct_cols

    sh = docs_stream.select(
        F.col(id_col).alias("_id"), simhash64_udf(F.col(text_col)).alias("_sh")
    )
    banded = sh.select(
        "_id",
        "_sh",
        F.explode(F.array(*band_struct_cols(max_hamming, n_bands))).alias("band"),
    ).select("_id", "_sh", "band.band_no", "band.band_val")

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("hamming", IntegerType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("hs", ArrayType(LongType())),
        ]
    )

    def fn(key, pdfs, state):
        members: list[tuple[int, int]] = []
        if state.exists:
            ids, hs = state.get
            members = [(int(i), int(h)) for i, h in zip(ids, hs)]
        n_old = len(members)
        fresh: list[tuple[int, int]] = []
        for pdf in pdfs:
            for i, h in zip(
                pdf["_id"].astype("int64"), pdf["_sh"].astype("int64")
            ):
                fresh.append((int(i), int(h)))
        # deterministic emit independent of Arrow batch boundaries:
        # process new members in id order
        fresh.sort()
        known = {m[0] for m in members}
        rows: list[tuple[int, int, int]] = []
        for i, h in fresh:
            if i in known:
                # replay of a known member (source duplicate delivery /
                # restart overlap): its pairs were already emitted, and
                # re-appending would grow state and duplicate emissions
                continue
            for j, g in members:
                d = bin((h ^ g) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= max_hamming:
                    a, b = (i, j) if i < j else (j, i)
                    rows.append((a, b, d))
            members.append((i, h))
            known.add(i)
        if len(members) > n_old:
            state.update(
                ([m[0] for m in members], [m[1] for m in members])
            )
        if rows:
            yield pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

    return banded.groupBy("band_no", "band_val").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
