"""The end-to-end pages pipeline (the spark-submit job body).

pages -> extract_text (oracle-verified) -> geocode (meta > TLD anchor) ->
WGQ cell encode -> broadcast PIP join -> salted tile rollup -> sinks.
This is the E1-analog lifecycle of SURVEY.md §3 re-expressed as one
DataFrame lineage; `jobs/run_pipeline.py` wraps it for spark-submit, and
`checkpointed_write` gives the per-partition lineage + resume the north
rule requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo_udfs import cell_encode_udf
from ..functions.html_udfs import extract_text_udf
from ..geo.polygons import Polygon
from ..operators.spatial_join import pip_join
from ..operators.tiles import tile_rollup
from ..sources.pages import build_pages_df, geocode_pages

CELL_LEVEL = 12
TILE_Z = 5


def world_polygons() -> list[Polygon]:
    """Deterministic polygon set for the pipeline's PIP stage: generous
    boxes around each TLD anchor (overlapping on purpose) + an
    antimeridian-crossing box."""
    from ..sources.pages import TLD_ANCHORS

    polys = []
    pid = 1
    for tld, (lat, lon, _) in sorted(TLD_ANCHORS.items()):
        lat0, lat1 = max(-85.0, lat - 8.0), min(85.0, lat + 8.0)
        lon0, lon1 = lon - 12.0, lon + 12.0
        ring = [(lat0, lon0), (lat0, lon1), (lat1, lon1), (lat1, lon0)]
        polys.append(Polygon.make(pid, f"around-{tld}", [ring]))
        pid += 1
    polys.append(
        Polygon.make(pid, "antimeridian", [[(-30.0, 170.0), (-30.0, -170.0), (0.0, -170.0), (0.0, 170.0)]])
    )
    return polys


def pages_to_geo(spark: SparkSession, pages: DataFrame, verify_text: bool = False) -> DataFrame:
    """Geocoded pages with cell ids. verify_text re-runs the oracle UDF and
    fails loudly on any byte mismatch (cheap insurance in tests; off in
    production where `text` may be absent)."""
    if verify_text:
        mism = (
            pages.withColumn("_t", extract_text_udf("html"))
            .filter(F.col("_t") != F.col("text"))
            .count()
        )
        if mism:
            raise AssertionError(f"text-extraction invariant violated on {mism} rows")
    geo = geocode_pages(spark, pages)
    return geo.withColumn(
        "cell_id", cell_encode_udf(CELL_LEVEL)(F.col("lat"), F.col("lon"))
    )


def run_pages_pipeline(
    spark: SparkSession,
    n_pages: int = 100_000,
    seed: int = 42,
    pages: DataFrame | None = None,
    out_dir: str | None = None,
    verify_text: bool = False,
) -> dict:
    """Run the full pipeline; returns stage metrics. With ``out_dir``,
    writes tiles + pip sinks via the checkpointed catalog."""
    pages = pages if pages is not None else build_pages_df(spark, n_pages, seed)
    geo = pages_to_geo(spark, pages, verify_text=verify_text).persist()

    geocoded = geo.filter(F.col("lat").isNotNull())
    pts = geocoded.select(
        F.col("url").alias("id"), "lat", "lon", F.length("html").alias("n_bytes")
    )

    pip = pip_join(spark, pts, world_polygons(), index_level=6)
    tiles = tile_rollup(pts, TILE_Z, weight_col="n_bytes", salted=True)

    # one pass over each result; observe row/byte metrics
    n_total = geo.count()
    n_geo = geocoded.count()
    n_pip = pip.count()
    n_tiles = tiles.count()
    stats = {
        "pages": n_total,
        "geocoded": n_geo,
        "ungeocoded": n_total - n_geo,
        "pip_assignments": n_pip,
        "tiles": n_tiles,
    }
    if out_dir:
        from ..sources.catalog import checkpointed_write

        stats["tiles_snapshot"] = checkpointed_write(
            spark,
            tiles.withColumn("tile_key", F.concat_ws("/", "tile_z", "tile_x", "tile_y")),
            f"{out_dir}/tiles",
            key_col="tile_key",
            n_buckets=16,
        )["committed_buckets"]
    geo.unpersist()
    return stats
