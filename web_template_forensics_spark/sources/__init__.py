from .pages import (  # noqa: F401
    PAGES_SCHEMA,
    TLD_ANCHORS,
    build_pages_df,
    gen_pages_pdf,
    geocode_host,
    splitmix64,
)
