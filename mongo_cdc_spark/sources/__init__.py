"""Custom sources built on Spark 4's Python DataSource API.

The reference's only source is a MongoDB change-stream cursor
(/root/reference/main.go:90-99). In production our engine uses the
mongodb streaming connector (cdc/pipeline.py); this package adds a
HERMETIC change-stream source implemented against the same DataSource
V2 contracts a real connector implements — batch reader with
partition planning, and a streaming reader with offset tracking — so
the relay's source seam is exercised end-to-end without a live Mongo.
"""

from mongo_cdc_spark.sources.cdc_source import (  # noqa: F401
    SyntheticChangeStreamDataSource,
    register_sources,
)
