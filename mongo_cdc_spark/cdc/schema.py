"""Typed envelope for MongoDB change-stream events.

The reference navigates the event dynamically (bson.M + runtime type
assertions, /root/reference/main.go:104-116). Spark-first design: a typed
envelope for the fields the pipeline interprets (ns.db, ns.coll,
documentKey) and the dynamic payload (fullDocument) kept as a lossless
JSON string column — the same "opaque document" treatment the reference
gives it (main.go:138 serializes it wholesale without inspection).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Standard MongoDB change-event envelope (see SURVEY.md §1.2 / FIXTURES.md §1).
CHANGE_EVENT_SCHEMA = T.StructType([
    T.StructField("_id", T.StructType([
        T.StructField("_data", T.StringType()),      # resume token
    ])),
    T.StructField("operationType", T.StringType()),  # insert|update|replace|delete
    T.StructField("clusterTime", T.TimestampType()),
    T.StructField("ns", T.StructType([
        T.StructField("db", T.StringType()),
        T.StructField("coll", T.StringType()),
    ])),
    T.StructField("documentKey", T.StructType([
        T.StructField("_id", T.StringType()),
    ])),
    # Dynamic post-image; absent for deletes. Kept as raw JSON (lossless);
    # promote with from_json/schema_of_json when a user supplies a schema.
    T.StructField("fullDocument", T.StringType()),
])

# Parse-time variant with the PERMISSIVE corrupt-record column appended,
# implementing the reference's skip-on-decode-error (main.go:105-108).
CORRUPT_COL = "_corrupt_record"
CHANGE_EVENT_SCHEMA_PERMISSIVE = T.StructType(
    CHANGE_EVENT_SCHEMA.fields + [T.StructField(CORRUPT_COL, T.StringType())]
)
