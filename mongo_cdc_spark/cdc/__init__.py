from mongo_cdc_spark.cdc.schema import CHANGE_EVENT_SCHEMA  # noqa: F401
from mongo_cdc_spark.cdc.transform import (  # noqa: F401
    parse_change_events,
    to_kafka_records,
)
