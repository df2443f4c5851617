"""Canonical MongoDB Extended JSON v2 serialization.

The reference's one typed commitment is lossless BSON→JSON encoding via
bson.MarshalExtJSON(canonical=true) (/root/reference/main.go:117,138):
ints become {"$numberInt"/"$numberLong": "..."}, doubles
{"$numberDouble": "..."}, preserving type fidelity through JSON.

The `bson` Python package is not available in this environment, so this
is a small pure-Python implementation covering the JSON-representable
subset our sources produce (our change events arrive as JSON text, so
ObjectId/Decimal128/Binary wire types are out of scope; they would slot
into `_canonicalize` if a true BSON source were wired in). Exposed as an
Arrow-batched pandas UDF — the one custom function the core pipeline
needs (SURVEY.md §1.5); everything around it is built-in Spark.
"""

from __future__ import annotations

import json
import math
from typing import Any

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT32_MIN, _INT32_MAX = -(2 ** 31), 2 ** 31 - 1


def _canonicalize(value: Any) -> Any:
    """Map a parsed-JSON value to its canonical Extended JSON v2 form.

    Mirrors bson.json_util canonical rules for the JSON-native types:
    int → $numberInt (int32 range) else $numberLong; float → $numberDouble
    (with Infinity/NaN spellings); containers recurse; key order preserved.
    """
    if isinstance(value, bool):        # bool before int: bool is an int subclass
        return value
    if isinstance(value, int):
        if _INT32_MIN <= value <= _INT32_MAX:
            return {"$numberInt": str(value)}
        return {"$numberLong": str(value)}
    if isinstance(value, float):
        if math.isnan(value):
            return {"$numberDouble": "NaN"}
        if math.isinf(value):
            return {"$numberDouble": "Infinity" if value > 0 else "-Infinity"}
        if value == int(value) and abs(value) < 2 ** 53:
            return {"$numberDouble": f"{value:.1f}"}
        return {"$numberDouble": repr(value)}
    if isinstance(value, dict):
        return {k: _canonicalize(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_canonicalize(v) for v in value]
    return value


def to_canonical_ext_json(json_text: str | None,
                          nested_json_fields: tuple[str, ...] = ()) -> str | None:
    """JSON text → canonical Extended JSON v2 text (driver-side helper).

    nested_json_fields: top-level fields that arrive as JSON *strings*
    (the envelope keeps fullDocument as a lossless string column) but are
    semantically subdocuments — they are parsed and canonicalized inline,
    matching the reference's treatment of fullDocument as part of the
    BSON event (main.go:138).
    """
    if json_text is None:
        return None
    try:
        parsed = json.loads(json_text)
    except (ValueError, TypeError):
        return None  # skip-on-error, like main.go:119-121/140-142
    if isinstance(parsed, dict):
        for fname in nested_json_fields:
            inner = parsed.get(fname)
            if isinstance(inner, str):
                try:
                    parsed[fname] = json.loads(inner)
                except ValueError:
                    pass  # leave as string if not valid JSON
    # escapeHTML=true in the reference (main.go:117,138) ≈ ensure_ascii here:
    # non-ASCII is escaped either way; separators match Go's json.Marshal.
    return json.dumps(_canonicalize(parsed), separators=(",", ":"),
                      ensure_ascii=True)


@F.pandas_udf(T.StringType())
def ext_json_udf(s: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) canonical Extended JSON encoder."""
    return s.map(to_canonical_ext_json)


@F.pandas_udf(T.StringType())
def ext_json_event_udf(s: pd.Series) -> pd.Series:
    """Whole-change-event encoder: like ext_json_udf but inlines the
    fullDocument JSON-string column as a canonical subdocument."""
    return s.map(lambda t: to_canonical_ext_json(
        t, nested_json_fields=("fullDocument",)))
