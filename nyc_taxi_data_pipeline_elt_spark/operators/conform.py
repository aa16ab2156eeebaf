"""Schema conformance — the reference's drift handling, done deterministically.

The reference harmonizes schemas imperatively: rename ``VendorID``
(``/root/reference/src/process_data_glue.py:48``), pad whichever of the
``{t,l}pep_*`` timestamp pairs is missing with typed NULLs (``:162-174``),
drop the path-partition column (``:149-151``), and rematerialize the
partition value as a literal (``:155``). What it does NOT handle is *type*
drift — README.md:146 records that January 2023 failed on an int<->double
flip that ``mergeSchema`` cannot reconcile.

``conform_to_schema`` generalizes all of that into one declarative pass:
given a target StructType, it renames (case-insensitive match), pads
missing columns with typed NULLs, applies deterministic widening casts
(int -> long -> double; any numeric -> double when the target says so),
and drops extras. One ``select`` — a pure projection, so Catalyst still
prunes the scan to only the target columns, at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Deterministic widening lattice: a source type may be cast to a target
# type only along these edges (transitively). Narrowing is refused so
# drift errors surface instead of silently truncating.
_WIDENING: dict[type, tuple[type, ...]] = {
    T.ByteType: (T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType),
    T.ShortType: (T.IntegerType, T.LongType, T.FloatType, T.DoubleType),
    T.IntegerType: (T.LongType, T.FloatType, T.DoubleType),
    T.LongType: (T.DoubleType,),
    T.FloatType: (T.DoubleType,),
    T.DateType: (T.TimestampType, T.TimestampNTZType),
    # Parquet files with isAdjustedToUTC=false surface as NTZ in Spark 4;
    # with the session pinned to UTC (session.RUNTIME_CONFS) the cast to
    # an instant is lossless and deterministic.
    T.TimestampNTZType: (T.TimestampType,),
}


def _can_widen(src: T.DataType, dst: T.DataType) -> bool:
    return isinstance(dst, _WIDENING.get(type(src), ()))


def conform_to_schema(
    df: DataFrame,
    target: T.StructType,
    renames: dict[str, str] | None = None,
    strict: bool = True,
    narrow_ok: set[str] | None = None,
) -> DataFrame:
    """Project ``df`` onto ``target``: rename, pad, widen, drop.

    - columns are matched case-insensitively after applying ``renames``
      (e.g. ``{"VendorID": "vendor_id"}``)
    - a target column absent from ``df`` becomes ``lit(None).cast(type)``
      (the reference's timestamp padding, generalized)
    - a present column with a different type is cast iff the cast widens
      (int->long->double, date->timestamp); otherwise ``strict`` raises —
      this is the drift case that silently broke the reference
    - ``narrow_ok`` lists columns where a narrowing cast is explicitly
      sanctioned (e.g. TLC's float64 ``passenger_count`` months narrowing
      back to the catalog's bigint)
    """
    renames = renames or {}
    narrow_ok = narrow_ok or set()
    by_lower = {}
    for f in df.schema.fields:
        name = renames.get(f.name, f.name)
        by_lower[name.lower()] = (f.name, f.dataType)

    cols = []
    for tf in target.fields:
        hit = by_lower.get(tf.name.lower())
        if hit is None:
            cols.append(F.lit(None).cast(tf.dataType).alias(tf.name))
            continue
        src_name, src_type = hit
        if src_type == tf.dataType:
            cols.append(F.col(src_name).alias(tf.name))
        elif (
            _can_widen(src_type, tf.dataType)
            or tf.name in narrow_ok
            or not strict
        ):
            cols.append(F.col(src_name).cast(tf.dataType).alias(tf.name))
        else:
            raise TypeError(
                f"schema drift on column {tf.name!r}: cannot safely cast "
                f"{src_type.simpleString()} -> {tf.dataType.simpleString()}; "
                "pass strict=False to force"
            )
    return df.select(*cols)
