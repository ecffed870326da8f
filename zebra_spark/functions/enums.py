"""Enum / sum-type columns — zebra's distinguishing schema feature.

Reference semantics:
* ``Schema.Enum`` (zebra-core/src/Zebra/Table/Schema.hs:92): a full tagged
  union — a tag plus one column schema per variant.
* Physical striping (Striped.hs:121, ``fromVariant`` Striped.hs:512-528):
  a tag vector plus ONE FULLY-MATERIALIZED column per variant; rows where a
  variant is not selected hold that variant's DEFAULT value (not null) —
  this is what makes enum columns compress (a default-run per variant).
* The tag array is encoded through the int codec (``bTagArray``,
  Serial/Binary/Table.hs:151-159 — tags coerced to int64 then bIntArray).
* Derived composites are naming conventions over Enum/Struct
  (Schema.hs:187-233): ``bool = Enum[false:Unit, true:Unit]``,
  ``option = Enum[none:Unit, some:a]``, ``either = Enum[left:a, right:b]``;
  destructors ``takeOption``/``takeEither`` at Schema.hs:311-339.

Spark has no native union type, so we adopt SURVEY §1.5's convention: an
enum value is a ``struct<tag: long, v_<name0>: T0, v_<name1>: T1, ...>``
with defaults materialized at construction — exactly zebra's physical
striping, which means the block codec (struct walk + int codec on the tag)
needs no special cases and the encode/decode bit-identity law holds
unchanged.  Unit variants (zero information, Schema.hs:89) carry no field
at all, so ``bool`` is just ``struct<tag: long>``.

Everything here is JVM-side column expressions (whole-stage codegen) — no
UDFs, no shuffle.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ..operators.merge import _default_for

UNIT = None  # marker dtype for zero-information (Unit) variants

__all__ = [
    "make_enum",
    "enum_schema",
    "take_variant",
    "enum_tag",
    "bool_to_enum",
    "enum_to_bool",
    "option_to_enum",
    "enum_to_option",
    "either_to_enum",
    "enum_to_either",
    "validate_enum_tags",
]


def enum_schema(variants: list[tuple[str, T.DataType | None]]) -> T.StructType:
    """StructType for an enum with the given (name, dtype) variants.

    ``dtype is UNIT`` (None) marks a Unit variant — no field is emitted.
    """
    layout = [[name, dtype is UNIT] for name, dtype in variants]
    # unit variants are invisible in the physical shape; when any exist,
    # carry the layout on the tag field itself so the enum stays
    # self-describing even in collection-element positions where Spark has
    # no outer-field metadata slot (merge._size_value / zfile rely on this)
    tag_md = (
        {"zebra.enum": json.dumps(layout)}
        if any(is_unit for _, is_unit in layout)
        else None
    )
    fields = [
        T.StructField("tag", T.LongType(), nullable=False, metadata=tag_md)
    ]
    for name, dtype in variants:
        if dtype is not UNIT:
            fields.append(T.StructField(f"v_{name}", dtype, nullable=False))
    return T.StructType(fields)


def make_enum(
    tag: Column, variants: list[tuple[str, Column | None, T.DataType | None]]
) -> Column:
    """Construct an enum struct from a tag column and per-variant values.

    ``variants``: (name, value_column, dtype) per variant, in tag order;
    value_column/dtype are None for Unit variants.  Rows where ``tag != i``
    hold variant i's default value (``fromVariant``, Striped.hs:512-528) —
    materialized here so the striped layout is the logical layout.
    """
    cols = [tag.cast("long").alias("tag")]
    for i, (name, value, dtype) in enumerate(variants):
        if dtype is UNIT:
            continue
        filled = F.when(tag.cast("long") == i, F.coalesce(value, _default_for(dtype)))
        cols.append(filled.otherwise(_default_for(dtype)).cast(dtype).alias(f"v_{name}"))
    return F.struct(*cols)


def enum_tag(enum_col: Column) -> Column:
    return enum_col.getField("tag")


def take_variant(enum_col: Column, i: int, name: str) -> Column:
    """Variant value where selected, NULL elsewhere (toValues projection)."""
    return F.when(
        enum_col.getField("tag") == i, enum_col.getField(f"v_{name}")
    )


def validate_enum_tags(df: DataFrame, col: str, n_variants: int) -> DataFrame:
    """Fail the job if any tag is outside [0, n_variants) — decode-side
    tag validation, mirroring zebra's bounded Tag reads."""
    tag = F.col(col).getField("tag")
    check = F.assert_true(
        (tag >= 0) & (tag < n_variants),
        F.concat(F.lit(f"enum tag out of range in {col}: "), tag.cast("string")),
    )
    # woven into a filter (NULL on success) so Catalyst cannot prune it away
    return df.filter(F.coalesce(check.cast("int"), F.lit(0)) == 0)


# --- derived composites (Schema.hs:187-233) --------------------------------


def bool_to_enum(col: Column) -> Column:
    """bool = Enum[false: Unit, true: Unit] — just a tag."""
    return F.struct(col.cast("long").alias("tag"))


def enum_to_bool(enum_col: Column) -> Column:
    return enum_col.getField("tag") == 1


def option_to_enum(col: Column, dtype: T.DataType) -> Column:
    """option a = Enum[none: Unit, some: a]; NULL maps to none."""
    return make_enum(
        F.when(col.isNull(), F.lit(0)).otherwise(F.lit(1)),
        [("none", None, UNIT), ("some", col, dtype)],
    )


def enum_to_option(enum_col: Column) -> Column:
    """takeOption (Schema.hs:311-321): NULL for none, the value for some."""
    return take_variant(enum_col, 1, "some")


def either_to_enum(
    is_right: Column, left: Column, right: Column,
    left_type: T.DataType, right_type: T.DataType,
) -> Column:
    """either a b = Enum[left: a, right: b]."""
    return make_enum(
        F.when(is_right, F.lit(1)).otherwise(F.lit(0)),
        [("left", left, left_type), ("right", right, right_type)],
    )


def enum_to_either(enum_col: Column) -> tuple[Column, Column]:
    """takeEither (Schema.hs:323-331): (left-or-null, right-or-null)."""
    return take_variant(enum_col, 0, "left"), take_variant(enum_col, 1, "right")
