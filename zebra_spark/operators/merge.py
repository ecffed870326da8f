"""Schema-checked union / merge / transmute — zebra's table algebra in Spark.

Reference semantics:
* ``Logical.merge`` (zebra-core/src/Zebra/Table/Logical.hs:251-335):
  merging two values under the same key deep-merges collections —
  Binary/Array concatenate (:254-258), Maps union recursively (:260-261) —
  while scalar collisions (Int/Double/Enum) are DATA ERRORS (:315-322);
  zebra never overwrites.
* ``Merge.Table.unionStriped`` (zebra-core/src/Zebra/Merge/Table.hs:242-251):
  widen every input to the schema union, then k-way merge by key.
  Spark replaces the hand-rolled k-way heap with a shuffle:
  ``unionByName(allowMissingColumns)`` + ``groupBy(key)`` + merge-agg.
* ``MaximumRowSize`` (Merge/Table.hs:43-46,157-163): keys whose merged
  value exceeds a byte cap are DROPPED (bounds executor memory on giant
  keys) and counted — the cap property (capped output is a submap of
  uncapped output) is tested like Test/Zebra/Merge/Table.hs:164-177.
* ``Striped.transmute`` (Striped.hs:782-882): adapt a table to a
  compatible wider schema; missing fields fill with defaults only when
  allowed, otherwise error.

Scale: one shuffle on the merge key; collection merge is a map-side
combinable aggregation; AQE splits skewed keys.
"""

from __future__ import annotations

import json

from functools import reduce

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _default_for(dtype: T.DataType):
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.lit(0).cast(dtype)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return F.lit(0.0).cast(dtype)
    if isinstance(dtype, T.StringType):
        return F.lit("")
    if isinstance(dtype, T.BinaryType):
        return F.lit(b"")
    if isinstance(dtype, T.BooleanType):
        return F.lit(False)
    if isinstance(dtype, T.ArrayType):
        return F.array().cast(dtype)
    if isinstance(dtype, T.MapType):
        return F.map_from_arrays(F.array(), F.array()).cast(dtype)
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[
                _default_for(f.dataType).alias(f.name, metadata=f.metadata or {})
                for f in dtype.fields
            ]
        )
    return F.lit(None).cast(dtype)


DEFAULT_META = "zebra.default"  # StructField.metadata: "allow" | "deny"
REVERSED_META = "zebra.reversed"  # StructField.metadata: True for Reversed


def field_allows_default(f: T.StructField) -> bool:
    """Per-node Default (Data.hs:120-123): a field may be filled with its
    implied default during widening only when AllowDefault.  Carried as
    StructField metadata; absent metadata means AllowDefault (zebra's
    common case for non-key columns)."""
    return (f.metadata or {}).get(DEFAULT_META, "allow") != "deny"


def deny_default(f: T.StructField) -> T.StructField:
    md = dict(f.metadata or {})
    md[DEFAULT_META] = "deny"
    return T.StructField(f.name, f.dataType, f.nullable, md)


def reversed_field(f: T.StructField) -> T.StructField:
    """Mark a column as Reversed (Schema.hs:95): same data, descending
    order semantics (Logical.hs:552-556 flips compare)."""
    md = dict(f.metadata or {})
    md[REVERSED_META] = True
    return T.StructField(f.name, f.dataType, f.nullable, md)


def is_reversed(f: T.StructField) -> bool:
    return bool((f.metadata or {}).get(REVERSED_META, False))


def sort_exprs(schema: T.StructType, cols: list[str]) -> list:
    """Ordering expressions honoring Reversed metadata — a Reversed key
    sorts descending, so 'latest wins' factset-style keys merge correctly."""
    by_name = {f.name: f for f in schema.fields}
    return [
        F.desc(c) if c in by_name and is_reversed(by_name[c]) else F.asc(c)
        for c in cols
    ]


def transmute(
    df: DataFrame,
    target: T.StructType,
    allow_default: bool | dict[str, bool] = True,
) -> DataFrame:
    """Adapt ``df`` to ``target`` schema (Striped.hs:782-882 semantics).

    Missing columns fill with typed defaults only where allowed; the
    per-node Default is resolved (most specific first) from: an explicit
    per-column dict, the target field's ``zebra.default`` metadata, or the
    boolean for the whole table.  Extra columns are an error — zebra
    transmute never drops data silently.
    """
    have = {f.name: f for f in df.schema.fields}
    want = {f.name for f in target.fields}
    extra = set(have) - want
    if extra:
        raise ValueError(f"transmute: input has columns not in target: {sorted(extra)}")
    cols = []
    for f in target.fields:
        if f.name in have:
            adapted = _adapt_col(
                F.col(f.name), have[f.name].dataType, f.dataType,
                allow_default if not isinstance(allow_default, dict) else True,
                f.name,
            )
            cols.append(adapted.alias(f.name, metadata=f.metadata or {}))
            continue
        if isinstance(allow_default, dict):
            ok = allow_default.get(f.name, field_allows_default(f))
        else:
            ok = allow_default and field_allows_default(f)
        if ok:
            cols.append(
                _default_for(f.dataType).alias(f.name, metadata=f.metadata or {})
            )
        else:
            raise ValueError(
                f"transmute: missing column {f.name} and defaults not allowed "
                "(DenyDefault)"
            )
    return df.select(*cols)


def _adapt_col(col, have: T.DataType, want: T.DataType, allow_default: bool, path: str):
    """Adapt a column to a (possibly WIDER) nested type — zebra transmute
    recurses into structs (Striped.hs:782-882): target subfields missing
    from the source fill with their defaults when their own per-node
    Default allows (Data.hs:120-123)."""
    if have == want:
        return col
    if isinstance(have, T.StructType) and isinstance(want, T.StructType):
        have_by = {f.name: f for f in have.fields}
        parts = []
        for wf in want.fields:
            if wf.name in have_by:
                parts.append(
                    _adapt_col(
                        col[wf.name], have_by[wf.name].dataType, wf.dataType,
                        allow_default, f"{path}.{wf.name}",
                    ).alias(wf.name, metadata=wf.metadata or {})
                )
            elif allow_default and field_allows_default(wf):
                parts.append(
                    _default_for(wf.dataType).alias(wf.name, metadata=wf.metadata or {})
                )
            else:
                raise ValueError(
                    f"transmute: missing nested field {path}.{wf.name} and "
                    "defaults not allowed (DenyDefault)"
                )
        return F.struct(*parts)
    return col.cast(want)


def schema_union(a: T.StructType, b: T.StructType) -> T.StructType:
    """Least upper bound of two schemas (Schema.hs:401-533): equal-named
    fields must match exactly (including Reversed-ness); a field present in
    only one side joins the union only if it is AllowDefault
    (Schema.hs:476-533 — the other side must be fillable)."""
    fields = {f.name: f for f in a.fields}
    b_names = {f.name for f in b.fields}
    out = []
    for f in a.fields:
        if f.name in b_names:
            out.append(_union_field(f, next(x for x in b.fields if x.name == f.name)))
        else:
            if not field_allows_default(f):
                raise ValueError(
                    f"schema union: column {f.name} is DenyDefault but "
                    "missing from one input"
                )
            out.append(f)
    for f in b.fields:
        if f.name not in fields:
            if not field_allows_default(f):
                raise ValueError(
                    f"schema union: column {f.name} is DenyDefault but "
                    "missing from one input"
                )
            out.append(f)
    return T.StructType(out)


def _union_field(fa: T.StructField, fb: T.StructField) -> T.StructField:
    """Least upper bound of one same-named field pair.  Plain STRUCT types
    union RECURSIVELY (zebra's union is node-wise — Schema.hs:401-533: a
    subfield present on one side only joins when it is AllowDefault); enum
    structs (zebra.enum metadata) and every other type must match exactly;
    Reversed must agree."""
    if is_reversed(fa) != is_reversed(fb):
        raise ValueError(f"schema union: column {fa.name} disagrees on Reversed")
    a_enum = "zebra.enum" in (fa.metadata or {})
    b_enum = "zebra.enum" in (fb.metadata or {})
    if a_enum or b_enum:
        if fa.dataType != fb.dataType or (fa.metadata or {}).get("zebra.enum") != (
            fb.metadata or {}
        ).get("zebra.enum"):
            raise ValueError(
                f"schema union: enum column {fa.name} variants must match exactly"
            )
        return fa
    if fa.dataType == fb.dataType:
        return fa
    if isinstance(fa.dataType, T.StructType) and isinstance(fb.dataType, T.StructType):
        return T.StructField(
            fa.name,
            schema_union(fa.dataType, fb.dataType),
            fa.nullable or fb.nullable,
            fa.metadata,
        )
    raise ValueError(
        f"schema union: column {fa.name} has incompatible types "
        f"{fa.dataType} vs {fb.dataType}"
    )


def union_tables(dfs: list[DataFrame]) -> DataFrame:
    """unionStriped's widening union: every input transmuted to the schema
    union, then unioned (Merge/Table.hs:224-251)."""
    target = reduce(schema_union, (df.schema for df in dfs))
    return reduce(
        lambda x, y: x.unionByName(y), (transmute(df, target) for df in dfs)
    )


def _merge_agg(field: T.StructField, order_col: str):
    """Per-column merge aggregation under a key (Logical.hs:251-335)."""
    name = field.name
    if isinstance(field.dataType, T.ArrayType):
        # concatenate in deterministic input order (zebra concatenates in
        # stream order; shuffle loses order, so we sort by input index)
        return F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(name).alias("v")))
                ),
                lambda s: s["v"],
            )
        ).alias(name)
    if isinstance(field.dataType, T.MapType):
        # union in deterministic input order; earlier input wins on key
        # clash.  Maps are not default-orderable, so sort by the input
        # index alone via an explicit comparator.
        ordered = F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(order_col).alias("o"), F.col(name).alias("v"))
                ),
                lambda l, r: F.when(l["o"] < r["o"], -1)
                .when(l["o"] > r["o"], 1)
                .otherwise(0),
            ),
            lambda s: s["v"],
        )
        return F.aggregate(
            ordered,
            F.map_from_arrays(F.array(), F.array()).cast(field.dataType),
            lambda acc, m: F.map_concat(
                acc,
                F.map_filter(m, lambda k, v: ~F.array_contains(F.map_keys(acc), k)),
            ),
        ).alias(name)
    if isinstance(field.dataType, T.StringType):
        # zebra Binary merge = concat (Logical.hs:254-255)
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(name).alias("v")))
                ),
                lambda s: s["v"],
            ),
            "",
        ).alias(name)
    if isinstance(field.dataType, T.BinaryType):
        # byte concatenation via a binary fold — array_join would implicitly
        # cast array<binary> to array<string> and corrupt non-UTF8 bytes
        ordered = F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(order_col).alias("o"), F.col(name).alias("v"))
                )
            ),
            lambda s: s["v"],
        )
        return F.aggregate(
            ordered,
            F.lit(b""),
            lambda acc, v: F.concat(acc, F.coalesce(v, F.lit(b""))),
        ).alias(name)
    # scalar: collision is a data error (Logical.hs:315-322).  The
    # assert_true is woven into the value expression (NULL on success, via
    # coalesce) so Catalyst cannot prune it away.  collect_set drops NULLs,
    # so NULL-vs-value merges deterministically to the value
    # (first ignorenulls) and collision means >= 2 distinct non-null values.
    check = F.assert_true(
        F.size(F.collect_set(name)) <= 1,
        F.lit(f"merge collision on scalar column {name}"),
    )
    return F.when(
        F.coalesce(check.cast("int"), F.lit(0)) == 0,
        F.first(name, ignorenulls=True),
    ).alias(name)


def merge_tables(
    dfs: list[DataFrame],
    key_cols: list[str],
    max_row_bytes: int | None = None,
):
    """K-way merge by key with zebra merge semantics.

    Returns ``(merged_df, drop_metrics_df)``; ``drop_metrics_df`` counts
    keys dropped by ``max_row_bytes`` (MaximumRowSize semantics) — None cap
    means nothing is dropped and the metrics frame is empty.
    """
    tagged = [
        df.withColumn("__src", F.lit(i).cast("int")) for i, df in enumerate(dfs)
    ]
    u = union_tables(tagged)
    value_fields = [
        f
        for f in u.schema.fields
        if f.name not in key_cols and f.name != "__src"
    ]
    aggs = [_merge_agg(f, "__src") for f in value_fields]

    size_expr = reduce(
        lambda x, y: x + y,
        [_row_size_term(f) for f in value_fields],
        F.lit(0).cast("long"),
    )
    merged = u.groupBy(*key_cols).agg(
        *aggs, F.sum(size_expr).alias("__row_bytes")
    )
    # groupBy/agg drops top-level StructField metadata; restore it from the
    # widened union schema so downstream zschema export / blocks stay
    # schema-faithful (nested metadata rides inside the dataType already)
    by_name = {f.name: f for f in u.schema.fields}
    merged = merged.select(
        *[
            F.col(c.name).alias(
                c.name, metadata=(by_name.get(c.name) and by_name[c.name].metadata) or {}
            )
            if c.name in by_name
            else F.col(c.name)
            for c in merged.schema.fields
        ]
    )
    if max_row_bytes is None:
        return merged.drop("__row_bytes"), merged.limit(0).select(
            *[F.col(c) for c in key_cols], F.col("__row_bytes").alias("row_bytes")
        )
    dropped = merged.filter(F.col("__row_bytes") > max_row_bytes).select(
        *[F.col(c) for c in key_cols], F.col("__row_bytes").alias("row_bytes")
    )
    kept = merged.filter(F.col("__row_bytes") <= max_row_bytes).drop("__row_bytes")
    return kept, dropped


def _enum_layout_of(t: T.StructType, md: dict | None) -> list | None:
    """[(variant_name, is_unit)] for an enum-shaped struct (zebra.enum
    metadata, else inferred from the tag + v_* shape) — local copy of the
    zfile/zschema convention to avoid an import cycle."""
    raw = (md or {}).get("zebra.enum")
    if raw is None and t.fields and t.fields[0].name == "tag":
        # collection-element position: no outer-field metadata slot, so the
        # layout (needed when unit variants exist) rides the tag field
        raw = (t.fields[0].metadata or {}).get("zebra.enum")
    if raw is not None:
        layout = json.loads(raw) if isinstance(raw, str) else raw
        return [(n, bool(u)) for n, u in layout]
    names = [f.name for f in t.fields]
    if names and names[0] == "tag" and all(n.startswith("v_") for n in names[1:]):
        return [(n[2:], False) for n in names[1:]]
    return None


def _size_value(col, dtype: T.DataType, md: dict | None = None):
    """EXACT zebra Logical.size of one value (Logical.hs:221-247): scalars
    are 8 bytes, Enum is 8 + the SELECTED variant's size (Unit counts 8),
    Struct is the plain field sum, Nested Binary is the byte length, Nested
    Array/Map sum their elements, Reversed is the inner value.  Exactness
    matters: MaximumRowSize drop decisions now match zebra byte-for-byte on
    the same cap."""
    if isinstance(dtype, T.BooleanType):
        # bool = Enum[false:Unit, true:Unit]: 8 (tag) + 8 (unit)
        return F.lit(16).cast("long")
    if isinstance(dtype, (T.StringType, T.BinaryType)):
        return F.coalesce(F.octet_length(col), F.lit(0)).cast("long")
    if isinstance(dtype, T.ArrayType):
        fixed = _fixed_size(dtype.elementType, None)
        if fixed is not None:
            return F.coalesce(F.size(col), F.lit(0)).cast("long") * fixed
        total = F.aggregate(
            col,
            F.lit(0).cast("long"),
            lambda acc, x: acc + _size_value(x, dtype.elementType, None),
        )
        return F.coalesce(total, F.lit(0)).cast("long")
    if isinstance(dtype, T.MapType):
        kf = _fixed_size(dtype.keyType, None)
        vf = _fixed_size(dtype.valueType, None)
        if kf is not None and vf is not None:
            return F.coalesce(F.size(col), F.lit(0)).cast("long") * (kf + vf)
        total = F.aggregate(
            F.map_entries(col),
            F.lit(0).cast("long"),
            lambda acc, e: acc
            + _size_value(e["key"], dtype.keyType, None)
            + _size_value(e["value"], dtype.valueType, None),
        )
        return F.coalesce(total, F.lit(0)).cast("long")
    if isinstance(dtype, T.StructType):
        layout = _enum_layout_of(dtype, md)
        if layout is not None:
            tag = col["tag"]
            selected = F.lit(8).cast("long")  # unit variants
            for i, (vname, is_unit) in enumerate(layout):
                if is_unit:
                    continue
                vf = dtype[f"v_{vname}"]
                selected = F.when(
                    tag == i, _size_value(col[f"v_{vname}"], vf.dataType, vf.metadata)
                ).otherwise(selected)
            return F.lit(8).cast("long") + selected
        total = F.lit(0).cast("long")
        for f in dtype.fields:
            total = total + _size_value(col[f.name], f.dataType, f.metadata)
        return total
    return F.lit(8).cast("long")  # Int / Double / temporals / Unit


def _fixed_size(dtype: T.DataType, md: dict | None) -> int | None:
    """Constant Logical.size for a type, if it has one (fast array path)."""
    if isinstance(dtype, T.BooleanType):
        return 16
    if isinstance(
        dtype,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
         T.DoubleType, T.DateType, T.TimestampType, T.TimestampNTZType),
    ):
        return 8
    if isinstance(dtype, T.StructType):
        if _enum_layout_of(dtype, md) is not None:
            return None  # varies by tag in general
        sizes = [_fixed_size(f.dataType, f.metadata) for f in dtype.fields]
        if all(s is not None for s in sizes):
            return sum(sizes)
    return None


def _row_size_term(field: T.StructField):
    """Per-value byte size — exact Logical.size (Logical.hs:221-247)."""
    return _size_value(F.col(field.name), field.dataType, field.metadata)
