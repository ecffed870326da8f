"""`.zschema` interop — zebra's JSON schema format (read AND write).

Reference format (studied, not copied):
* versioned envelope ``{"version": "v0", "schema": <SchemaV1>}``
  (zebra-core/src/Zebra/Serial/Text/Schema.hs:44-67 — TextV0 wraps the V1
  JSON schema encoding);
* SchemaV1 (zebra-core/src/Zebra/Serial/Json/Schema.hs:220-504): every
  node is a single-key object ``{"<variant>": {...}}`` (ppEnum,
  Json/Util.hs:202-206).  Tables: ``binary`` (+optional ``encoding``
  ``{"utf8":{}}``), ``array`` (``element``), ``map`` (``key``/``value``).
  Columns: ``unit``/``int`` (+optional ``encoding`` ``{"date":{}}`` or
  ``{"time":{"interval":{"seconds"|"milliseconds"|"microseconds":{}}}}``)/
  ``double``/``enum`` (``variants`` of ``{"name","schema"}``)/``struct``
  (``fields`` of ``{"name","schema"}``)/``reversed`` (inner column
  directly)/nested tables appear as their table variant directly
  (Json/Schema.hs:360-364,384-385).  ``default`` is optional;
  ABSENT means DenyDefault (Json/Schema.hs:266-270).

Spark mapping: a zebra ``Array(Struct[...])`` table is a DataFrame schema;
a top-level ``Map k v`` maps to columns (key, value) tagged with
``zebra.map_table`` metadata; enums use this repo's struct<tag, v_*>
convention with the full variant list (including Unit variants, which have
no physical field) recorded under ``zebra.enum`` metadata; Reversed /
Default / int encodings land in the same field-metadata keys the rest of
the engine already honors (operators.merge, codec.blocks).

Epoch note: zebra date/time ints count from 1600-03-01 (Encoding.hs:53-63)
while Spark temporals count from 1970-01-01; this module maps SCHEMAS only
and keeps int columns as LongType + encoding metadata — re-basing values is
``codec.blocks.ZEBRA_EPOCH_OFFSET_DAYS``.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from .merge import DEFAULT_META, REVERSED_META

ENUM_META = "zebra.enum"  # JSON text: [[variant_name, is_unit], ...] in tag order
# Spark's JVM Metadata cannot hold nested arrays (json4s JArray rejection in
# parseDataType), so the layout is stored as a JSON STRING; use the helpers.


def enum_layout_meta(layout: list) -> str:
    return json.dumps(layout)


def enum_layout(md_value) -> list:
    """Accept both the canonical JSON-string form and a raw list (older
    python-side constructions)."""
    return json.loads(md_value) if isinstance(md_value, str) else list(md_value)
ENCODING_META = "zebra.encoding"
MAP_TABLE_META = "zebra.map_table"
BINARY_TABLE_META = "zebra.binary_table"

_TIME_ENCODINGS = {
    "seconds": "time_seconds",
    "milliseconds": "time_milliseconds",
    "microseconds": "time_microseconds",
}
_TIME_ENCODINGS_INV = {v: k for k, v in _TIME_ENCODINGS.items()}


def _variant(node: dict, what: str) -> tuple[str, dict]:
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(f"zschema: expected single-variant object for {what}, got {node!r}")
    return next(iter(node.items()))


def _default_meta(obj: dict) -> dict:
    """ABSENT default = DenyDefault (Json/Schema.hs:266-270)."""
    if "default" in obj:
        name, _ = _variant(obj["default"], "default")
        if name not in ("allow", "deny"):
            raise ValueError(f"zschema: unknown default {name!r}")
        return {DEFAULT_META: name}
    return {DEFAULT_META: "deny"}


def _int_encoding(obj: dict) -> str:
    if "encoding" not in obj:
        return "int"
    name, val = _variant(obj["encoding"], "int encoding")
    if name == "int":
        return "int"
    if name == "date":
        return "date"
    if name == "time":
        iname, _ = _variant(val["interval"], "time interval")
        if iname not in _TIME_ENCODINGS:
            raise ValueError(f"zschema: unknown time interval {iname!r}")
        return _TIME_ENCODINGS[iname]
    raise ValueError(f"zschema: unknown int encoding {name!r}")


def _col_to_dtype(node: dict, what: str) -> tuple[T.DataType, dict]:
    """SchemaV1 column -> (spark type, field metadata)."""
    name, val = _variant(node, what)
    if name == "unit":
        raise NotImplementedError(
            "zschema: standalone unit columns have no Spark equivalent "
            "(unit enum variants are supported)"
        )
    if name == "int":
        md = _default_meta(val)
        enc = _int_encoding(val)
        if enc != "int":
            md[ENCODING_META] = enc
        return T.LongType(), md
    if name == "double":
        return T.DoubleType(), _default_meta(val)
    if name == "enum":
        md = _default_meta(val)
        names = [v["name"] for v in val["variants"]]
        if names == ["false", "true"] and all(
            "unit" in v["schema"] for v in val["variants"]
        ):
            # bool IS this enum in zebra (Schema.hs:187-196); canonical map
            return T.BooleanType(), md
        fields = [T.StructField("tag", T.LongType(), nullable=False)]
        layout = []
        for v in val["variants"]:
            vname = v["name"]
            vnode = v["schema"]
            is_unit = isinstance(vnode, dict) and "unit" in vnode
            layout.append([vname, is_unit])
            if not is_unit:
                vtype, vmd = _col_to_dtype(vnode, f"variant {vname}")
                fields.append(T.StructField(f"v_{vname}", vtype, True, vmd))
        md[ENUM_META] = enum_layout_meta(layout)
        return T.StructType(fields), md
    if name == "struct":
        md = _default_meta(val)
        fields = []
        for f in val["fields"]:
            ftype, fmd = _col_to_dtype(f["schema"], f"field {f['name']}")
            fields.append(T.StructField(f["name"], ftype, True, fmd))
        return T.StructType(fields), md
    if name == "reversed":
        dtype, md = _col_to_dtype(val, "reversed inner")
        md = dict(md)
        md[REVERSED_META] = True
        return dtype, md
    # nested tables appear directly as their table variant
    if name == "binary":
        md = _default_meta(val)
        enc = "binary"
        if "encoding" in val:
            enc, _ = _variant(val["encoding"], "binary encoding")
        if enc == "utf8":
            return T.StringType(), md
        if enc == "binary":
            return T.BinaryType(), md
        raise ValueError(f"zschema: unknown binary encoding {enc!r}")
    if name == "array":
        etype, emd = _col_to_dtype(val["element"], "array element")
        etype = _sink_elem_meta(etype, emd, "array element")
        return T.ArrayType(etype), _default_meta(val)
    if name == "map":
        ktype, kmd = _col_to_dtype(val["key"], "map key")
        vtype, vmd = _col_to_dtype(val["value"], "map value")
        ktype = _sink_elem_meta(ktype, kmd, "map key")
        vtype = _sink_elem_meta(vtype, vmd, "map value")
        return T.MapType(ktype, vtype), _default_meta(val)
    raise ValueError(f"zschema: unknown column variant {name!r}")


def _sink_elem_meta(etype, emd: dict, what: str):
    """Collection-element positions have no Spark field-metadata slot; an
    ENUM layout sinks onto the element struct's TAG field (the repo's
    round-4 convention, honored by zfile/merge/struct_to_zschema).  Any
    other interesting metadata still refuses (encodings/reversed would be
    silently dropped)."""
    interesting = {k: v for k, v in emd.items() if k != DEFAULT_META}
    if (
        set(interesting) == {ENUM_META}
        and isinstance(etype, T.StructType)
        and etype.fields
        and etype.fields[0].name == "tag"
    ):
        tag = etype.fields[0]
        new_tag = T.StructField(
            "tag",
            tag.dataType,
            tag.nullable,
            {**(tag.metadata or {}), ENUM_META: emd[ENUM_META]},
        )
        return T.StructType([new_tag] + list(etype.fields[1:]))
    _require_plain(emd, what)
    return etype


def _require_plain(md: dict, what: str) -> None:
    """Array/map element positions cannot carry Spark field metadata; refuse
    to silently drop encodings/reversed/enums there."""
    interesting = {k: v for k, v in md.items() if k != DEFAULT_META}
    if interesting:
        raise NotImplementedError(
            f"zschema: {what} carries {sorted(interesting)} which Spark "
            "cannot represent at that position"
        )


def zschema_to_struct(schema_node: dict) -> T.StructType:
    """SchemaV1 table node -> Spark DataFrame schema."""
    name, val = _variant(schema_node, "table")
    if name == "array":
        etype, emd = _col_to_dtype(val["element"], "table element")
        if isinstance(etype, T.StructType) and ENUM_META not in emd:
            return etype
        return T.StructType([T.StructField("value", etype, True, emd)])
    if name == "map":
        ktype, kmd = _col_to_dtype(val["key"], "table key")
        vtype, vmd = _col_to_dtype(val["value"], "table value")
        kmd = dict(kmd)
        kmd[MAP_TABLE_META] = True
        return T.StructType(
            [
                T.StructField("key", ktype, False, kmd),
                T.StructField("value", vtype, True, vmd),
            ]
        )
    if name == "binary":
        dtype, md = _col_to_dtype(schema_node, "binary table")
        md = dict(md)
        md[BINARY_TABLE_META] = True
        return T.StructType([T.StructField("value", dtype, False, md)])
    raise ValueError(f"zschema: unknown table variant {name!r}")


def from_zschema(text: str) -> T.StructType:
    """Parse a ``.zschema`` file body (versioned envelope, TextV0/SchemaV1)."""
    doc = json.loads(text)
    if doc.get("version") != "v0":
        raise ValueError(f"zschema: unknown/unsupported version {doc.get('version')!r}")
    return zschema_to_struct(doc["schema"])


# --- writer -------------------------------------------------------------------


def _md_default(md: dict) -> dict:
    """Our absent metadata means AllowDefault (engine-wide convention)."""
    if (md or {}).get(DEFAULT_META, "allow") == "deny":
        return {}
    return {"default": {"allow": {}}}


def _dtype_to_col(dtype: T.DataType, md: dict | None, what: str) -> dict:
    md = md or {}
    if md.get(REVERSED_META):
        inner = dict(md)
        inner.pop(REVERSED_META)
        return {"reversed": _dtype_to_col(dtype, inner, what)}
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        node = _md_default(md)
        enc = md.get(ENCODING_META, "int")
        if enc == "date":
            node["encoding"] = {"date": {}}
        elif enc in _TIME_ENCODINGS_INV:
            node["encoding"] = {"time": {"interval": {_TIME_ENCODINGS_INV[enc]: {}}}}
        return {"int": node}
    if isinstance(dtype, T.DateType):
        node = _md_default(md)
        node["encoding"] = {"date": {}}
        return {"int": node}
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        node = _md_default(md)
        node["encoding"] = {"time": {"interval": {"microseconds": {}}}}
        return {"int": node}
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return {"double": _md_default(md)}
    if isinstance(dtype, T.BooleanType):
        # bool = Enum[false: Unit, true: Unit] (Schema.hs:187-196)
        return {
            "enum": {
                **_md_default(md),
                "variants": [
                    {"name": "false", "schema": {"unit": {}}},
                    {"name": "true", "schema": {"unit": {}}},
                ],
            }
        }
    if isinstance(dtype, T.StringType):
        node = _md_default(md)
        node["encoding"] = {"utf8": {}}
        return {"binary": node}
    if isinstance(dtype, T.BinaryType):
        return {"binary": _md_default(md)}
    if isinstance(dtype, T.ArrayType):
        return {
            "array": {
                **_md_default(md),
                "element": _dtype_to_col(dtype.elementType, None, f"{what} element"),
            }
        }
    if isinstance(dtype, T.MapType):
        return {
            "map": {
                **_md_default(md),
                "key": _dtype_to_col(dtype.keyType, None, f"{what} key"),
                "value": _dtype_to_col(dtype.valueType, None, f"{what} value"),
            }
        }
    if isinstance(dtype, T.StructType):
        if (
            ENUM_META not in md
            and dtype.fields
            and dtype.fields[0].name == "tag"
            and (dtype.fields[0].metadata or {}).get(ENUM_META)
        ):
            # collection-element convention: the enum layout rides the tag
            # field where Spark offers no outer-field metadata slot
            md = {**md, ENUM_META: dtype.fields[0].metadata[ENUM_META]}
        if ENUM_META in md:
            by_name = {f.name: f for f in dtype.fields}
            variants = []
            for vname, is_unit in enum_layout(md[ENUM_META]):
                if is_unit:
                    variants.append({"name": vname, "schema": {"unit": {}}})
                else:
                    vf = by_name[f"v_{vname}"]
                    variants.append(
                        {
                            "name": vname,
                            "schema": _dtype_to_col(
                                vf.dataType, vf.metadata, f"variant {vname}"
                            ),
                        }
                    )
            return {"enum": {**_md_default(md), "variants": variants}}
        return {
            "struct": {
                **_md_default(md),
                "fields": [
                    {
                        "name": f.name,
                        "schema": _dtype_to_col(f.dataType, f.metadata, f.name),
                    }
                    for f in dtype.fields
                ],
            }
        }
    raise NotImplementedError(f"zschema: no zebra mapping for {dtype} at {what}")


def struct_to_zschema(schema: T.StructType) -> dict:
    """Spark DataFrame schema -> SchemaV1 table node."""
    fields = list(schema.fields)
    if fields and (fields[0].metadata or {}).get(MAP_TABLE_META):
        if len(fields) != 2:
            raise ValueError("zschema: map table needs exactly (key, value)")
        kmd = dict(fields[0].metadata)
        kmd.pop(MAP_TABLE_META)
        return {
            "map": {
                "key": _dtype_to_col(fields[0].dataType, kmd, "key"),
                "value": _dtype_to_col(fields[1].dataType, fields[1].metadata, "value"),
            }
        }
    if fields and (fields[0].metadata or {}).get(BINARY_TABLE_META):
        md = dict(fields[0].metadata)
        md.pop(BINARY_TABLE_META)
        return _dtype_to_col(fields[0].dataType, md, "binary table")
    return {
        "array": {
            "element": {
                "struct": {
                    "fields": [
                        {
                            "name": f.name,
                            "schema": _dtype_to_col(f.dataType, f.metadata, f.name),
                        }
                        for f in fields
                    ]
                }
            }
        }
    }


def to_zschema(schema: T.StructType) -> str:
    """Emit a ``.zschema`` file body (versioned envelope)."""
    return (
        json.dumps(
            {"version": "v0", "schema": struct_to_zschema(schema)}, indent=2
        )
        + "\n"
    )
