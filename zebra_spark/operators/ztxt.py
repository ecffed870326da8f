"""zebra's ztxt / JSON logical VALUE codec — parse and render the
reference's own text format, so `zs import/export` can consume the
reference's golden inputs verbatim.

Reference semantics (studied, not copied):
* value layer (zebra-core/src/Zebra/Serial/Json/Logical.hs:91-290):
  enums are single-key variant objects ``{"some": 456}``; unit is ``{}``;
  non-utf8 binary is base64 (Json/Util.hs ppBinary); utf8 binary is a JSON
  string; date/time ints parse/render as calendar strings; structs are
  objects keyed by field name; nested array tables are JSON arrays; nested
  map tables are arrays of ``{"key":…, "value":…}`` pairs (pPair :163-170).
* line framing (Serial/Text/Logical.hs:92-181): an Array table is one JSON
  object per line; a Map table is one ``{"key":…,"value":…}`` object per
  line (exported in ascending key order — Logical.Map is an ordered map);
  a Binary table is the RAW BYTES of the file, no JSON at all, with utf8
  validated when the encoding says so.
* time (Time.hs:319-434, 503-699): dates count days and times count
  seconds/milliseconds/microseconds since 1600-03-01; renders are
  ``YYYY-MM-DD`` / ``YYYY-MM-DD HH:MM:SS[.frac]`` with the fraction
  printed as the shortest digits of the microsecond double and dropped
  entirely when zero (renderCalendarTime, Time.hs:670-699).

Spark mapping: values land in the exact physical layout the rest of the
engine uses (zschema.zschema_to_struct) — enum values as
``struct<tag, v_*>`` with variant defaults MATERIALIZED (fromVariant,
Striped.hs:512-528), date/time columns as plain zebra-epoch ints carrying
``zebra.encoding`` metadata.

Scale note: line-JSON parse is inherently row-at-a-time (the reference's
import is too), so this is a Python-side ingest path — distributed over
``spark.read.text`` partitions via mapInArrow, one pass, no shuffle.  The
hot query path never touches it; once imported, data lives in parquet
blocks / zebra V3 files.
"""

from __future__ import annotations

import base64
import json
from datetime import date, datetime, timedelta

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .zschema import (
    BINARY_TABLE_META,
    MAP_TABLE_META,
    _int_encoding,
    _variant,
    struct_to_zschema,
    zschema_to_struct,
)

ZEBRA_EPOCH = date(1600, 3, 1)
DATE_MAX_DAYS = 511279  # 2999-12-31 (Time.hs:162-169)
TIME_MAX_US = 44174591999999999  # 2999-12-31 23:59:59.999999 (Time.hs:171-178)

_UNIT_US = {
    "time_seconds": 1_000_000,
    "time_milliseconds": 1_000,
    "time_microseconds": 1,
}

__all__ = [
    "parse_zdate",
    "render_zdate",
    "parse_ztime",
    "render_ztime",
    "table_kind",
    "line_parser",
    "line_renderer",
    "read_ztxt",
    "render_ztxt_lines",
    "write_ztxt_file",
]


# --- date/time ----------------------------------------------------------------


def parse_zdate(s: str) -> int:
    """``YYYY-MM-DD`` -> days since 1600-03-01 (bounds-checked)."""
    d = date.fromisoformat(s)
    days = (d - ZEBRA_EPOCH).days
    if not 0 <= days <= DATE_MAX_DAYS:
        raise ValueError(f"ztxt: date out of zebra bounds [1600-03-01, 2999-12-31]: {s!r}")
    return days


def render_zdate(days: int) -> str:
    if not 0 <= days <= DATE_MAX_DAYS:
        raise ValueError(f"ztxt: day count out of zebra bounds: {days}")
    d = ZEBRA_EPOCH + timedelta(days=int(days))
    return f"{d.year:04d}-{d.month:02d}-{d.day:02d}"


def parse_ztime(s: str, unit: str) -> int:
    """``YYYY-MM-DD{ |T}HH:MM:SS[.frac]`` -> count of `unit` since
    1600-03-01 (sub-unit precision truncates, like encodeTime* / quot)."""
    if len(s) < 19 or s[10] not in (" ", "T"):
        raise ValueError(f"ztxt: bad time (need 'YYYY-MM-DD HH:MM:SS[.frac]'): {s!r}")
    days = parse_zdate(s[:10])
    hh, mm = int(s[11:13]), int(s[14:16])
    if s[13] != ":" or s[16] != ":":
        raise ValueError(f"ztxt: bad time-of-day separators: {s!r}")
    rest = s[17:]
    if "." in rest:
        ss_s, frac = rest.split(".", 1)
        if not frac or len(frac) > 6 or not frac.isdigit():
            raise ValueError(f"ztxt: bad fractional seconds: {s!r}")
        us = int(frac.ljust(6, "0"))
    else:
        ss_s, us = rest, 0
    ss = int(ss_s)
    if not (0 <= hh < 24 and 0 <= mm < 60 and 0 <= ss < 60):
        raise ValueError(f"ztxt: time-of-day out of range: {s!r}")
    total_us = days * 86_400_000_000 + ((hh * 60 + mm) * 60 + ss) * 1_000_000 + us
    if total_us > TIME_MAX_US:
        raise ValueError(f"ztxt: time out of zebra bounds: {s!r}")
    return total_us // _UNIT_US[unit]


def render_ztime(v: int, unit: str) -> str:
    us_total = int(v) * _UNIT_US[unit]
    if not 0 <= us_total <= TIME_MAX_US:
        raise ValueError(f"ztxt: time count out of zebra bounds: {v} {unit}")
    days, rem = divmod(us_total, 86_400_000_000)
    d = ZEBRA_EPOCH + timedelta(days=days)
    secs, us = divmod(rem, 1_000_000)
    hh, r = divmod(secs, 3600)
    mm, ss = divmod(r, 60)
    out = f"{d.year:04d}-{d.month:02d}-{d.day:02d} {hh:02d}:{mm:02d}:{ss:02d}"
    if us:
        # shortest digits of the microsecond double in POSITIONAL notation,
        # leading '0' dropped — e.g. 790000 -> ".79", 10 -> ".00001"
        # (renderCalendarTime, Time.hs:686-697).  showFFloat Nothing prints
        # the shortest round-tripping decimal and never uses scientific
        # form; numpy's unique positional format is the same algorithm
        # (repr() is NOT — it flips to 1e-05 below 1e-4).
        import numpy as _np

        out += _np.format_float_positional(us / 1e6, unique=True, trim="-")[1:]
    return out


# --- per-column value converters (SchemaV1 node -> fn) --------------------------


def _expect(cond: bool, what: str, v) -> None:
    if not cond:
        raise ValueError(f"ztxt: expected {what}, got {v!r}")


def _p_int(v):
    _expect(isinstance(v, int) and not isinstance(v, bool), "integer", v)
    return v


def _is_bool_enum(variants: list) -> bool:
    return [x["name"] for x in variants] == ["false", "true"] and all(
        "unit" in x["schema"] for x in variants
    )


def py_default(node: dict):
    """Materialized variant default (fromVariant, Striped.hs:512-528) —
    mirrors operators.merge._default_for for the Python-side layout."""
    name, val = _variant(node, "default")
    if name == "unit":
        return None
    if name == "int":
        return 0
    if name == "double":
        return 0.0
    if name == "binary":
        enc = "binary"
        if "encoding" in val:
            enc, _ = _variant(val["encoding"], "binary encoding")
        return "" if enc == "utf8" else b""
    if name == "array":
        return []
    if name == "map":
        return {}
    if name == "enum":
        variants = val["variants"]
        if _is_bool_enum(variants):
            return False
        out = {"tag": 0}
        for x in variants:
            if "unit" not in x["schema"]:
                out[f"v_{x['name']}"] = py_default(x["schema"])
        return out
    if name == "struct":
        return {f["name"]: py_default(f["schema"]) for f in val["fields"]}
    if name == "reversed":
        return py_default(val)
    raise ValueError(f"ztxt: no default for {name!r}")


def _parse_col(node: dict):
    """SchemaV1 column node -> fn(json_value) -> python value in the
    engine's Spark physical layout."""
    name, val = _variant(node, "column")
    if name == "unit":
        def p(v):
            _expect(v == {}, "unit {}", v)
            return None
        return p
    if name == "int":
        enc = _int_encoding(val)
        if enc == "int":
            return _p_int
        if enc == "date":
            def p(v):
                _expect(isinstance(v, str), "date string", v)
                return parse_zdate(v)
            return p

        def p(v):
            _expect(isinstance(v, str), "time string", v)
            return parse_ztime(v, enc)
        return p
    if name == "double":
        def p(v):
            _expect(isinstance(v, (int, float)) and not isinstance(v, bool), "number", v)
            return float(v)
        return p
    if name == "binary":
        enc = "binary"
        if "encoding" in val:
            enc, _ = _variant(val["encoding"], "binary encoding")
        if enc == "utf8":
            def p(v):
                _expect(isinstance(v, str), "utf8 string", v)
                return v
            return p

        def p(v):
            _expect(isinstance(v, str), "base64 string", v)
            return base64.b64decode(v, validate=True)
        return p
    if name == "enum":
        variants = val["variants"]
        if _is_bool_enum(variants):
            def p(v):
                _expect(isinstance(v, dict) and len(v) == 1, "bool variant object", v)
                k = next(iter(v))
                _expect(k in ("false", "true") and v[k] == {}, "bool variant", v)
                return k == "true"
            return p
        by_name = {}
        payload_fields = []  # (field_name, default) for every non-unit variant
        for i, x in enumerate(variants):
            vnode = x["schema"]
            is_unit = "unit" in vnode
            by_name[x["name"]] = (i, None if is_unit else f"v_{x['name']}",
                                  None if is_unit else _parse_col(vnode))
            if not is_unit:
                payload_fields.append((f"v_{x['name']}", py_default(vnode)))

        def p(v):
            _expect(isinstance(v, dict) and len(v) == 1, "single-key variant object", v)
            vname, payload = next(iter(v.items()))
            if vname not in by_name:
                raise ValueError(f"ztxt: unknown enum variant {vname!r}")
            tag, fname, parse = by_name[vname]
            out = {"tag": tag}
            for f, dflt in payload_fields:
                out[f] = dflt
            if fname is None:
                _expect(payload == {}, "unit variant {}", payload)
            else:
                out[fname] = parse(payload)
            return out
        return p
    if name == "struct":
        parsers = [(f["name"], _parse_col(f["schema"])) for f in val["fields"]]

        def p(v):
            _expect(isinstance(v, dict), "struct object", v)
            out = {}
            for fname, parse in parsers:
                if fname not in v:
                    raise ValueError(f"ztxt: missing struct field {fname!r} in {v!r}")
                out[fname] = parse(v[fname])
            return out
        return p
    if name == "reversed":
        return _parse_col(val)
    if name == "array":
        elem = _parse_col(val["element"])

        def p(v):
            _expect(isinstance(v, list), "array", v)
            return [elem(x) for x in v]
        return p
    if name == "map":
        pk, pv = _parse_col(val["key"]), _parse_col(val["value"])

        def p(v):
            _expect(isinstance(v, list), "array of key/value pairs", v)
            out = {}
            for pair in v:
                _expect(isinstance(pair, dict) and set(pair) == {"key", "value"},
                        '{"key":…,"value":…} pair', pair)
                out[pk(pair["key"])] = pv(pair["value"])
            return out
        return p
    raise ValueError(f"ztxt: unknown column variant {name!r}")


def _render_col(node: dict):
    """SchemaV1 column node -> fn(spark python value) -> JSON-able."""
    name, val = _variant(node, "column")
    if name == "unit":
        return lambda v: {}
    if name == "int":
        enc = _int_encoding(val)
        if enc == "int":
            return int
        if enc == "date":
            # values arrive as zebra day counts (the engine layout) OR as
            # Spark DateType objects (zfile readers revive int+date headers
            # to temporals)
            def r(v):
                if isinstance(v, date):
                    return render_zdate((v - ZEBRA_EPOCH).days)
                return render_zdate(v)
            return r

        def r(v):
            if isinstance(v, datetime):
                days = (v.date() - ZEBRA_EPOCH).days
                us = (
                    days * 86_400_000_000
                    + ((v.hour * 60 + v.minute) * 60 + v.second) * 1_000_000
                    + v.microsecond
                )
                return render_ztime(us // _UNIT_US[enc], enc)
            return render_ztime(v, enc)
        return r
    if name == "double":
        return float
    if name == "binary":
        enc = "binary"
        if "encoding" in val:
            enc, _ = _variant(val["encoding"], "binary encoding")
        if enc == "utf8":
            def r(v):
                if isinstance(v, (bytes, bytearray)):
                    return bytes(v).decode("utf-8")  # validates
                return v
            return r
        return lambda v: base64.b64encode(bytes(v)).decode("ascii")
    if name == "enum":
        variants = val["variants"]
        if _is_bool_enum(variants):
            return lambda v: {"true": {}} if v else {"false": {}}
        layout = []
        for x in variants:
            vnode = x["schema"]
            if "unit" in vnode:
                layout.append((x["name"], None, None))
            else:
                layout.append((x["name"], f"v_{x['name']}", _render_col(vnode)))

        def r(v):
            tag = v["tag"]
            vname, fname, render = layout[tag]
            return {vname: {} if fname is None else render(v[fname])}
        return r
    if name == "struct":
        renders = [(f["name"], _render_col(f["schema"])) for f in val["fields"]]

        def r(v):
            return {fname: render(v[fname]) for fname, render in renders}
        return r
    if name == "reversed":
        return _render_col(val)
    if name == "array":
        elem = _render_col(val["element"])
        return lambda v: [elem(x) for x in v]
    if name == "map":
        rk, rv = _render_col(val["key"]), _render_col(val["value"])

        def r(v):
            items = sorted(v.items()) if isinstance(v, dict) else sorted(v)
            return [{"key": rk(k), "value": rv(x)} for k, x in items]
        return r
    raise ValueError(f"ztxt: unknown column variant {name!r}")


# --- table-level framing --------------------------------------------------------


def table_kind(schema_node: dict) -> str:
    name, _ = _variant(schema_node, "table")
    if name not in ("array", "map", "binary"):
        raise ValueError(f"ztxt: unknown table variant {name!r}")
    return name


def _element_is_plain_struct(elem_node: dict) -> bool:
    name, _ = _variant(elem_node, "element")
    return name == "struct"


def line_parser(schema_node: dict):
    """-> fn(line: str) -> dict keyed by the Spark schema's column names."""
    kind = table_kind(schema_node)
    _, val = _variant(schema_node, "table")
    if kind == "array":
        elem = val["element"]
        parse = _parse_col(elem)
        if _element_is_plain_struct(elem):
            return lambda line: parse(json.loads(line))
        return lambda line: {"value": parse(json.loads(line))}
    if kind == "map":
        pk, pv = _parse_col(val["key"]), _parse_col(val["value"])

        def p(line):
            obj = json.loads(line)
            _expect(isinstance(obj, dict) and set(obj) == {"key", "value"},
                    '{"key":…,"value":…} row', obj)
            return {"key": pk(obj["key"]), "value": pv(obj["value"])}
        return p
    raise ValueError("ztxt: binary tables are raw bytes, not lines")


def _dumps(obj) -> str:
    # JSON object key order is not semantic; the reference emits aeson's
    # internal hash order, we emit sorted keys — compare decoded.
    return json.dumps(obj, separators=(",", ":"), sort_keys=True, ensure_ascii=False)


def line_renderer(schema_node: dict):
    """-> fn(row: Row|dict) -> ztxt line (no newline)."""
    kind = table_kind(schema_node)
    _, val = _variant(schema_node, "table")
    if kind == "array":
        elem = val["element"]
        render = _render_col(elem)
        if _element_is_plain_struct(elem):
            return lambda row: _dumps(render(row))
        return lambda row: _dumps(render(row["value"]))
    if kind == "map":
        rk, rv = _render_col(val["key"]), _render_col(val["value"])
        return lambda row: _dumps({"key": rk(row["key"]), "value": rv(row["value"])})
    raise ValueError("ztxt: binary tables are raw bytes, not lines")


# --- Spark entry points ---------------------------------------------------------


def _schema_node(zschema_text: str) -> dict:
    doc = json.loads(zschema_text)
    if doc.get("version") != "v0":
        raise ValueError(f"ztxt: unsupported zschema version {doc.get('version')!r}")
    return doc["schema"]


def read_ztxt(spark: SparkSession, ztxt_path: str, zschema_text: str) -> DataFrame:
    """Parse a reference-format .ztxt file (or directory of them) with its
    .zschema into a DataFrame in the engine's physical layout.

    Distributed: text partitions -> mapInArrow parse (one pass, no shuffle).
    Binary tables read whole files (spark binaryFile source) and validate
    utf8 when the encoding requires it (Text/Logical.hs:96-101).
    """
    node = _schema_node(zschema_text)
    spark_schema = zschema_to_struct(node)
    kind = table_kind(node)
    if kind == "binary":
        _, val = _variant(node, "table")
        enc = "binary"
        if "encoding" in val:
            enc, _ = _variant(val["encoding"], "binary encoding")
        files = spark.read.format("binaryFile").load(ztxt_path)
        content = F.col("content")
        if enc == "utf8":
            # decode validates utf8; keep the Spark column typed per schema
            content = F.decode(content, "UTF-8")
        meta = dict(spark_schema.fields[0].metadata)
        return files.select(content.alias("value", metadata=meta))

    parse = line_parser(node)
    arrow_schema = pa.schema(
        [pa.field(f.name, _arrow_type(f.dataType)) for f in spark_schema.fields]
    )
    col_names = [f.name for f in spark_schema.fields]

    def run(batches):
        for rb in batches:
            lines = rb.column(0).to_pylist()
            rows = [parse(ln) for ln in lines if ln and not ln.isspace()]
            if not rows:
                continue
            arrays = [
                pa.array([r[c] for r in rows], type=arrow_schema.field(c).type)
                for c in col_names
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=col_names)

    return spark.read.text(ztxt_path).mapInArrow(run, schema=spark_schema)


def _arrow_type(dtype: T.DataType) -> pa.DataType:
    if isinstance(dtype, T.LongType):
        return pa.int64()
    if isinstance(dtype, T.DoubleType):
        return pa.float64()
    if isinstance(dtype, T.StringType):
        return pa.string()
    if isinstance(dtype, T.BinaryType):
        return pa.binary()
    if isinstance(dtype, T.BooleanType):
        return pa.bool_()
    if isinstance(dtype, T.ArrayType):
        return pa.list_(_arrow_type(dtype.elementType))
    if isinstance(dtype, T.MapType):
        return pa.map_(_arrow_type(dtype.keyType), _arrow_type(dtype.valueType))
    if isinstance(dtype, T.StructType):
        return pa.struct([(f.name, _arrow_type(f.dataType)) for f in dtype.fields])
    raise NotImplementedError(f"ztxt: no arrow mapping for {dtype}")


def render_ztxt_lines(df: DataFrame, schema_node: dict | None = None) -> DataFrame:
    """DataFrame -> single-column ``value: string`` DataFrame of ztxt lines.

    Map tables are globally ordered by key first (Logical.Map is an ordered
    map — Text/Logical.hs:108-116); at scale this is one range-partitioned
    sort, the same cost zebra pays streaming a sorted file.
    """
    node = schema_node or struct_to_zschema(df.schema)
    kind = table_kind(node)
    if kind == "binary":
        raise ValueError("ztxt: binary tables export raw bytes — use write_ztxt_file")
    if kind == "map":
        df = df.orderBy("key")
    render = line_renderer(node)
    names = df.schema.fieldNames()

    def run(batches):
        for rb in batches:
            rows = rb.to_pylist()
            if rows:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([render(r) for r in rows], pa.string())],
                    names=["value"],
                )

    _ = names
    return df.mapInArrow(run, schema="value string")


def write_ztxt_file(df: DataFrame, path: str, schema_node: dict | None = None) -> int:
    """Single-file CLI export (zebra export --output): streams rendered
    lines through toLocalIterator — driver memory stays bounded by one
    partition.  Returns the written row count.  For cluster-scale exports
    write ``render_ztxt_lines(df).write.text(dir)`` instead."""
    node = schema_node or struct_to_zschema(df.schema)
    kind = table_kind(node)
    n = 0
    with open(path, "wb") as f:
        if kind == "binary":
            for row in df.toLocalIterator():
                v = row["value"]
                b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                f.write(b)
                n += len(b)
            return n
        for row in render_ztxt_lines(df, node).toLocalIterator():
            f.write(row["value"].encode("utf-8") + b"\n")
            n += 1
    return n
