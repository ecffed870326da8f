"""Reference golden-file tests for the ztxt value codec.

Feeds `zebra-cli/test/cli/import/t0{1-4}*/input.{ztxt,zschema}` VERBATIM
through tools/zs.py import -> export -> summary and compares against the
reference's own `expected` files — the same pipeline the reference's CLI
test scripts run (t0*/script).

Comparison is semantic where the reference's rendering is non-semantic:
JSON lines compare decoded (aeson emits its internal hash-map key order,
we emit sorted keys), dates/times/base64/enum-variants compare as the
exact strings INSIDE the JSON values.  Binary tables compare byte-for-byte.
"""

from __future__ import annotations

import contextlib
import io
import json
import os

import pytest

import tools.zs as zs
from zebra_spark.operators.ztxt import (
    parse_zdate,
    parse_ztime,
    render_zdate,
    render_ztime,
)

GOLDEN_ROOT = "/root/reference/zebra-cli/test/cli/import"
CASES = ["t01-array", "t02-map", "t03-binary", "t04-time"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_ROOT), reason="reference golden files not present"
)


def _parse_expected(path: str):
    """Split an `expected` file into (schema_json, data_text, summary_dict)."""
    text = open(path).read()
    schema_part = text.split("=== Schema ===", 1)[1].split("=== Data ===", 1)[0]
    data_part = text.split("=== Data ===", 1)[1].split("=== Summary ===", 1)[0]
    summary_part = text.split("=== Summary ===", 1)[1]
    summary = {}
    for ln in summary_part.strip().splitlines():
        k, v = ln.split("=", 1)
        summary[k.strip()] = v.strip()
    return json.loads(schema_part), data_part.strip("\n"), summary


def _run(argv: list[str]) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        zs.main(["--master", "local[2]"] + argv)
    return buf.getvalue()


@pytest.mark.parametrize("backend", ["blocks", "v3"])
@pytest.mark.parametrize("case", CASES)
def test_reference_golden_import_export_summary(spark, tmp_path, case, backend):
    """backend=v3 is the VERBATIM reference script flow: import to real
    ||ZEBRA||00003|| files, then export/summary directly on them."""
    base = f"{GOLDEN_ROOT}/{case}"
    blocks = str(tmp_path / "blocks")
    _run([
        "import", "--input", f"{base}/input.ztxt",
        "--schema", f"{base}/input.zschema", "--output", blocks,
    ] + (["--output-v3"] if backend == "v3" else []))
    exp_schema, exp_data, exp_summary = _parse_expected(f"{base}/expected")

    # --- schema: zebra export --schema-stdout
    got_schema = json.loads(_run(["export", "--input", blocks, "--schema-stdout"]))
    assert got_schema == exp_schema

    # --- data: zebra export --output-stdout
    got_data = _run(["export", "--input", blocks, "--output-stdout"])
    if case == "t03-binary":
        # Binary table: raw bytes, byte-identical
        assert got_data == open(f"{base}/input.ztxt").read()
    else:
        got_lines = [ln for ln in got_data.splitlines() if ln.strip()]
        exp_lines = [ln for ln in exp_data.splitlines() if ln.strip()]
        assert len(got_lines) == len(exp_lines)
        for g, e in zip(got_lines, exp_lines):
            assert json.loads(g) == json.loads(e), (g, e)

    # --- summary: zebra summary
    got_summary = json.loads(_run(["summary", "--input", blocks, "--zebra-style"]))
    for k in ("block_count", "row_count", "max_rows_per_block"):
        assert str(got_summary[k]) == exp_summary[k], k
    for k in ("first_key", "last_key"):
        if exp_summary[k].startswith("{"):
            assert json.loads(got_summary[k]) == json.loads(exp_summary[k])
        else:
            assert got_summary[k] == exp_summary[k]


def test_time_render_matches_reference_formatting():
    # fraction = shortest digits of the microsecond double, '.': dropped
    # when zero (renderCalendarTime, Time.hs:670-699)
    ms = "time_milliseconds"
    us = "time_microseconds"
    s = "time_seconds"
    assert render_ztime(parse_ztime("2017-02-03 13:35:57.790", ms), ms) == \
        "2017-02-03 13:35:57.79"
    assert render_ztime(parse_ztime("1600-03-01 00:00:00.000", ms), ms) == \
        "1600-03-01 00:00:00"
    assert render_ztime(parse_ztime("2999-12-31 23:59:59.999999", us), us) == \
        "2999-12-31 23:59:59.999999"
    assert render_ztime(parse_ztime("2017-01-01T12:34:56", s), s) == \
        "2017-01-01 12:34:56"  # 'T' separator accepted on parse
    assert parse_ztime("1600-03-01 00:00:00", us) == 0
    assert parse_ztime("2999-12-31 23:59:59.999999", us) == 44174591999999999


def test_date_bounds_and_epoch():
    assert parse_zdate("1600-03-01") == 0
    assert parse_zdate("2999-12-31") == 511279  # Date maxBound (Time.hs:167-169)
    assert render_zdate(511279) == "2999-12-31"
    assert parse_zdate("1970-01-01") == 135080  # ZEBRA_EPOCH_OFFSET_DAYS
    with pytest.raises(ValueError):
        parse_zdate("1600-02-29")  # before the epoch
    with pytest.raises(ValueError):
        parse_ztime("3000-01-01 00:00:00", "time_seconds")


def test_ztxt_value_roundtrip_property(spark, tmp_path):
    """Random-ish enum/binary/time-bearing table: ztxt render -> parse ->
    identical values (the text-format analogue of the blocks bit-identity
    law)."""
    from zebra_spark.operators.ztxt import line_parser, line_renderer

    node = {
        "array": {
            "element": {
                "struct": {
                    "fields": [
                        {"name": "id", "schema": {"int": {}}},
                        {"name": "opt", "schema": {"enum": {"variants": [
                            {"name": "none", "schema": {"unit": {}}},
                            {"name": "some", "schema": {"double": {}}},
                        ]}}},
                        {"name": "raw", "schema": {"binary": {}}},
                        {"name": "when", "schema": {"int": {"encoding": {
                            "time": {"interval": {"microseconds": {}}}}}}},
                        {"name": "tags", "schema": {"array": {"element": {"int": {}}}}},
                    ]
                }
            }
        }
    }
    render, parse = line_renderer(node), line_parser(node)
    rows = [
        {"id": i, "opt": {"tag": i % 2, "v_some": 0.0 if i % 2 == 0 else i * 1.5},
         "raw": bytes([i % 256, 255 - i % 256]),
         "when": i * 987_654_321, "tags": list(range(i % 5))}
        for i in range(50)
    ]
    back = [parse(render(r)) for r in rows]
    assert back == rows


from hypothesis import given, settings, strategies as st


@given(st.integers(min_value=0, max_value=44174591999999999))
@settings(max_examples=300, deadline=None)
def test_ztime_microseconds_roundtrip_property(us):
    """render -> parse is the identity on the full zebra Time range
    (microseconds since 1600-03-01; Time.hs:171-178 bounds)."""
    assert parse_ztime(render_ztime(us, "time_microseconds"),
                       "time_microseconds") == us


@given(st.integers(min_value=0, max_value=511279))
@settings(max_examples=300, deadline=None)
def test_zdate_roundtrip_property(days):
    assert parse_zdate(render_zdate(days)) == days


@given(st.integers(min_value=0, max_value=44174591999))
@settings(max_examples=200, deadline=None)
def test_ztime_seconds_roundtrip_property(s):
    assert parse_ztime(render_ztime(s, "time_seconds"), "time_seconds") == s


MERGE_ROOT = "/root/reference/zebra-cli/test/cli/merge"


@pytest.mark.parametrize("case", ["t01-same", "t02-different"])
def test_reference_golden_merge(spark, tmp_path, case):
    """The reference's own CLI merge golden cases, verbatim: import two
    ztxt Map tables (t02's value structs DIFFER — union must widen
    recursively, filling cash=0 / item=none defaults per the per-node
    AllowDefault), merge by key, export, compare schema + data."""
    base = f"{MERGE_ROOT}/{case}"
    b0, b1, merged = (str(tmp_path / d) for d in ("b0", "b1", "merged"))
    schemas = (
        (f"{base}/input.zschema", f"{base}/input.zschema")
        if case == "t01-same"
        else (f"{base}/input0.zschema", f"{base}/input1.zschema")
    )
    _run(["import", "--input", f"{base}/input0.ztxt", "--schema", schemas[0],
          "--output", b0])
    _run(["import", "--input", f"{base}/input1.ztxt", "--schema", schemas[1],
          "--output", b1])
    # --output-v3 writes real ||ZEBRA||00003|| files, exactly the
    # reference script ($ZEBRA merge ... --output-v3); export reads them
    _run(["merge", "--inputs", f"{b0},{b1}", "--keys", "key",
          "--output", merged, "--output-v3"])

    text = open(f"{base}/expected").read()
    exp_schema = json.loads(
        text.split("=== Schema ===", 1)[1].split("=== Data ===", 1)[0]
    )
    exp_lines = [
        ln
        for ln in text.split("=== Data ===", 1)[1].splitlines()
        if ln.strip()
    ]

    got_schema = json.loads(_run(["export", "--input", merged, "--schema-stdout"]))
    assert got_schema == exp_schema

    got_lines = [
        ln
        for ln in _run(["export", "--input", merged, "--output-stdout"]).splitlines()
        if ln.strip()
    ]
    assert len(got_lines) == len(exp_lines)
    for g, e in zip(got_lines, exp_lines):
        assert json.loads(g) == json.loads(e), (g, e)


def test_ztxt_parse_rejects_malformed():
    """Value-layer negatives: wrong variant, missing struct field, bad
    base64, malformed time — each must raise, never coerce silently
    (pValue is total over the schema, Json/Logical.hs:176-215)."""
    from zebra_spark.operators.ztxt import _parse_col

    enum_node = {"enum": {"variants": [
        {"name": "none", "schema": {"unit": {}}},
        {"name": "some", "schema": {"int": {}}},
    ]}}
    p = _parse_col(enum_node)
    with pytest.raises(ValueError, match="unknown enum variant"):
        p({"other": 1})
    with pytest.raises(ValueError):
        p({"none": {}, "some": 1})  # two keys is not a variant object
    with pytest.raises(ValueError):
        p({"none": 5})  # unit payload must be {}

    struct_p = _parse_col({"struct": {"fields": [
        {"name": "a", "schema": {"int": {}}},
        {"name": "b", "schema": {"double": {}}},
    ]}})
    with pytest.raises(ValueError, match="missing struct field"):
        struct_p({"a": 1})
    with pytest.raises(ValueError):  # int field given a string
        struct_p({"a": "x", "b": 1.0})

    bin_p = _parse_col({"binary": {}})
    with pytest.raises(Exception):
        bin_p("not//valid--base64!!")

    time_p = _parse_col({"int": {"encoding": {"time": {"interval": {"seconds": {}}}}}})
    with pytest.raises(ValueError):
        time_p("2017-13-40 99:99:99")
    with pytest.raises(ValueError):
        time_p("2017-01-01")  # date where time expected (no time-of-day)


def test_nested_union_deny_default_refuses(spark):
    """A nested subfield marked DenyDefault cannot be filled during
    widening — both schema_union and transmute must refuse."""
    from pyspark.sql import types as T

    from zebra_spark.operators.merge import schema_union, transmute

    inner_a = T.StructType([T.StructField("x", T.LongType())])
    inner_b = T.StructType([
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType(), True, {"zebra.default": "deny"}),
    ])
    a = T.StructType([T.StructField("v", inner_a)])
    b = T.StructType([T.StructField("v", inner_b)])
    with pytest.raises(ValueError, match="DenyDefault"):
        schema_union(a, b)
    df = spark.createDataFrame([((1,),)], a)
    with pytest.raises(ValueError, match="DenyDefault"):
        transmute(df, b)
    # allow-default subfield widens fine and fills 0
    inner_ok = T.StructType([
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ])
    widened = transmute(df, T.StructType([T.StructField("v", inner_ok)]))
    assert widened.collect()[0]["v"].asDict() == {"x": 1, "y": 0}


# --- random-schema ztxt roundtrip (Test/Zebra/Serial/Text/Striped.hs
# prop_roundtrip_table analogue): generate a random SchemaV1 column tree +
# values in the engine layout; render -> parse must be the identity.

_name_st = st.sampled_from(["a", "b", "c", "d", "e", "f"])


def _col_node(depth: int):
    leaf = st.one_of(
        st.just({"int": {}}),
        st.just({"double": {}}),
        st.just({"binary": {"encoding": {"utf8": {}}}}),
        st.just({"binary": {}}),
        st.just({"int": {"encoding": {"date": {}}}}),
        st.just({"int": {"encoding": {"time": {"interval": {"microseconds": {}}}}}}),
    )
    if depth <= 0:
        return leaf
    sub = _col_node(depth - 1)

    def uniq_fields(pairs):
        seen, out = set(), []
        for n, sch in pairs:
            if n not in seen:
                seen.add(n)
                out.append({"name": n, "schema": sch})
        return out

    struct = st.lists(st.tuples(_name_st, sub), min_size=1, max_size=3).map(
        lambda ps: {"struct": {"fields": uniq_fields(ps)}}
    )
    enum = st.lists(
        st.tuples(_name_st, st.one_of(st.just({"unit": {}}), sub)),
        min_size=1, max_size=3,
    ).map(lambda ps: {"enum": {"variants": uniq_fields(ps)}})
    arr = sub.map(lambda s: {"array": {"element": s}})
    return st.one_of(leaf, struct, enum, arr)


def _value_for(node, draw):
    from zebra_spark.operators.ztxt import _variant, py_default

    name, val = _variant(node, "gen")
    if name == "int":
        enc = val.get("encoding")
        if enc and "date" in enc:
            return draw(st.integers(min_value=0, max_value=511279))
        if enc and "time" in enc:
            return draw(st.integers(min_value=0, max_value=44174591999999999))
        return draw(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    if name == "double":
        return draw(st.floats(allow_nan=False, allow_infinity=False))
    if name == "binary":
        if "encoding" in val:
            return draw(st.text(max_size=12))
        return bytes(draw(st.binary(max_size=12)))
    if name == "struct":
        return {f["name"]: _value_for(f["schema"], draw) for f in val["fields"]}
    if name == "enum":
        variants = val["variants"]
        if [x["name"] for x in variants] == ["false", "true"] and all(
            "unit" in x["schema"] for x in variants
        ):
            return draw(st.booleans())
        i = draw(st.integers(min_value=0, max_value=len(variants) - 1))
        out = {"tag": i}
        for j, x in enumerate(variants):
            if "unit" in x["schema"]:
                continue
            out[f"v_{x['name']}"] = (
                _value_for(x["schema"], draw) if j == i else py_default(x["schema"])
            )
        return out
    if name == "array":
        n = draw(st.integers(min_value=0, max_value=3))
        return [_value_for(val["element"], draw) for _ in range(n)]
    raise AssertionError(name)


@given(st.data())
@settings(max_examples=120, deadline=None)
def test_ztxt_random_schema_roundtrip(data):
    from zebra_spark.operators.ztxt import line_parser, line_renderer

    fields = data.draw(
        st.lists(st.tuples(_name_st, _col_node(2)), min_size=1, max_size=4)
    )
    seen, uniq = set(), []
    for n, sch in fields:
        if n not in seen:
            seen.add(n)
            uniq.append({"name": n, "schema": sch})
    node = {"array": {"element": {"struct": {"fields": uniq}}}}
    render, parse = line_renderer(node), line_parser(node)
    for _ in range(3):
        row = {f["name"]: _value_for(f["schema"], data.draw) for f in uniq}
        assert parse(render(row)) == row


def test_binary_table_import_rejects_invalid_utf8(spark, tmp_path):
    """A Binary table with utf8 encoding must REJECT malformed bytes on
    import (validateBinary, Text/Logical.hs:96-101) — Spark's decode
    raises on malformed input rather than substituting U+FFFD."""
    p = tmp_path / "bad.ztxt"
    p.write_bytes(b"ok line\n\xff\xfe broken\n")
    zschema = '{"version":"v0","schema":{"binary":{"encoding":{"utf8":{}}}}}'
    from zebra_spark.operators.ztxt import read_ztxt

    df = read_ztxt(spark, str(p), zschema)
    with pytest.raises(Exception, match="(?i)utf|malformed|invalid"):
        df.collect()
