"""Legacy ||ZEBRA||00002|| factset READ support (Serial/Binary/Block.hs:
133-423, Factset/Table.hs:85-248).

The reference binary cannot run here, so the input file is hand-assembled
from the wire spec with the same codec primitives the write path pins in
tests/test_golden.py — every section (header SchemaV0 strings, entities,
flattened attributes, indices, per-attribute striped tables with V2
sized-byte-array binaries) follows the Haskell encoder byte for byte.
"""

from __future__ import annotations

import io
import json

import numpy as np
import pyarrow as pa
import pytest

from zebra_spark.codec.bytecodec import pack_sized_byte_array, pack_strings
from zebra_spark.codec.intcodec import pack_int_array
from zebra_spark.operators.zfile_v2 import (
    MAGIC_V2,
    open_zebra_v2_stream,
    read_v2_header,
    read_zebra_v2_files,
    v2_facts,
)


def _u32(n: int) -> bytes:
    return np.uint32(n).astype("<u4").tobytes()


def _strings(items: list[bytes]) -> bytes:
    lengths = np.array([len(b) for b in items], dtype=np.int64)
    return pack_strings(lengths, b"".join(items))


def _ints(vals) -> bytes:
    return pack_int_array(np.array(vals, dtype=np.int64))


def _doubles(vals) -> bytes:
    return pack_int_array(np.array(vals, dtype=np.float64).view(np.int64))


CASH = {"double": {}}
NAME = {"nested": {"table": {"binary": {}}}}


def _v2_header() -> bytes:
    names = [b"cash", b"name"]
    schemas = [
        json.dumps({"array": {"element": CASH}}).encode(),
        json.dumps({"array": {"element": NAME}}).encode(),
    ]
    return MAGIC_V2 + _u32(2) + _strings(names) + _strings(schemas)


def _v2_block() -> bytes:
    # entities: barney(hash 10, attrs cash x3 + name x1), marge(20, cash x1)
    out = _u32(2)
    out += _ints([10, 20])  # entity_id_hash
    out += _strings([b"barney", b"marge"])  # entity ids
    out += _ints([2, 1])  # entity_attr_count
    # flattened attributes (entity-major, attr ids ascending per entity)
    out += _u32(3)
    out += _ints([0, 1, 0])  # attr ids: barney cash, barney name, marge cash
    out += _ints([3, 1, 1])  # rows per (entity, attr)
    # indices, one row per fact in the same flattened order:
    # barney cash: (100,7,live) (100,7,TOMBSTONE) (200,7,live)
    # barney name: (300,9,live)
    # marge  cash: (400,7,live)
    out += _u32(5)
    out += _ints([100, 100, 200, 300, 400])  # times
    out += _ints([7, 7, 7, 9, 7])  # factset ids
    out += _ints([0, 1, 0, 0, 0])  # tombstones (wire: 0 = live)
    # tables: per attribute, all its fact rows in entity order
    out += _u32(2)
    out += _ints([0, 1])  # table ids
    out += _ints([4, 1])  # row counts (cash: 3 barney + 1 marge)
    # cash table: double column (tombstoned rows still carry a value slot)
    out += _doubles([27.5, 0.0, 13.25, 45.1])
    # name table: nested binary -> lengths int_array + u32 inner + sized bytes
    out += _ints([5])  # byte length of "homer"
    out += _u32(5) + pack_sized_byte_array(b"homer")
    return bytes(out)


@pytest.fixture(scope="module")
def v2_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("v2") / "facts.zebra"
    p.write_bytes(_v2_header() + _v2_block())
    return str(p)


def test_v2_header_parse(v2_path):
    names, nodes = read_v2_header(v2_path)
    assert names == ["cash", "name"]
    assert nodes == [CASH, NAME]


def test_v2_stream_generic_map_form(v2_path):
    with open(v2_path, "rb") as f:
        schema, blocks, _ = open_zebra_v2_stream(f)
        batches = list(blocks)
    assert [b.num_rows for b in batches] == [2]
    rows = batches[0].to_pylist()
    barney, marge = rows
    assert (barney["entity_hash"], barney["entity_id"]) == (10, "barney")
    # consecutive (100,7) facts group into ONE map entry with two values;
    # (200,7) is its own entry.  Tombstone -> tag 0 (the none variant)
    assert barney["cash"] == [
        {"time": 100, "factset_id": 7,
         "values": [{"tag": 1, "v_some": 27.5}, {"tag": 0, "v_some": 0.0}]},
        {"time": 200, "factset_id": 7,
         "values": [{"tag": 1, "v_some": 13.25}]},
    ]
    assert barney["name"] == [
        {"time": 300, "factset_id": 9,
         "values": [{"tag": 1, "v_some": b"homer"}]},
    ]
    assert (marge["entity_hash"], marge["entity_id"]) == (20, "marge")
    assert marge["cash"] == [
        {"time": 400, "factset_id": 7, "values": [{"tag": 1, "v_some": 45.1}]},
    ]
    assert marge["name"] == []


def test_v2_spark_read_and_facts(spark, v2_path):
    df = read_zebra_v2_files(spark, [v2_path])
    assert df.count() == 2
    facts = {
        (r["entity_id"], r["attribute"], r["time"], r["factset_id"]): (
            r["tombstone"], r["value"]
        )
        for r in v2_facts(df).collect()
    }
    # 4 map entries explode to 5 fact rows
    assert len(facts) == 4  # (barney,cash,100,7) carries two values
    assert facts[("barney", "name", 300, 9)] == (False, "homer")
    assert facts[("marge", "cash", 400, 7)] == (False, "45.1")


def test_v2_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.zebra"
    p.write_bytes(b"||ZEBRA||00003||" + b"\x00" * 32)
    with pytest.raises(ValueError, match="not a zebra V2 file"):
        read_v2_header(str(p))


def test_v2_facts_cli(v2_path, capsys):
    import tools.zs as zs

    zs.main(["--master", "local[2]", "facts", "--input", v2_path, "--limit", "2"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    assert all("entity_id" in json.loads(l) for l in lines)


def test_v2_upgrade_to_v3_roundtrip(spark, v2_path, tmp_path):
    """`zs upgrade`: V2 factset -> self-describing V3 map-table files; the
    V3 read-back carries the same entities and attribute entries."""
    import tools.zs as zs
    from zebra_spark.operators.zfile import read_zebra_files

    out = str(tmp_path / "v3")
    zs.main(["--master", "local[2]", "upgrade", "--input", v2_path, "--output", out])
    import glob as g

    files = sorted(g.glob(f"{out}/*.zebra"))
    assert files
    back = read_zebra_files(spark, files)
    rows = {r["key"]["entity_id"]: r.asDict(recursive=True) for r in back.collect()}
    assert set(rows) == {"barney", "marge"}
    b = rows["barney"]
    assert b["key"]["entity_hash"] == 10
    cash = b["value"]["cash"]
    assert [(e["time"], e["factset_id"]) for e in cash] == [(100, 7), (200, 7)]
    assert [v["tag"] for v in cash[0]["values"]] == [1, 0]
    assert [v["v_some"] for v in cash[0]["values"]] == [27.5, 0.0]
    assert rows["marge"]["value"]["name"] == []


@pytest.mark.parametrize("seed", [0, 1, 7, 23, 99])
def test_v2_random_structure_property(seed, tmp_path):
    """Randomized factset structures vs a direct python oracle: entity/
    attribute/index bookkeeping, per-attribute table row distribution, and
    consecutive (time, factset_id) grouping all reproduce."""
    rng = np.random.default_rng(seed)
    n_ent = int(rng.integers(1, 8))
    ent_ids = [f"e{i:03d}".encode() for i in range(n_ent)]
    hashes = rng.integers(0, 1 << 30, size=n_ent).tolist()
    # per entity: sorted subset of the 2 attrs, 1-4 rows each
    entries = []  # (ent, aid, [(time, fid, tomb)...])
    for e in range(n_ent):
        for aid in sorted(rng.choice(2, size=int(rng.integers(0, 3)), replace=False).tolist()):
            rows = [
                (int(rng.integers(0, 4)), int(rng.integers(0, 3)), int(rng.integers(0, 2)))
                for _ in range(int(rng.integers(1, 5)))
            ]
            entries.append((e, aid, rows))
    acounts = [sum(1 for e, _, _ in entries if e == i) for i in range(n_ent)]
    cash_vals = []
    name_vals = []
    for e, aid, rows in entries:
        for _ in rows:
            if aid == 0:
                cash_vals.append(float(rng.integers(0, 100)) / 4.0)
            else:
                name_vals.append(f"v{rng.integers(0, 10)}".encode())

    out = _v2_header()
    out += _u32(n_ent)
    out += _ints(hashes)
    out += _strings(ent_ids)
    out += _ints(acounts)
    out += _u32(len(entries))
    out += _ints([a for _, a, _ in entries])
    out += _ints([len(r) for _, _, r in entries])
    flat = [x for _, _, rows in entries for x in rows]
    out += _u32(len(flat))
    out += _ints([t for t, _, _ in flat])
    out += _ints([f for _, f, _ in flat])
    out += _ints([tb for _, _, tb in flat])
    tables = []
    if any(a == 0 for _, a, _ in entries):
        tables.append((0, len(cash_vals), _doubles(cash_vals)))
    if any(a == 1 for _, a, _ in entries):
        lens = _ints([len(v) for v in name_vals])
        concat = b"".join(name_vals)
        tables.append((1, len(name_vals), lens + _u32(len(concat)) + pack_sized_byte_array(concat)))
    out += _u32(len(tables))
    out += _ints([t[0] for t in tables])
    out += _ints([t[1] for t in tables])
    for _, _, payload in tables:
        out += payload
    p = tmp_path / "rand.zebra"
    p.write_bytes(bytes(out))

    with open(p, "rb") as f:
        _, blocks, _ = open_zebra_v2_stream(f)
        rows = [r for b in blocks for r in b.to_pylist()]
    assert len(rows) == n_ent

    # python oracle: per (entity, attr) run, group consecutive (t, f)
    cash_it = iter(cash_vals)
    name_it = iter(name_vals)
    want = {
        i: {"entity_hash": hashes[i], "entity_id": ent_ids[i].decode(),
            "cash": [], "name": []}
        for i in range(n_ent)
    }
    for e, aid, rrows in entries:
        attr = "cash" if aid == 0 else "name"
        groups = []
        for t, f_, tb in rrows:
            val = next(cash_it) if aid == 0 else next(name_it)
            item = {"tag": 0 if tb else 1, "v_some": val}
            if groups and groups[-1]["time"] == t and groups[-1]["factset_id"] == f_:
                groups[-1]["values"].append(item)
            else:
                groups.append({"time": t, "factset_id": f_, "values": [item]})
        want[e][attr].extend(groups)
    for i, row in enumerate(rows):
        assert row == want[i], (seed, i)


def _v2_block_second() -> bytes:
    """Second input: barney again (cash at overlapping times) + new apu."""
    out = _u32(2)
    out += _ints([10, 5])  # barney, apu  (entity order within the file)
    out += _strings([b"barney", b"apu"])
    out += _ints([1, 1])
    out += _u32(2)
    out += _ints([0, 0])  # both cash
    out += _ints([2, 1])
    # barney cash: (100, 9, live) (150, 7, live); apu cash: (50, 7, live)
    out += _u32(3)
    out += _ints([100, 150, 50])
    out += _ints([9, 7, 7])
    out += _ints([0, 0, 0])
    out += _u32(1)
    out += _ints([0])
    out += _ints([3])
    out += _doubles([1.0, 2.0, 3.0])
    return bytes(out)


def test_v2_fast_merge_semantics(spark, v2_path, tmp_path):
    """zebra_merge.c:41-46 ordering: time ASC, factset_id DESC, input order
    on exact ties; entities unioned by key."""
    from zebra_spark.operators.zfile_v2 import fast_merge_v2

    p2 = tmp_path / "facts2.zebra"
    p2.write_bytes(_v2_header() + _v2_block_second())
    merged = fast_merge_v2(spark, [[v2_path], [str(p2)]])
    rows = {r["entity_id"]: r.asDict(recursive=True) for r in merged.collect()}
    assert set(rows) == {"barney", "marge", "apu"}
    b_cash = rows["barney"]["cash"]
    # input1: (100,7)x2 values [27.5(live), 0.0(tomb)], (200,7) [13.25]
    # input2: (100,9) [1.0], (150,7) [2.0]
    # merged order: (100,9) then (100,7) [fsid DESC] then (150,7), (200,7)
    assert [(e["time"], e["factset_id"]) for e in b_cash] == [
        (100, 9), (100, 7), (150, 7), (200, 7)
    ]
    assert [v["v_some"] for v in b_cash[1]["values"]] == [27.5, 0.0]
    assert [v["tag"] for v in b_cash[1]["values"]] == [1, 0]
    assert rows["apu"]["cash"] == [
        {"time": 50, "factset_id": 7, "values": [{"tag": 1, "v_some": 3.0}]}
    ]
    assert rows["apu"]["name"] == []
    # enum layout metadata survives the merge (V3 write depends on it)
    tagmd = merged.schema["cash"].dataType.elementType["values"].dataType.elementType["tag"].metadata
    assert "zebra.enum" in tagmd


def test_v2_fast_merge_cli_to_v3(spark, v2_path, tmp_path, capsys):
    import glob as g

    import tools.zs as zs
    from zebra_spark.operators.zfile import read_zebra_files

    p2 = tmp_path / "facts2.zebra"
    p2.write_bytes(_v2_header() + _v2_block_second())
    out = str(tmp_path / "merged_v3")
    zs.main([
        "--master", "local[2]", "fast-merge",
        "--inputs", f"{v2_path},{p2}", "--output", out,
    ])
    files = sorted(g.glob(f"{out}/*.zebra"))
    assert files
    back = read_zebra_files(spark, files)
    rows = {r["key"]["entity_id"]: r.asDict(recursive=True) for r in back.collect()}
    assert set(rows) == {"barney", "marge", "apu"}
    assert [(e["time"], e["factset_id"]) for e in rows["barney"]["value"]["cash"]] == [
        (100, 9), (100, 7), (150, 7), (200, 7)
    ]


def test_v2_multiblock_entity_span_upgrade(spark, tmp_path):
    """An entity spanning two V2 blocks reads as two rows; `zs upgrade`
    collapses them into one map-table row with facts re-merged in (time,
    factset DESC) order before the V3 write (dup-free key invariant)."""
    import glob as g

    import tools.zs as zs
    from zebra_spark.operators.zfile import read_zebra_files
    from zebra_spark.operators.zfile_v2 import read_zebra_v2_files

    def blk(ent, hash_, facts):
        out = _u32(1)
        out += _ints([hash_])
        out += _strings([ent])
        out += _ints([1])
        out += _u32(1) + _ints([0]) + _ints([len(facts)])
        out += _u32(len(facts))
        out += _ints([t for t, _, _ in facts])
        out += _ints([f for _, f, _ in facts])
        out += _ints([tb for _, _, tb in facts])
        out += _u32(1) + _ints([0]) + _ints([len(facts)])
        out += _doubles([float(i) for i in range(len(facts))])
        return bytes(out)

    hdr = MAGIC_V2 + _u32(1) + _strings([b"cash"]) + _strings(
        [json.dumps({"array": {"element": CASH}}).encode()]
    )
    p = tmp_path / "span.zebra"
    p.write_bytes(
        hdr
        + blk(b"barney", 10, [(100, 7, 0), (110, 7, 0)])
        + blk(b"barney", 10, [(120, 7, 0)])
    )
    raw = read_zebra_v2_files(spark, [str(p)])
    assert raw.count() == 2  # two rows before collapsing
    out = str(tmp_path / "v3")
    zs.main(["--master", "local[2]", "upgrade", "--input", str(p), "--output", out])
    back = read_zebra_files(spark, sorted(g.glob(f"{out}/*.zebra")))
    rows = back.collect()
    assert len(rows) == 1
    cash = rows[0].asDict(recursive=True)["value"]["cash"]
    assert [(e["time"], e["factset_id"]) for e in cash] == [
        (100, 7), (110, 7), (120, 7)
    ]


def test_v2_upgrade_export_ztxt_chain(v2_path, tmp_path, capsys):
    """Full modernization chain: V2 factset -> upgrade (V3 map table) ->
    ztxt export renders reference-style lines — single-key enum variant
    objects ({"some": 27.5} / {"none": {}}), base64 binary, map-table
    {"key": ..., "value": ...} rows."""
    import tools.zs as zs

    out = str(tmp_path / "v3")
    zs.main(["--master", "local[2]", "upgrade", "--input", v2_path, "--output", out])
    capsys.readouterr()
    zs.main(["export", "--input", out, "--output-stdout"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    barney = next(l for l in lines if l["key"]["entity_id"] == "barney")
    assert barney["value"]["cash"][0]["values"] == [{"some": 27.5}, {"none": {}}]
    assert barney["value"]["name"][0]["values"] == [{"some": "aG9tZXI="}]  # b64


MAPATTR = {"nested": {"table": {"map": {"key": {"int": {}}, "value": {"int": {}}}}}}


def test_v2_map_attribute_merge(spark, tmp_path):
    """An attribute whose value is a nested MAP table (unorderable type in
    Spark) must still merge: the sort comparators compare scalar key
    fields only, never the values payload."""
    from zebra_spark.operators.zfile_v2 import fast_merge_v2

    hdr = MAGIC_V2 + _u32(1) + _strings([b"tags"]) + _strings(
        [json.dumps({"array": {"element": MAPATTR}}).encode()]
    )

    def blk(facts_kv):
        out = _u32(1) + _ints([10]) + _strings([b"barney"]) + _ints([1])
        out += _u32(1) + _ints([0]) + _ints([len(facts_kv)])
        out += _u32(len(facts_kv))
        out += _ints([t for t, _, _ in facts_kv])
        out += _ints([f for _, f, _ in facts_kv])
        out += _ints([0] * len(facts_kv))
        out += _u32(1) + _ints([0]) + _ints([len(facts_kv)])
        # nested map column: ns + u32 inner_n + key int_array + value int_array
        sizes = [len(kv) for _, _, kv in facts_kv]
        ks = [k for _, _, kv in facts_kv for k, _ in kv]
        vs = [v for _, _, kv in facts_kv for _, v in kv]
        out += _ints(sizes) + _u32(len(ks)) + _ints(ks) + _ints(vs)
        return bytes(out)

    p1 = tmp_path / "m1.zebra"
    p1.write_bytes(hdr + blk([(100, 7, [(1, 10), (2, 20)])]))
    p2 = tmp_path / "m2.zebra"
    p2.write_bytes(hdr + blk([(100, 9, [(3, 30)])]))
    merged = fast_merge_v2(spark, [[str(p1)], [str(p2)]])
    row = merged.collect()[0].asDict(recursive=True)
    assert [(e["time"], e["factset_id"]) for e in row["tags"]] == [(100, 9), (100, 7)]
    assert row["tags"][1]["values"][0]["v_some"] == {1: 10, 2: 20}


def test_v2_zero_count_attribute_entry(tmp_path):
    """The reference densifies blocks with BlockAttribute(aid, 0) entries;
    a trailing zero-count entry must not crash the grouping (r4 review:
    starts[bounds] could index at n)."""
    hdr = MAGIC_V2 + _u32(2) + _strings([b"cash", b"name"]) + _strings([
        json.dumps({"array": {"element": CASH}}).encode(),
        json.dumps({"array": {"element": NAME}}).encode(),
    ])
    out = _u32(1) + _ints([10]) + _strings([b"barney"]) + _ints([2])
    out += _u32(2) + _ints([0, 1]) + _ints([2, 0])  # name: dense ZERO entry
    out += _u32(2) + _ints([100, 100]) + _ints([7, 7]) + _ints([0, 0])
    out += _u32(2) + _ints([0, 1]) + _ints([2, 0])
    out += _doubles([1.0, 2.0])
    out += _ints([]) + _u32(0) + pack_sized_byte_array(b"")  # empty name table
    p = tmp_path / "dense.zebra"
    p.write_bytes(hdr + bytes(out))
    with open(p, "rb") as f:
        _, blocks, _ = open_zebra_v2_stream(f)
        rows = [r for b in blocks for r in b.to_pylist()]
    assert rows[0]["cash"] == [
        {"time": 100, "factset_id": 7,
         "values": [{"tag": 1, "v_some": 1.0}, {"tag": 1, "v_some": 2.0}]}
    ]
    assert rows[0]["name"] == []


def test_v2_fast_merge_cross_file_tie_order(spark, tmp_path):
    """Exact (time, factset) ties across FILES of one input set flatten in
    PATH order via the explicit __file ordinal — r4 ADVICE: relying on
    monotonically_increasing_id alone breaks when the round-robin
    repartition's partition ids don't follow the input path list."""
    from zebra_spark.operators.zfile_v2 import fast_merge_v2

    hdr = MAGIC_V2 + _u32(1) + _strings([b"cash"]) + _strings(
        [json.dumps({"array": {"element": CASH}}).encode()]
    )

    def one(v):
        out = _u32(1) + _ints([10]) + _strings([b"barney"]) + _ints([1])
        out += _u32(1) + _ints([0]) + _ints([1])
        out += _u32(1) + _ints([100]) + _ints([7]) + _ints([0])
        out += _u32(1) + _ints([0]) + _ints([1])
        out += _doubles([v])
        return bytes(out)

    paths = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0]):
        p = tmp_path / f"tie{i}.zebra"
        p.write_bytes(hdr + one(v))
        paths.append(str(p))
    merged = fast_merge_v2(spark, [paths])
    row = merged.collect()[0].asDict(recursive=True)
    assert [(e["time"], e["factset_id"]) for e in row["cash"]] == [(100, 7)]
    assert [x["v_some"] for x in row["cash"][0]["values"]] == [
        1.0, 2.0, 3.0, 4.0, 5.0
    ]


def test_v2_header_read_doubles_past_initial_size(v2_path, monkeypatch):
    """A header larger than the initial driver-side read parses via the
    doubling loop instead of failing with a truncation-style error
    (r4 ADVICE: the old single 4 MiB read had no retry)."""
    import zebra_spark.operators.zfile_v2 as z2

    monkeypatch.setattr(z2, "_HEADER_READ0", 16)  # just the magic
    names, nodes = z2.read_v2_header(v2_path)
    assert names == ["cash", "name"]
    assert nodes == [CASH, NAME]


def test_cross_file_tie_order_distinguishes_file_order(spark, tmp_path):
    """Falsification for the r6 driver fixture (v2_upgrade_roundtrip):
    facts colliding on the full (entity, time, factset_id) key across two
    files must merge their values in FILE-PATH order — so merging the same
    files in reversed path order must FLIP the values order.  This proves
    the driver row's value_seq hash actually pins the (__rank, __file,
    __seq) comparator: drop or misorder the __file ordinal and the row
    cannot stay green for both orders (zebra_merge.c:41-46 first-seen
    rule)."""
    import __spark_entry__ as entry
    from zebra_spark.operators.zfile_v2 import (
        merge_map_form,
        read_v2_header,
        read_zebra_v2_files,
        spark_schema_v2,
    )

    rows_a = [(1, "e1", {0: [(5, 1, 0, 100)]})]
    rows_b = [(1, "e1", {0: [(5, 1, 0, 200)], 1: [(5, 1, 0, "x")]})]
    p_a = str(tmp_path / "a.zebra")
    p_b = str(tmp_path / "b.zebra")
    entry._synth_v2_file(p_a, rows_a)
    entry._synth_v2_file(p_b, rows_b)
    names, nodes = read_v2_header(p_a)
    schema = spark_schema_v2(names, nodes)

    def merged_bal_values(paths):
        df = read_zebra_v2_files(spark, paths, with_ordinal=True)
        row = merge_map_form([df], schema).collect()[0].asDict(recursive=True)
        (ent,) = row["bal"]
        assert (ent["time"], ent["factset_id"]) == (5, 1)
        return [v["v_some"] for v in ent["values"]]

    assert merged_bal_values([p_a, p_b]) == [100, 200]
    assert merged_bal_values([p_b, p_a]) == [200, 100]
