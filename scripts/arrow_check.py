#!/usr/bin/env python3
"""Cross-language Arrow interop differential for ArrowInterop.writeFeather.

Reads engine-written Feather V2 (Arrow IPC) files with REAL pyarrow — the
same library a pandas user of the reference package runs — and verifies:

  1. every extension column carries the reference's field tags
     (ARROW:extension:name / ARROW:extension:metadata) readable by plain
     pyarrow with no registration;
  2. with the reference's extension types registered (minimal mirrors of
     the PUBLIC layout in text_extensions_for_pandas
     array/arrow_conversion.py:46-118 and :304-336 — struct storage with
     span_begins/span_ends/target_text, token_begins/token_ends/tokens,
     list storage with JSON shape metadata), pyarrow reconstructs
     ExtensionArrays from the engine files;
  3. the decoded VALUES — span offsets, dictionary-decoded target text,
     tensor elements + shape, token ids and their per-row tokenization
     entries with re-derived char offsets — equal an expected parquet
     relation written by the engine next to each feather dir.

Usage: python3 scripts/arrow_check.py <dumpDir>
  where <dumpDir> holds  <name>/part-*.feather + <name>_expected/*.parquet
  for any of: spans, tensors, tokenspan, tokenspan_multi.

Exit 0 = all present datasets pass; nonzero with a message otherwise.
"""
import glob
import json
import os
import sys

import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq


# ---- minimal mirrors of the reference's extension types (public layout) ----

class _RefExt(pa.ExtensionType):
    NAME = None

    def __init__(self, storage_type):
        pa.ExtensionType.__init__(self, storage_type, self.NAME)

    def __arrow_ext_serialize__(self):
        # re-serialize whatever payload the instance was reconstructed
        # with (the reference types serialize their shape the same way) —
        # REQUIRED for the Parquet round trip to preserve the metadata
        return getattr(self, "_serialized", b"")

    @classmethod
    def __arrow_ext_deserialize__(cls, storage_type, serialized):
        inst = cls(storage_type)
        inst._serialized = serialized
        return inst


class SpanExt(_RefExt):
    NAME = "TextExtensionsSpan"


class TokenSpanExt(_RefExt):
    NAME = "TextExtensionsTokenSpan"


class TensorExt(_RefExt):
    NAME = "TextExtensionsTensor"


def register_types():
    for cls, storage in [
        (SpanExt, pa.struct([("span_begins", pa.int32()),
                             ("span_ends", pa.int32()),
                             ("target_text", pa.dictionary(pa.int32(), pa.string()))])),
        (TokenSpanExt, pa.struct([("token_begins", pa.int32()),
                                  ("token_ends", pa.int32()),
                                  ("tokens", pa.dictionary(pa.int32(), pa.string()))])),
        (TensorExt, pa.list_(pa.float32())),
    ]:
        try:
            pa.register_extension_type(cls(storage))
        except pa.ArrowKeyError:
            pass  # already registered in this process


def read_feather_dir(d):
    files = sorted(glob.glob(os.path.join(d, "part-*.feather")))
    assert files, f"no feather files under {d}"
    tables = [ipc.open_file(f).read_all() for f in files]
    return pa.concat_tables(tables).combine_chunks()


def read_expected(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    assert files, f"no parquet files under {d}"
    return pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()


def raw_field_tags(d):
    """Field name -> (ext name, ext metadata) from the untyped schema."""
    f = sorted(glob.glob(os.path.join(d, "part-*.feather")))[0]
    # read the schema bytes without extension reconstruction by dropping
    # the metadata lookup down to the field level
    schema = ipc.open_file(f).schema
    out = {}
    for field in schema:
        md = field.metadata or {}
        out[field.name] = (
            md.get(b"ARROW:extension:name", b"").decode() or None,
            md.get(b"ARROW:extension:metadata", b"").decode())
    return out


def ext_column(table, name, expect_ext):
    col = table.column(name)
    typ = col.type
    assert isinstance(typ, pa.ExtensionType) and typ.extension_name == expect_ext, \
        f"column {name}: expected reconstructed {expect_ext}, got {typ}"
    return col.combine_chunks().storage


def rows_sorted(pairs):
    return sorted(pairs, key=lambda t: tuple(str(x) for x in t))


def check_spans(dump, tags):
    d = os.path.join(dump, "spans")
    assert tags["span"][0] == "TextExtensionsSpan", f"span tag: {tags['span']}"
    t = read_feather_dir(d)
    storage = ext_column(t, "span", "TextExtensionsSpan")
    names = [storage.type.field(i).name for i in range(storage.type.num_fields)]
    assert names == ["span_begins", "span_ends", "target_text"], names
    assert pa.types.is_dictionary(storage.type.field(2).type), \
        "target_text must be dictionary-encoded"
    begins = storage.field(0).to_pylist()
    ends = storage.field(1).to_pylist()
    texts = storage.field(2).to_pylist()  # dictionary decode
    ids = t.column("doc_id").to_pylist()
    matches = t.column("match").to_pylist()
    got = rows_sorted(zip(ids, begins, ends, texts, matches))
    exp = read_expected(os.path.join(dump, "spans_expected"))
    want = rows_sorted(zip(exp.column("doc_id").to_pylist(),
                           exp.column("begin").to_pylist(),
                           exp.column("end").to_pylist(),
                           exp.column("target_text").to_pylist(),
                           exp.column("match").to_pylist()))
    assert got == want, f"spans values diverge: {got[:3]} vs {want[:3]}"
    # covered-text semantics survive the trip
    for (_, b, e, txt, m) in got:
        assert txt[b:e] == m, f"covered text mismatch: {txt[b:e]!r} != {m!r}"
    return len(got)


def check_tensors(dump, tags):
    d = os.path.join(dump, "tensors")
    name, meta = tags["vec"]
    assert name == "TextExtensionsTensor", tags["vec"]
    t = read_feather_dir(d)
    storage = ext_column(t, "vec", "TextExtensionsTensor")
    shape = json.loads(meta)
    vals = storage.to_pylist()
    assert all(len(v) == shape[0] for v in vals), \
        f"tensor rows disagree with shape metadata {shape}"
    ids = t.column("row_id").to_pylist()
    got = rows_sorted((i, tuple(round(x, 5) for x in v)) for i, v in zip(ids, vals))
    exp = read_expected(os.path.join(dump, "tensors_expected"))
    want = rows_sorted((i, tuple(round(x, 5) for x in v))
                       for i, v in zip(exp.column("row_id").to_pylist(),
                                       exp.column("vec").to_pylist()))
    assert got == want, f"tensor values diverge: {got[:2]} vs {want[:2]}"
    return len(got)


def check_tokenspan(dump, sub, tags):
    d = os.path.join(dump, sub)
    assert tags["ts"][0] == "TextExtensionsTokenSpan", tags["ts"]
    t = read_feather_dir(d)
    storage = ext_column(t, "ts", "TextExtensionsTokenSpan")
    names = [storage.type.field(i).name for i in range(storage.type.num_fields)]
    assert names == ["token_begins", "token_ends", "tokens"], names
    assert pa.types.is_dictionary(storage.type.field(2).type), \
        "tokens must be dictionary-encoded"
    bts = storage.field(0).to_pylist()
    ets = storage.field(1).to_pylist()
    # each tokens entry: list<struct<span_begins, span_ends, target_text:dict>>
    toks = storage.field(2).to_pylist()
    rows = []
    for rid, bt, et, entry in zip(t.column("row_id").to_pylist(), bts, ets, toks):
        spans = [(x["span_begins"], x["span_ends"], x["target_text"]) for x in entry]
        b = spans[bt][0]
        e = spans[et - 1][1]
        text = spans[0][2]
        rows.append((rid, bt, et, b, e, text))
    got = rows_sorted(rows)
    exp = read_expected(os.path.join(dump, f"{sub}_expected"))
    want = rows_sorted(zip(exp.column("row_id").to_pylist(),
                           exp.column("bt").to_pylist(),
                           exp.column("et").to_pylist(),
                           exp.column("b").to_pylist(),
                           exp.column("e").to_pylist(),
                           exp.column("text").to_pylist()))
    assert got == want, f"{sub} values diverge: {got[:3]} vs {want[:3]}"
    return len(got)


def check_parquet(dump, sub, col_name, ext_name):
    """The reference's test_parquet (array/test_span.py:489-498) performed
    on ENGINE-produced arrays: reconstruct the extension table from the
    engine's feather dir, push it through Parquet with pyarrow (pandas'
    to_parquet path), read it back, and assert the extension type, its
    serialized metadata, and every storage value survive the trip."""
    t = read_feather_dir(os.path.join(dump, sub))
    path = os.path.join(dump, f"{sub}_parquet_rt.parquet")
    pq.write_table(t, path)
    back = pq.read_table(path).combine_chunks()
    typ = back.column(col_name).type
    assert isinstance(typ, pa.ExtensionType) and typ.extension_name == ext_name, \
        f"{sub}: extension type lost through parquet: {typ}"
    orig_typ = t.column(col_name).type
    assert typ.__arrow_ext_serialize__() == orig_typ.__arrow_ext_serialize__(), \
        f"{sub}: extension metadata changed through parquet"
    got = back.column(col_name).combine_chunks().storage.to_pylist()
    want = t.column(col_name).combine_chunks().storage.to_pylist()
    assert got == want, f"{sub}: storage values diverge through parquet"
    return back.num_rows


def write_pydump(dump):
    """REVERSE direction: write Feather files with plain pyarrow in the
    reference's serialized layout (storage types + raw extension field
    tags — exactly what a pandas user of the reference produces via
    to_feather), plus expected-value parquet, for the engine's
    readFeather to consume. No extension registration needed: tags ride
    as ordinary field metadata, as in any cross-process file."""
    os.makedirs(dump, exist_ok=True)

    def ext_field(name, storage_type, ext_name, ext_meta=b""):
        return pa.field(name, storage_type, metadata={
            b"ARROW:extension:name": ext_name.encode(),
            b"ARROW:extension:metadata": ext_meta})

    def write_ipc(path, table):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with ipc.new_file(path, table.schema) as w:
            w.write_table(table)

    # spans + tensor in one file
    begins = pa.array([0, 4, 0], pa.int32())
    ends = pa.array([3, 8, 4], pa.int32())
    texts = pa.array(["key agg row", "slow fast", "slow fast"]).dictionary_encode()
    span_storage_t = pa.struct([
        pa.field("span_begins", pa.int32()), pa.field("span_ends", pa.int32()),
        pa.field("target_text", texts.type)])
    span_storage = pa.StructArray.from_arrays(
        [begins, ends, texts], fields=list(span_storage_t))
    vec = pa.array([[1.0, 2.5], [-3.0, 0.25], [7.0, -1.0]],
                   pa.list_(pa.float32()))
    schema = pa.schema([
        pa.field("doc_id", pa.int64()),
        ext_field("span", span_storage_t, "TextExtensionsSpan"),
        ext_field("vec", vec.type, "TextExtensionsTensor", b"[2]")])
    table = pa.Table.from_arrays(
        [pa.array([0, 1, 2], pa.int64()), span_storage, vec], schema=schema)
    write_ipc(os.path.join(dump, "pywritten", "part-00000.feather"), table)
    exp = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "begin": pa.array([0, 4, 0], pa.int32()),
        "end": pa.array([3, 8, 4], pa.int32()),
        "target_text": pa.array(["key agg row", "slow fast", "slow fast"]),
        "vec": vec})
    os.makedirs(os.path.join(dump, "pywritten_expected"), exist_ok=True)
    pq.write_table(exp, os.path.join(dump, "pywritten_expected", "part-0.parquet"))

    # PARQUET form of the same table (reference test_parquet's file
    # layout): pyarrow carries the extension field tags through its
    # ARROW:schema parquet metadata — the engine's native parquet reader
    # consumes the storage relation directly
    os.makedirs(os.path.join(dump, "pyparquet"), exist_ok=True)
    pq.write_table(table, os.path.join(dump, "pyparquet", "part-00000.parquet"))

    # single-tokenization token spans (the reference's supported form,
    # arrow_conversion.py:195-248): tokens = dictionary(int32,
    # list<span storage struct>), one shared tokenization entry
    tok_b = pa.array([0, 4, 8], pa.int32())
    tok_e = pa.array([3, 7, 11], pa.int32())
    tok_t = pa.array(["key agg row"] * 3).dictionary_encode()
    tok_storage = pa.StructArray.from_arrays(
        [tok_b, tok_e, tok_t],
        fields=[pa.field("span_begins", pa.int32()),
                pa.field("span_ends", pa.int32()),
                pa.field("target_text", tok_t.type)])
    tok_list = pa.ListArray.from_arrays(pa.array([0, 3], pa.int32()), tok_storage)
    tokens_dict = pa.DictionaryArray.from_arrays(
        pa.array([0, 0, 0], pa.int32()), tok_list)
    ts_storage_t = pa.struct([
        pa.field("token_begins", pa.int32()), pa.field("token_ends", pa.int32()),
        pa.field("tokens", tokens_dict.type)])
    ts_storage = pa.StructArray.from_arrays(
        [pa.array([0, 1, 0], pa.int32()), pa.array([1, 3, 3], pa.int32()),
         tokens_dict], fields=list(ts_storage_t))
    ts_schema = pa.schema([
        pa.field("row_id", pa.int64()),
        ext_field("ts", ts_storage_t, "TextExtensionsTokenSpan")])
    ts_table = pa.Table.from_arrays(
        [pa.array([0, 1, 2], pa.int64()), ts_storage], schema=ts_schema)
    write_ipc(os.path.join(dump, "pywritten_ts", "part-00000.feather"), ts_table)
    ts_exp = pa.table({
        "row_id": pa.array([0, 1, 2], pa.int64()),
        "bt": pa.array([0, 1, 0], pa.int32()),
        "et": pa.array([1, 3, 3], pa.int32()),
        "b": pa.array([0, 4, 0], pa.int32()),
        "e": pa.array([3, 11, 11], pa.int32()),
        "text": pa.array(["key agg row"] * 3)})
    os.makedirs(os.path.join(dump, "pywritten_ts_expected"), exist_ok=True)
    pq.write_table(ts_exp, os.path.join(dump, "pywritten_ts_expected", "part-0.parquet"))
    print("WROTE pywritten pywritten_ts")
    return 0


def main(dump):
    checks = [("spans", check_spans), ("tensors", check_tensors),
              ("tokenspan", lambda d, g: check_tokenspan(d, "tokenspan", g)),
              ("tokenspan_multi", lambda d, g: check_tokenspan(d, "tokenspan_multi", g))]
    present = [(n, f) for n, f in checks if os.path.isdir(os.path.join(dump, n))]
    # pass 1 BEFORE registration: plain pyarrow must surface the tags as
    # ordinary field metadata (registration consumes them into the type)
    tags = {n: raw_field_tags(os.path.join(dump, n)) for n, _ in present}
    register_types()
    for name, fn in present:
        n = fn(dump, tags[name])
        print(f"PASS {name} ({n} rows)")
    # Parquet form (reference array/test_span.py:489-498): engine arrays
    # must survive pandas' to_parquet/read_parquet path with extension
    # type, metadata, and values intact. Token spans are excluded exactly
    # as in the reference: their dictionary-of-list storage hits
    # parquet's "nested dictionary not yet supported" (the reference's
    # test_parquet lives in CharSpanArrayIOTests only, same bound).
    pq_targets = [("spans", "span", "TextExtensionsSpan"),
                  ("tensors", "vec", "TextExtensionsTensor")]
    for sub, col_name, ext_name in pq_targets:
        if os.path.isdir(os.path.join(dump, sub)):
            n = check_parquet(dump, sub, col_name, ext_name)
            print(f"PASS {sub}_parquet ({n} rows)")
    if not present:
        print(f"no datasets found under {dump}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    if sys.argv[1] == "--write":
        rc = write_pydump(sys.argv[2])
    else:
        rc = main(sys.argv[1])
    # pyarrow 16.1.0's C++ teardown (detached-thread destructor) can SIGABRT
    # after every check has already passed; skip interpreter teardown so the
    # exit code always reflects the checks, never the shutdown race.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
