#!/usr/bin/env python3
"""Independent Apache Iceberg v2 reader for graft's exported tables.

Purpose: break the export's self-confirmation loop. The in-repo
re-enactment (IcebergExportSpec) and the importer (IcebergImport) are
both graft Scala — a shared misreading of the Iceberg spec would pass
its own round-trip. This tool shares NOTHING with them: a hand-rolled
pure-python Avro container decoder (no fastavro, no Iceberg library)
walks version-hint -> metadata.json -> manifest-list Avro -> manifest
Avro, applies v2 position/equality delete files per the spec's
sequence-number rules, reads the parquet through DuckDB, and diffs the
resulting row multiset against an expected parquet dump (e.g. what
graft's own scan wrote).

Usage:
    python3 tools/check_iceberg.py <table_dir> <expected_parquet_path> [ref]

The optional [ref] names a branch/tag from the metadata's "refs" map —
external time travel: the reader resolves that ref's snapshot instead
of the current one.

<expected_parquet_path> may be a single .parquet file, a directory of
part files, or a glob. Exit 0 and "MATCH (n rows)" on success; exit 1
with a diff sample otherwise.

Only the stdlib + duckdb (driver-side dependency, same as
tools/check.py) are used.
"""

import io
import json
import struct
import sys
from pathlib import Path
from urllib.parse import urlparse, unquote

import duckdb


# ---------------------------------------------------------------------------
# Minimal Avro binary decoder (container files, null codec)
# ---------------------------------------------------------------------------

class AvroReader:
    """Decodes an Avro Object Container File written with the null codec,
    using the writer schema embedded in the file header."""

    MAGIC = b"Obj\x01"

    def __init__(self, data: bytes):
        self.buf = io.BytesIO(data)
        if self.buf.read(4) != self.MAGIC:
            raise ValueError("not an Avro object container file")
        meta = self._read_map_bytes()
        codec = meta.get("avro.codec", b"null").decode()
        if codec != "null":
            raise ValueError(f"unsupported Avro codec: {codec}")
        self.schema = json.loads(meta["avro.schema"].decode())
        self.meta = {k: v for k, v in meta.items()}
        self.sync = self.buf.read(16)
        self.named = {}
        self._register_names(self.schema)

    # -- varint / primitives ------------------------------------------------

    def _zigzag(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.buf.read(1)
            if not b:
                raise EOFError("EOF inside varint")
            byte = b[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def _bytes(self) -> bytes:
        n = self._zigzag()
        return self.buf.read(n)

    def _read_map_bytes(self):
        out = {}
        while True:
            n = self._zigzag()
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                self._zigzag()
            for _ in range(n):
                k = self._bytes().decode()
                out[k] = self._bytes()

    # -- schema-driven decode -------------------------------------------------

    def _register_names(self, schema):
        if isinstance(schema, dict):
            t = schema.get("type")
            if t in ("record", "fixed", "enum") and "name" in schema:
                self.named[schema["name"]] = schema
            if t == "record":
                for f in schema.get("fields", []):
                    self._register_names(f["type"])
            elif t == "array":
                self._register_names(schema.get("items"))
            elif t == "map":
                self._register_names(schema.get("values"))
        elif isinstance(schema, list):
            for s in schema:
                self._register_names(s)

    def _decode(self, schema):
        if isinstance(schema, list):  # union: varint branch index
            idx = self._zigzag()
            return self._decode(schema[idx])
        if isinstance(schema, str):
            if schema in self.named:
                return self._decode(self.named[schema])
            if schema == "null":
                return None
            if schema == "boolean":
                return self.buf.read(1) == b"\x01"
            if schema in ("int", "long"):
                return self._zigzag()
            if schema == "float":
                return struct.unpack("<f", self.buf.read(4))[0]
            if schema == "double":
                return struct.unpack("<d", self.buf.read(8))[0]
            if schema == "bytes":
                return self._bytes()
            if schema == "string":
                return self._bytes().decode()
            raise ValueError(f"unsupported Avro type: {schema}")
        t = schema["type"]
        if t == "record":
            return {f["name"]: self._decode(f["type"]) for f in schema["fields"]}
        if t == "array":
            items = []
            while True:
                n = self._zigzag()
                if n == 0:
                    return items
                if n < 0:
                    n = -n
                    self._zigzag()  # byte size, unused
                for _ in range(n):
                    items.append(self._decode(schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = self._zigzag()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self._zigzag()
                for _ in range(n):
                    out[self._bytes().decode()] = self._decode(schema["values"])
        if t == "fixed":
            return self.buf.read(schema["size"])
        if isinstance(t, (dict, list)):
            return self._decode(t)
        return self._decode(t)  # e.g. {"type": "int", "logicalType": "date"}

    def records(self):
        out = []
        while True:
            head = self.buf.read(1)
            if not head:
                return out
            self.buf.seek(-1, 1)
            count = self._zigzag()
            self._zigzag()  # block byte size
            for _ in range(count):
                out.append(self._decode(self.schema))
            if self.buf.read(16) != self.sync:
                raise ValueError("sync marker mismatch (corrupt Avro block)")


def read_avro(path: Path):
    return AvroReader(path.read_bytes()).records()


# ---------------------------------------------------------------------------
# Iceberg read protocol
# ---------------------------------------------------------------------------

def local_path(uri: str) -> str:
    p = urlparse(uri)
    if p.scheme in ("", "file"):
        return unquote(p.path) if p.scheme == "file" else uri
    raise ValueError(f"non-local file uri: {uri}")


def read_iceberg_table(table_dir: Path, ref=None):
    """Returns (column_names, rows) of the current snapshot, or of the
    snapshot a branch/tag ref points at (external time travel)."""
    md = table_dir / "metadata"
    hint = int((md / "version-hint.text").read_text().strip())
    meta_file = md / f"v{hint}.metadata.json"
    if not meta_file.is_file():
        raise FileNotFoundError(
            f"stale or missing mirror: {meta_file} (hint={hint})")
    meta = json.loads(meta_file.read_text())
    assert meta["format-version"] == 2, "expected Iceberg v2"

    schema = next(s for s in meta["schemas"]
                  if s["schema-id"] == meta["current-schema-id"])
    cols = [f["name"] for f in schema["fields"]]
    name_by_id = {f["id"]: f["name"] for f in schema["fields"]}

    snap_id = (meta["refs"][ref]["snapshot-id"] if ref
               else meta["current-snapshot-id"])
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == snap_id)
    manifest_list = read_avro(Path(local_path(snap["manifest-list"])))

    data_files, pos_deletes, eq_deletes = [], [], []
    for m in manifest_list:
        entries = read_avro(Path(local_path(m["manifest_path"])))
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            df = e["data_file"]
            seq = e["sequence_number"]
            if seq is None:  # spec: inherit from the manifest
                seq = m["sequence_number"]
            rec = {
                "path": df["file_path"],
                "seq": seq,
                "eq_ids": df.get("equality_ids") or [],
            }
            content = df["content"]
            (data_files if content == 0 else
             pos_deletes if content == 1 else eq_deletes).append(rec)

    con = duckdb.connect()

    # position deletes: spec columns file_path (2147483546) / pos. Each
    # tuple carries its delete file's sequence number — the spec applies
    # a position delete only to data files with seq <= the delete's seq
    # (a same-path data file ADDED AFTER the delete must keep its rows).
    pos_by_file = {}
    for d in pos_deletes:
        rel = con.execute(
            "SELECT file_path, pos FROM read_parquet(?)",
            [local_path(d["path"])]).fetchall()
        for fp, pos in rel:
            pos_by_file.setdefault(fp, []).append((d["seq"], pos))

    # equality deletes: key tuples + the sequence they were added at
    eq_sets = []
    for d in eq_deletes:
        key_cols = [name_by_id[i] for i in d["eq_ids"]]
        sel = ", ".join(f'"{c}"' for c in key_cols)
        keys = set(map(tuple, con.execute(
            f"SELECT {sel} FROM read_parquet(?)",
            [local_path(d["path"])]).fetchall()))
        eq_sets.append((d["seq"], key_cols, keys))

    col_sel = ", ".join(f'"{c}"' for c in cols)
    col_idx = {c: i for i, c in enumerate(cols)}
    rows = []
    for f in data_files:
        raw = con.execute(
            f"SELECT {col_sel}, file_row_number "
            f"FROM read_parquet(?, file_row_number=true)",
            [local_path(f["path"])]).fetchall()
        dead = {pos for dseq, pos in pos_by_file.get(f["path"], [])
                if dseq >= f["seq"]}
        live = [r[:-1] for r in raw if r[-1] not in dead]
        # equality deletes apply to data files with STRICTLY SMALLER seq
        for dseq, key_cols, keys in eq_sets:
            if dseq > f["seq"]:
                ki = [col_idx[c] for c in key_cols]
                live = [r for r in live if tuple(r[j] for j in ki) not in keys]
        rows.extend(live)
    return cols, rows


def read_expected(path: str, cols):
    con = duckdb.connect()
    sel = ", ".join(f'"{c}"' for c in cols)
    p = Path(path)
    glob = str(p / "*.parquet") if p.is_dir() else path
    return con.execute(f"SELECT {sel} FROM read_parquet(?)", [glob]).fetchall()


def norm(rows):
    return sorted(tuple(repr(v) for v in r) for r in rows)


def main() -> int:
    if len(sys.argv) not in (3, 4):
        print(__doc__)
        return 2
    table_dir, expected = Path(sys.argv[1]), sys.argv[2]
    ref = sys.argv[3] if len(sys.argv) == 4 else None
    cols, got = read_iceberg_table(table_dir, ref)
    want = read_expected(expected, cols)
    g, w = norm(got), norm(want)
    if g == w:
        print(f"MATCH ({len(g)} rows, columns: {', '.join(cols)})")
        return 0
    only_got = [r for r in g if r not in set(w)][:5]
    only_want = [r for r in w if r not in set(g)][:5]
    print(f"MISMATCH: iceberg read {len(g)} rows, expected {len(w)}")
    for r in only_got:
        print(f"  only in iceberg read: {r}")
    for r in only_want:
        print(f"  only in expected:     {r}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
