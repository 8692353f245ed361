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
        [--filter col=value]

<table_dir> may instead be a REST loadTable URL
(http://host/v1/namespaces/{ns}/tables/{tbl}), or a catalog DISCOVERY
reference of the form http://host/v1#<table_name>: the tool then walks
the catalog's namespace tree over REST — the spec's parent= listing
with multi-level %1F namespaces — following next-page-token pagination
at every level (pageSize=1, so the token path is always exercised),
until it finds the named table, and loads that.

The optional [ref] names a branch/tag from the metadata's "refs" map —
external time travel: the reader resolves that ref's snapshot instead
of the current one.

--verify-buckets recomputes, for every data file carrying a bucket[n]
partition tuple, each row's bucket id from the source column values
with this tool's own murmur3 — a per-row proof that the exporter's
Scala hash produced the layout the spec claims (a pruning filter only
proves it for the one filtered key).

--filter exercises PARTITION PRUNING the way an external engine would:
each conjunct (comma-separated: 'col=v', or a window like
'ts>=2024-03-02,ts<2024-03-03') is transformed through every exported
partition spec field on that column. Equality prunes on any transform
(identity, day/hour/month/year, truncate[w], bucket[n] — the bucket
hash is an independent pure-python murmur3 over the spec's Appendix B
byte encodings); range conjuncts prune on the MONOTONIC transforms
(col >= a implies tuple >= transform(a); col < b implies tuple <=
transform(b)) and never on bucket. Data files whose tuple cannot match
are never opened, and the tool prints "OPENED k OF n DATA FILES" so a
caller can assert that a transform-spec export actually prunes (a bug
that only mis-prunes leaves full reads correct — row diffs alone
cannot catch it). The expected parquet should then hold the FILTERED
row set.

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
# Iceberg partition transforms (for --filter pruning)
# ---------------------------------------------------------------------------

def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Reference murmur3 (the spec's Appendix B hash), independent of
    the Scala implementation that wrote the export."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n & 3)
    for i in range(0, rounded, 4):
        k = struct.unpack_from("<I", data, i)[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


_EPOCH = __import__("datetime").date(1970, 1, 1)


def _parse_temporal(col_type: str, raw: str):
    """(epoch_days, micros_since_epoch) of a date/timestamp literal."""
    import datetime as dt
    if col_type == "date":
        d = dt.date.fromisoformat(raw)
        return (d - _EPOCH).days, None
    t = dt.datetime.fromisoformat(raw.replace(" ", "T"))
    if t.tzinfo is None:
        t = t.replace(tzinfo=dt.timezone.utc)
    # floor semantics: int(timestamp()) truncates toward zero, which is
    # wrong for pre-1970 instants (-1.5s would yield -500000 micros)
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    micros = (t - epoch) // dt.timedelta(microseconds=1)
    return micros // 86_400_000_000, micros


def transform_literal(transform: str, col_type: str, raw: str):
    """The partition-tuple value an equality literal maps to under an
    exported transform — i.e. what a conformant engine prunes with."""
    if transform == "identity":
        if col_type in ("int", "long"):
            return int(raw)
        if col_type == "string":
            return raw
        if col_type == "date":
            return _parse_temporal(col_type, raw)[0]
        if col_type in ("timestamp", "timestamptz"):
            return _parse_temporal(col_type, raw)[1]
        raise ValueError(f"identity filter unsupported for {col_type}")
    if transform == "day":
        return _parse_temporal(col_type, raw)[0]
    if transform == "hour":
        return _parse_temporal(col_type, raw)[1] // 3_600_000_000
    if transform in ("month", "year"):
        import datetime as dt
        d = dt.date.fromisoformat(raw.split(" ")[0].split("T")[0])
        return (d.year - 1970) * 12 + d.month - 1 if transform == "month" \
            else d.year - 1970
    if transform.startswith("truncate["):
        w = int(transform[len("truncate["):-1])
        if col_type == "string":
            # Iceberg truncates by CODE POINTS
            cps = list(raw)
            return "".join(cps[:w])
        x = int(raw)
        return x - (x % w)  # python % is already floor-mod
    if transform.startswith("bucket["):
        n = int(transform[len("bucket["):-1])
        if col_type in ("int", "long"):
            data = struct.pack("<q", int(raw))
        elif col_type == "string":
            data = raw.encode()
        elif col_type == "date":
            data = struct.pack("<q", _parse_temporal(col_type, raw)[0])
        elif col_type in ("timestamp", "timestamptz"):
            data = struct.pack("<q", _parse_temporal(col_type, raw)[1])
        else:
            raise ValueError(f"bucket filter unsupported for {col_type}")
        return (murmur3_x86_32(data) & 0x7FFFFFFF) % n
    raise ValueError(f"unsupported transform: {transform}")


def literal_py(col_type: str, raw: str):
    """The literal as the python value DuckDB returns for the column —
    the residual filter applied to rows of files that DID open."""
    import datetime as dt
    if col_type in ("int", "long"):
        return int(raw)
    if col_type == "string":
        return raw
    if col_type == "date":
        return dt.date.fromisoformat(raw)
    if col_type in ("timestamp", "timestamptz"):
        t = dt.datetime.fromisoformat(raw.replace(" ", "T"))
        if col_type == "timestamptz" and t.tzinfo is None:
            t = t.replace(tzinfo=dt.timezone.utc)
        return t
    raise ValueError(f"filter unsupported for {col_type}")


# ---------------------------------------------------------------------------
# Iceberg read protocol
# ---------------------------------------------------------------------------

def local_path(uri: str) -> str:
    p = urlparse(uri)
    if p.scheme in ("", "file"):
        return unquote(p.path) if p.scheme == "file" else uri
    raise ValueError(f"non-local file uri: {uri}")


def bucket_of_value(v, col_type: str, n: int) -> int:
    import datetime as dt
    if v is None:
        raise ValueError("null in a bucket-claimed file")
    if col_type in ("int", "long"):
        data = struct.pack("<q", int(v))
    elif col_type == "string":
        data = v.encode()
    elif col_type == "date":
        data = struct.pack("<q", (v - _EPOCH).days)
    elif col_type in ("timestamp", "timestamptz"):
        t = v if v.tzinfo else v.replace(tzinfo=dt.timezone.utc)
        # floor division handles pre-epoch instants (int() truncation
        # toward zero would mis-hash them)
        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        micros = (t - epoch) // dt.timedelta(microseconds=1)
        data = struct.pack("<q", micros)
    else:
        raise ValueError(f"bucket verify unsupported for {col_type}")
    return (murmur3_x86_32(data) & 0x7FFFFFFF) % n


def _decode_bound(col_type, data: bytes):
    """Iceberg Appendix D single-value deserialization for the bound
    types the exporter writes; None when this checker has no rule."""
    import datetime as dt
    if col_type in ("int", "date"):
        return struct.unpack("<i", data)[0]
    if col_type in ("long", "timestamp", "timestamptz"):
        return struct.unpack("<q", data)[0]
    if col_type == "float":
        return struct.unpack("<f", data)[0]
    if col_type == "double":
        return struct.unpack("<d", data)[0]
    if col_type == "boolean":
        return data == b"\x01"
    if col_type == "string":
        return data.decode()
    if isinstance(col_type, str) and col_type.startswith("decimal"):
        import decimal
        import re as _re
        m = _re.fullmatch(r"decimal\((\d+),\s*(-?\d+)\)", col_type)
        scale = int(m.group(2))
        unscaled = int.from_bytes(data, "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-scale)
    return None


def _to_bound_domain(v, col_type):
    """An actual parquet value in the bound's comparison domain."""
    import datetime as dt
    if v is None:
        return None
    if col_type == "date":
        return (v - _EPOCH).days
    if col_type in ("timestamp", "timestamptz"):
        t = v if getattr(v, "tzinfo", None) else v.replace(tzinfo=dt.timezone.utc)
        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        return (t - epoch) // dt.timedelta(microseconds=1)
    return v


def verify_bounds(meta, schema, name_by_id, data_files, con):
    """Recompute every file's per-column min/max/null count with DuckDB
    and check the manifest's claims — the external FILE-SKIPPING
    contract (a bounds serialization bug makes engines silently
    mis-skip). null counts must be exact; numeric/temporal bounds must
    be exact; string/float/double/decimal bounds must CONTAIN the
    actual range (the spec allows truncated string bounds). Returns
    (files_checked, claims_checked); raises on the first violation."""
    type_by_id = {f["id"]: f["type"] for f in schema["fields"]}
    exact = ("int", "long", "date", "timestamp", "timestamptz", "boolean")
    checked = 0
    for rec in data_files:
        claims = {}
        for kv in rec["lower"]:
            claims.setdefault(kv["key"], {})["lower"] = kv["value"]
        for kv in rec["upper"]:
            claims.setdefault(kv["key"], {})["upper"] = kv["value"]
        for kv in rec["nulls"]:
            claims.setdefault(kv["key"], {})["nulls"] = kv["value"]
        checkable = [
            (fid, name_by_id[fid], type_by_id[fid]) for fid in sorted(claims)
            if fid in name_by_id and isinstance(type_by_id.get(fid), str)]
        if not checkable:
            continue
        # ONE scan per file computes every claimed column's aggregates
        # (a per-column query would re-read the parquet C times)
        sel = ", ".join(
            f'min("{n}"), max("{n}"), count(*) - count("{n}")'
            for _, n, _ in checkable)
        row = con.execute(
            f"SELECT {sel} FROM read_parquet(?)",
            [local_path(rec["path"])]).fetchone()
        for i, (fid, name, col_type) in enumerate(checkable):
            c = claims[fid]
            amin, amax, anulls = row[3 * i], row[3 * i + 1], row[3 * i + 2]
            amin = _to_bound_domain(amin, col_type)
            amax = _to_bound_domain(amax, col_type)
            if "nulls" in c and c["nulls"] != anulls:
                raise AssertionError(
                    f"null count mismatch in {rec['path']} col {name}: "
                    f"claimed {c['nulls']}, actual {anulls}")
            checked += 1 if "nulls" in c else 0
            for side, cmp_ok in (("lower", lambda b, a: b <= a),
                                 ("upper", lambda b, a: b >= a)):
                if side not in c:
                    continue
                bound = _decode_bound(col_type, c[side])
                if bound is None:
                    continue  # no deserialization rule here: not checkable
                actual = amin if side == "lower" else amax
                if actual is None:
                    continue  # all-null file: nothing to skip wrongly
                ok = (bound == actual if col_type in exact
                      else cmp_ok(bound, actual))
                if not ok:
                    raise AssertionError(
                        f"{side} bound violation in {rec['path']} col {name} "
                        f"({col_type}): claimed {bound!r}, actual {actual!r}")
                checked += 1
    return len(data_files), checked


def verify_partition_stats(meta, data_files, con, snap_id) -> int:
    """Verify the exported Iceberg `partition-statistics` entry: re-read
    its Avro file and recompute every partition's data_record_count /
    data_file_count / total_data_file_size_in_bytes from the snapshot's
    FULL data-file list — record counts recomputed with DuckDB
    (count(*) per parquet, never trusting the manifests), sizes from
    the filesystem. Unpartitioned tables claim one empty-tuple row.
    Returns partitions verified (0 = no entry for this snapshot);
    raises on the first disagreement."""
    import os
    entries = [e for e in (meta.get("partition-statistics") or [])
               if e["snapshot-id"] == snap_id]
    checked = 0
    for entry in entries:
        path = Path(local_path(entry["statistics-path"]))
        assert path.stat().st_size == entry["file-size-in-bytes"], \
            "partition statistics file size disagrees with the metadata entry"
        claims = {}
        for rec in read_avro(path):
            assert rec["spec_id"] == meta["default-spec-id"], \
                f"partition statistics under unexpected spec {rec['spec_id']}"
            key = tuple(sorted((rec.get("partition") or {}).items()))
            assert key not in claims, \
                f"duplicate partition tuple in statistics file: {key}"
            claims[key] = (rec["data_record_count"], rec["data_file_count"],
                           rec["total_data_file_size_in_bytes"])
        actual = {}
        for f in data_files:
            key = tuple(sorted((f["part"] or {}).items()))
            p = local_path(f["path"])
            rows = con.execute(
                "SELECT count(*) FROM read_parquet(?)", [p]).fetchone()[0]
            r, n, b = actual.get(key, (0, 0, 0))
            actual[key] = (r + rows, n + 1, b + os.path.getsize(p))
        if claims != actual:
            only_c = {k: v for k, v in claims.items() if actual.get(k) != v}
            only_a = {k: v for k, v in actual.items() if claims.get(k) != v}
            raise AssertionError(
                f"partition statistics disagree: claimed {only_c}, "
                f"recomputed {only_a}")
        checked += len(claims)
    return checked


def verify_buckets(meta, schema, name_by_id, data_files, con) -> int:
    """Recompute every row's bucket for files claiming bucket tuples;
    returns rows checked, raises on the first mismatch."""
    spec = next(s for s in meta["partition-specs"]
                if s["spec-id"] == meta["default-spec-id"])
    type_by_name = {f["name"]: f["type"] for f in schema["fields"]}
    import re as _re
    bucket_fields = []
    for f in spec["fields"]:
        m = _re.fullmatch(r"bucket\[(\d+)\]", f["transform"])
        if m:
            src = name_by_id[f["source-id"]]
            bucket_fields.append((f["name"], src, int(m.group(1)),
                                  type_by_name[src]))
    checked = 0
    for rec in data_files:
        for fname, src, n, col_type in bucket_fields:
            claimed = rec["part"].get(fname)
            if claimed is None:
                continue
            vals = con.execute(
                f'SELECT "{src}" FROM read_parquet(?)',
                [local_path(rec["path"])]).fetchall()
            for (v,) in vals:
                got = bucket_of_value(v, col_type, n)
                if got != claimed:
                    raise AssertionError(
                        f"bucket mismatch in {rec['path']}: value {v!r} "
                        f"hashes to bucket {got}, file claims {claimed}")
                checked += 1
    return checked


def rest_discover(base_url, table_ref):
    """BFS the catalog's namespace tree over REST and return the
    loadTable URL of the referenced table. `table_ref` is either a
    bare table name (first match wins — fine for a unique name) or a
    dot-qualified `ns[.ns2...].table`, which must match BOTH the full
    namespace path and the name (the shared warehouse accumulates
    fixtures per scale factor, and a bare `supplier_ml` would resolve
    to whichever SF's namespace sorts first). Independent of the
    engine's own client code: listings go through the spec's parent=
    parameter (multi-level namespaces %1F-joined), and EVERY listing
    request uses pageSize=1 so the next-page-token/pageToken protocol
    is exercised on each walk, not just on catalogs that happen to be
    large."""
    want_ns, _, table_name = table_ref.rpartition(".")
    want_levels = want_ns.split(".") if want_ns else None
    import urllib.request
    import urllib.parse

    def get(url):
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read().decode())

    def paged(url_base, key):
        token = None
        while True:
            url = url_base + ("&" if "?" in url_base else "?") + "pageSize=1"
            if token:
                url += "&pageToken=" + urllib.parse.quote(token, safe="")
            body = get(url)
            yield from body.get(key, [])
            token = body.get("next-page-token")
            if not token:
                return

    queue = [[]]  # namespace level-lists, root first
    while queue:
        ns = queue.pop(0)
        enc = urllib.parse.quote("\x1f".join(ns), safe="")
        if ns and (want_levels is None or ns == want_levels):
            for ident in paged(f"{base_url}/namespaces/{enc}/tables",
                               "identifiers"):
                if ident["name"] == table_name:
                    tenc = urllib.parse.quote(table_name, safe="")
                    return f"{base_url}/namespaces/{enc}/tables/{tenc}"
        list_url = f"{base_url}/namespaces"
        if ns:
            list_url += "?parent=" + enc
        queue.extend(paged(list_url, "namespaces"))
    raise FileNotFoundError(
        f"table {table_ref} not found in catalog {base_url}")


def verify_statistics(meta, name_by_id, cols, rows, filtered):
    """Verify the exported Iceberg `statistics` entry (Puffin file):
    structure per the public puffin-spec (magics, footer layout,
    blob offsets), then every graft-ndv-v1 blob's NDV claim — both the
    footer property and the 8-byte big-endian payload — against the
    exact distinct count of the final merged rows. HLL++ (Spark's
    approx_count_distinct, rsd 0.05) is allowed 15% + 5 absolute;
    a claim outside that band, a malformed file, or a payload that
    disagrees with its own property fails loudly. Skipped under
    --filter (the merged rows are then a pruned subset the stats were
    never about). Returns blobs verified (0 = no statistics entry)."""
    stats = meta.get("statistics") or []
    if not stats or filtered:
        return 0
    import struct
    checked = 0
    col_idx = {c: i for i, c in enumerate(cols)}
    for entry in stats:
        raw = Path(local_path(entry["statistics-path"])).read_bytes()
        assert len(raw) == entry["file-size-in-bytes"], \
            "statistics file size disagrees with the metadata entry"
        magic = b"PFA1"
        assert raw[:4] == magic and raw[-4:] == magic, "bad puffin magic"
        payload_size = struct.unpack("<i", raw[-12:-8])[0]
        flags = struct.unpack("<i", raw[-8:-4])[0]
        assert flags == 0, "compressed footer payload unsupported"
        footer_start = len(raw) - 12 - payload_size - 4
        assert raw[footer_start:footer_start + 4] == magic, \
            "bad puffin footer magic"
        assert len(raw) - footer_start == entry["file-footer-size-in-bytes"]
        footer = json.loads(
            raw[footer_start + 4:footer_start + 4 + payload_size].decode())
        for blob in footer.get("blobs", []):
            if blob["type"] != "graft-ndv-v1":
                continue
            claimed = int(blob["properties"]["ndv"])
            payload = raw[blob["offset"]:blob["offset"] + blob["length"]]
            assert struct.unpack(">q", payload)[0] == claimed, \
                "puffin payload disagrees with its own ndv property"
            col = name_by_id[blob["fields"][0]]
            i = col_idx[col]
            exact = len({r[i] for r in rows if r[i] is not None})
            tol = max(5, 0.15 * exact)
            assert abs(claimed - exact) <= tol, (
                f"NDV claim for {col} is {claimed}, exact distinct of the "
                f"merged rows is {exact} (tolerance {tol:.0f})")
            checked += 1
    return checked


def load_metadata(table_ref):
    """The current metadata document — from a table DIRECTORY (mirror
    hint file) or from an Iceberg REST catalog loadTable URL
    (`http://host/v1/namespaces/{ns}/tables/{tbl}`), the protocol an
    external engine discovers tables through. The REST result inlines
    the same document the mirror published, so both paths verify the
    identical snapshot."""
    ref = str(table_ref)
    if ref.startswith("http://") or ref.startswith("https://"):
        import urllib.request
        with urllib.request.urlopen(ref) as r:
            body = json.loads(r.read().decode())
        return body["metadata"]
    md = Path(ref) / "metadata"
    hint = int((md / "version-hint.text").read_text().strip())
    meta_file = md / f"v{hint}.metadata.json"
    if not meta_file.is_file():
        raise FileNotFoundError(
            f"stale or missing mirror: {meta_file} (hint={hint})")
    return json.loads(meta_file.read_text())


def read_iceberg_table(table_dir, ref=None, filt=None, check_buckets=False,
                       check_bounds=False):
    """Returns (column_names, rows, opened, total_data_files) of the
    current snapshot, or of the snapshot a branch/tag ref points at
    (external time travel). `filt` is an optional (col, raw_literal)
    equality: partition tuples prune data files per the exported spec
    BEFORE any parquet opens; a residual filter applies to the rest."""
    meta = load_metadata(table_dir)
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
                "part": df.get("partition") or {},
                "lower": df.get("lower_bounds") or [],
                "upper": df.get("upper_bounds") or [],
                "nulls": df.get("null_value_counts") or [],
            }
            content = df["content"]
            (data_files if content == 0 else
             pos_deletes if content == 1 else eq_deletes).append(rec)

    # --filter: resolve each conjunct against the exported partition
    # spec and drop data files whose tuple cannot match — the pruning
    # path a conformant external engine takes, re-enacted independently.
    # Equality uses every transform; range conjuncts use the MONOTONIC
    # ones (tuple >= transform(lo), tuple <= transform(hi)) and skip
    # bucket fields (hashing destroys order).
    total_data = len(data_files)
    # partition statistics are snapshot-level claims: verified against
    # the FULL file list, captured before any --filter pruning
    all_data_files = list(data_files)
    residuals = []
    if filt:
        type_by_name = {f["name"]: f["type"] for f in schema["fields"]}
        spec = next(s for s in meta["partition-specs"]
                    if s["spec-id"] == meta["default-spec-id"])
        constraints = []  # (field_name, op, tuple_value)
        for fcol, op, raw in filt:
            if fcol not in type_by_name:
                raise ValueError(f"no such filter column: {fcol}")
            col_type = type_by_name[fcol]
            if not isinstance(col_type, str):
                raise ValueError(f"filter unsupported for nested type on {fcol}")
            for f in spec["fields"]:
                if name_by_id.get(f["source-id"]) != fcol:
                    continue
                is_bucket = f["transform"].startswith("bucket[")
                if op != "=" and is_bucket:
                    continue
                want = transform_literal(f["transform"], col_type, raw)
                # floor-style transforms: col >= a ⇒ t(col) >= t(a);
                # col <= b (and col < b) ⇒ t(col) <= t(b)
                cmp = "=" if op == "=" else (">=" if op in (">", ">=") else "<=")
                constraints.append((f["name"], cmp, want))
            residuals.append((fcol, op, literal_py(col_type, raw)))
        def survives(rec):
            for fname, cmp, want in constraints:
                got = rec["part"].get(fname)
                if got is None:
                    continue
                if cmp == "=" and got != want:
                    return False
                if cmp == ">=" and got < want:
                    return False
                if cmp == "<=" and got > want:
                    return False
            return True
        data_files = [f for f in data_files if survives(f)]

    con = duckdb.connect()

    if check_buckets:
        n_checked = verify_buckets(meta, schema, name_by_id, data_files, con)
        print(f"BUCKETS VERIFIED ({n_checked} rows across "
              f"{len(data_files)} data files)")

    if check_bounds:
        n_files, n_claims = verify_bounds(
            meta, schema, name_by_id, data_files, con)
        print(f"BOUNDS VERIFIED ({n_claims} claims across "
              f"{n_files} data files)")
        n_parts = verify_partition_stats(meta, all_data_files, con, snap_id)
        if n_parts:
            print(f"PARTITION STATS VERIFIED ({n_parts} partitions across "
                  f"{len(all_data_files)} data files)")

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
        for fcol, op, want in residuals:
            fi = col_idx[fcol]
            def keep(x, op=op, want=want):
                if x is None:
                    return False
                return ((op == "=" and x == want) or
                        (op == ">" and x > want) or (op == ">=" and x >= want) or
                        (op == "<" and x < want) or (op == "<=" and x <= want))
            live = [r for r in live if keep(r[fi])]
        rows.extend(live)
    if check_bounds:
        n_blobs = verify_statistics(meta, name_by_id, cols, rows, bool(filt))
        if n_blobs:
            print(f"STATISTICS VERIFIED ({n_blobs} NDV blobs)")
    return cols, rows, len(data_files), total_data


def read_expected(path: str, cols):
    con = duckdb.connect()
    sel = ", ".join(f'"{c}"' for c in cols)
    p = Path(path)
    glob = str(p / "*.parquet") if p.is_dir() else path
    return con.execute(f"SELECT {sel} FROM read_parquet(?)", [glob]).fetchall()


def norm(rows):
    import datetime as dt

    def canon(v):
        # same instant, one repr: a UTC-adjusted parquet timestamp
        # (mirror data files) and a naive one (e.g. an INT96 expected
        # dump) must compare equal
        if isinstance(v, dt.datetime) and v.tzinfo is not None:
            return repr(v.astimezone(dt.timezone.utc).replace(tzinfo=None))
        return repr(v)

    return sorted(tuple(canon(v) for v in r) for r in rows)


def main() -> int:
    args = sys.argv[1:]
    filt = None
    check_buckets = False
    check_bounds = False
    if "--verify-buckets" in args:
        check_buckets = True
        args.remove("--verify-buckets")
    if "--verify-bounds" in args:
        check_bounds = True
        args.remove("--verify-bounds")
    if "--filter" in args:
        import re as _re
        i = args.index("--filter")
        filt = []
        for part in args[i + 1].split(","):
            m = _re.fullmatch(r"([^<>=]+)(>=|<=|>|<|=)(.*)", part.strip())
            if not m:
                print(f"bad filter conjunct: {part}")
                return 2
            filt.append((m.group(1).strip(), m.group(2), m.group(3).strip()))
        args = args[:i] + args[i + 2:]
    if len(args) not in (2, 3):
        print(__doc__)
        return 2
    table_dir, expected = args[0], args[1]  # dir path or REST loadTable URL
    if table_dir.startswith("http") and "#" in table_dir:
        base, _, tname = table_dir.partition("#")
        table_dir = rest_discover(base.rstrip("/"), tname)
        print(f"DISCOVERED {table_dir}")
    ref = args[2] if len(args) == 3 else None
    cols, got, opened, total = read_iceberg_table(
        table_dir, ref, filt, check_buckets, check_bounds)
    if filt:
        shown = ",".join(f"{c}{op}{raw}" for c, op, raw in filt)
        print(f"OPENED {opened} OF {total} DATA FILES (filter {shown})")
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
