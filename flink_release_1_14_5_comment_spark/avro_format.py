"""Avro file format (SURVEY §2.1; reference flink-formats/flink-avro,
`AvroRowDataDeserializationSchema.java`, `AvroWriters.java`).

A pure-Python implementation of the Avro Object Container File format
(public spec: https://avro.apache.org/docs/1.11.1/specification/) — the
environment bundles neither spark-avro nor fastavro, and the reference
treats Avro as a first-class format, so we implement the binary codec
directly and keep the SPARK side distributed:

  * read  — ``spark.read.format("binaryFile")`` lists + loads the `.avro`
    files across executors; an Arrow-batched ``mapInPandas`` decodes each
    container file into rows. One task per file, the same parallelism unit
    as the reference's `AvroInputFormat` splits (Avro files are splittable
    at block boundaries; whole-file decode is the right granularity for the
    ~128 MB files a rolling sink produces).
  * write — ``spark_partition_id()`` + ``mapInPandas`` encodes each
    partition to one container file from its executor (the FileSink layout:
    part-<partition>.avro), so the driver never sees the data.

Supported schema surface (covers every type in the testdata tables):
primitives null/boolean/int/long/float/double/bytes/string, nullable
unions ["null", T], arrays, and the logical types date (int) and
timestamp-micros (long). Codecs: null and deflate (RFC 1951, the two
codecs the spec requires).

Filesystem contract: the write path uses executor-local open() and the read
path driver-side os.listdir — ON A MULTI-HOST CLUSTER `path` MUST BE A
SHARED FILESYSTEM (NFS/FUSE mount); for HDFS/S3, swap the byte IO for a
Hadoop-FS API. Single-JVM local mode (this rig) always satisfies it.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import struct
import uuid
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # fixed marker: deterministic output for tests/diffs

# ---------------------------------------------------------------------------
# Binary encoding primitives (spec "Binary Encoding")
# ---------------------------------------------------------------------------


def _write_long(buf: io.BytesIO, n: int) -> None:
    """Zigzag + variable-length (the int and long wire format)."""
    n = (n << 1) ^ (n >> 63)
    while n & ~0x7F:
        buf.write(bytes((0x80 | (n & 0x7F),)))
        n >>= 7
    buf.write(bytes((n,)))


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(data, pos)
    return data[pos:pos + n], pos + n


# ---------------------------------------------------------------------------
# Schema mapping Spark <-> Avro (reference AvroSchemaConverter.java)
# ---------------------------------------------------------------------------

_PRIMITIVE_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def _field_avro_type(dt: T.DataType):
    for spark_t, avro_t in _PRIMITIVE_TO_AVRO.items():
        if isinstance(dt, spark_t):
            return avro_t
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _field_avro_type(dt.elementType)}
    raise NotImplementedError(f"no Avro mapping for Spark type {dt}")


def spark_to_avro_schema(schema: T.StructType, name: str = "row") -> dict:
    fields = []
    for f in schema.fields:
        t = _field_avro_type(f.dataType)
        if f.nullable:
            t = ["null", t]
        fields.append({"name": f.name, "type": t})
    return {"type": "record", "name": name, "fields": fields}


def avro_to_spark_schema(avro: dict) -> T.StructType:
    def one(t) -> tuple[T.DataType, bool]:
        if isinstance(t, list):  # union ["null", X]
            inner = [x for x in t if x != "null"]
            if len(inner) != 1:
                raise NotImplementedError(f"unsupported union {t}")
            dt, _ = one(inner[0])
            return dt, True
        if isinstance(t, dict):
            lt = t.get("logicalType")
            if lt == "date":
                return T.DateType(), False
            if lt in ("timestamp-micros", "timestamp-millis"):
                return T.TimestampType(), False
            if lt in ("local-timestamp-micros", "local-timestamp-millis"):
                return T.TimestampNTZType(), False
            if t.get("type") == "array":
                dt, _ = one(t["items"])
                return T.ArrayType(dt), False
            return one(t["type"])
        rev = {
            "boolean": T.BooleanType(), "int": T.IntegerType(),
            "long": T.LongType(), "float": T.FloatType(),
            "double": T.DoubleType(), "string": T.StringType(),
            "bytes": T.BinaryType(),
        }
        if t in rev:
            return rev[t], False
        raise NotImplementedError(f"unsupported Avro type {t!r}")

    out = []
    for f in avro["fields"]:
        dt, nullable = one(f["type"])
        out.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(out)


# ---------------------------------------------------------------------------
# Datum encode / decode
# ---------------------------------------------------------------------------


def _normalize(t):
    """(kind, nullable, item_type) from an Avro field type."""
    nullable = False
    if isinstance(t, list):
        nullable = True
        t = next(x for x in t if x != "null")
    if isinstance(t, dict):
        if t.get("type") == "array":
            return "array", nullable, _normalize(t["items"])
        lt = t.get("logicalType")
        if lt == "date":
            return "date", nullable, None
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            return "timestamp-micros", nullable, None
        return t["type"], nullable, None
    return t, nullable, None


def _encode_datum(buf: io.BytesIO, kind: str, item, v) -> None:
    if kind in ("long", "int"):
        _write_long(buf, int(v))
    elif kind == "double":
        buf.write(struct.pack("<d", float(v)))
    elif kind == "float":
        buf.write(struct.pack("<f", float(v)))
    elif kind == "string":
        _write_bytes(buf, str(v).encode("utf-8"))
    elif kind == "bytes":
        _write_bytes(buf, bytes(v))
    elif kind == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif kind == "date":
        # days since epoch (spec logical type `date`)
        _write_long(buf, (pd.Timestamp(v) - pd.Timestamp("1970-01-01")).days)
    elif kind == "timestamp-micros":
        _write_long(buf, int(pd.Timestamp(v).value // 1000))
    elif kind == "array":
        ikind, inullable, iitem = item
        seq = list(v)
        if seq:
            _write_long(buf, len(seq))
            for x in seq:
                if inullable:
                    if x is None:
                        _write_long(buf, 0)
                        continue
                    _write_long(buf, 1)
                _encode_datum(buf, ikind, iitem, x)
        _write_long(buf, 0)
    else:
        raise NotImplementedError(f"encode: {kind}")


def _decode_datum(data: bytes, pos: int, kind: str, item):
    if kind in ("long", "int"):
        return _read_long(data, pos)
    if kind == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if kind == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if kind == "string":
        b, pos = _read_bytes(data, pos)
        return b.decode("utf-8"), pos
    if kind == "bytes":
        b, pos = _read_bytes(data, pos)
        return bytes(b), pos
    if kind == "boolean":
        return data[pos] == 1, pos + 1
    if kind == "date":
        d, pos = _read_long(data, pos)
        return (pd.Timestamp("1970-01-01") + pd.Timedelta(days=d)).date(), pos
    if kind == "timestamp-micros":
        us, pos = _read_long(data, pos)
        return pd.Timestamp(us * 1000), pos
    if kind == "array":
        ikind, inullable, iitem = item
        out = []
        while True:
            n, pos = _read_long(data, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix (spec-allowed)
                n = -n
                _, pos = _read_long(data, pos)
            for _ in range(n):
                if inullable:
                    idx, pos = _read_long(data, pos)
                    if idx == 0:
                        out.append(None)
                        continue
                x, pos = _decode_datum(data, pos, ikind, iitem)
                out.append(x)
        return out, pos
    raise NotImplementedError(f"decode: {kind}")


# ---------------------------------------------------------------------------
# Object Container File
# ---------------------------------------------------------------------------


def encode_container(rows, avro_schema: dict, codec: str = "deflate",
                     block_rows: int = 4096) -> bytes:
    """Encode an iterable of row tuples (field order = schema order) into a
    complete Avro Object Container File."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    fieldspecs = [_normalize(f["type"]) for f in avro_schema["fields"]]
    out = io.BytesIO()
    out.write(MAGIC)
    # file metadata: map<string, bytes> written as one block + end marker
    meta = {"avro.schema": json.dumps(avro_schema).encode(),
            "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(_SYNC)

    buf, count = io.BytesIO(), 0

    def flush():
        nonlocal buf, count
        if not count:
            return
        payload = buf.getvalue()
        if codec == "deflate":  # raw RFC-1951 stream per spec
            c = zlib.compressobj(wbits=-15)
            payload = c.compress(payload) + c.flush()
        _write_long(out, count)
        _write_long(out, len(payload))
        out.write(payload)
        out.write(_SYNC)
        buf, count = io.BytesIO(), 0

    for row in rows:
        for (kind, nullable, item), v in zip(fieldspecs, row):
            if nullable:
                # NaN is a LEGAL Avro float/double value — only treat it as
                # the null sentinel for non-float fields (pandas materializes
                # nullable int/date columns as float-with-NaN).
                nan_is_null = kind not in ("float", "double")
                if v is None or v is pd.NaT or (
                    nan_is_null and isinstance(v, float) and pd.isna(v)
                ):
                    _write_long(buf, 0)
                    continue
                _write_long(buf, 1)
            _encode_datum(buf, kind, item, v)
        count += 1
        if count >= block_rows:
            flush()
    flush()
    return out.getvalue()


def decode_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """Parse ONLY the container header (magic + metadata map + sync marker).

    Returns (avro_schema, codec, sync, pos-of-first-data-block). Raises
    IndexError if `data` is a truncated prefix that ends inside the header —
    callers doing incremental reads catch that and fetch more bytes.
    """
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:  # negative block count ⇒ byte-size follows (spec)
            n = -n
            _, pos = _read_long(data, pos)
        for _ in range(n):
            k, pos = _read_bytes(data, pos)
            v, pos = _read_bytes(data, pos)
            meta[k.decode()] = v
    sync = data[pos:pos + 16]
    if len(sync) < 16:
        raise IndexError("truncated header: sync marker incomplete")
    pos += 16
    avro_schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    return avro_schema, codec, sync, pos


def decode_container(data: bytes) -> tuple[dict, list[tuple]]:
    """Decode a container file -> (avro_schema, rows as tuples)."""
    avro_schema, codec, sync, pos = decode_header(data)
    fieldspecs = [_normalize(f["type"]) for f in avro_schema["fields"]]

    rows: list[tuple] = []
    while pos < len(data):
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        block = data[pos:pos + size]
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bpos = 0
        for _ in range(count):
            vals = []
            for kind, nullable, item in fieldspecs:
                if nullable:
                    idx, bpos = _read_long(block, bpos)
                    if idx == 0:
                        vals.append(None)
                        continue
                v, bpos = _decode_datum(block, bpos, kind, item)
                vals.append(v)
            rows.append(tuple(vals))
    return avro_schema, rows


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def _require_driver_visible_fs(spark: SparkSession, op: str) -> None:
    """The Avro IO paths use plain open()/os.listdir — correct only when
    driver and executors share one filesystem. That's guaranteed in local
    mode (one JVM, one host). On any other master, silently "working" would
    mean losing executor-written part files, so fail loudly instead
    (ADVICE r2/r3: the one cluster-correctness landmine in the tree)."""
    master = spark.conf.get("spark.master", "")
    if not master.startswith("local"):
        raise NotImplementedError(
            f"avro {op}: plain-filesystem IO requires local mode (master="
            f"{master!r}); on a cluster route the bytes through the Hadoop "
            "FS API (or spark-avro) instead of this pure-Python codec")


def _list_parts(path: str) -> list[str]:
    """All *.avro part files under `path` (recursive — partitioned layouts
    nest them in <col>=<val>/ dirs), as paths relative to `path`."""
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith("_staging-")]
        for f in files:
            if f.endswith(".avro"):
                out.append(os.path.relpath(os.path.join(root, f), path))
    return out


def _hive_val(v) -> str:
    if v is None or (isinstance(v, float) and v != v):
        return "__HIVE_DEFAULT_PARTITION__"
    return str(v)


def write_avro(df: DataFrame, path: str, codec: str = "deflate",
               mode: str = "overwrite",
               partition_by: list[str] | None = None) -> list[str]:
    """Distributed Avro file sink: each partition encodes + writes its own
    part-<pid>.avro from the executor (FileSink bucket layout). Returns the
    written file paths (small driver-side listing, not the data).

    `mode`: "overwrite" replaces existing *.avro part files; "append" adds
    uniquely-named parts; "error"/"errorifexists" refuses a non-empty
    target. Anything else raises.

    Commit protocol (mirrors Spark's FileOutputCommitter in miniature):
    parts are staged under `<path>/_staging-<uuid>/` while the job runs;
    only after the job succeeds does the driver delete old parts (overwrite)
    and rename staged parts into place. A mid-job failure leaves the target
    exactly as it was, plus an inert staging dir. Writing an EMPTY frame
    commits one header-only container file so a later read_avro yields an
    empty result with the right schema instead of FileNotFoundError.

    SQL NULL vs NaN in nullable float/double columns is preserved exactly:
    Arrow→pandas collapses null to NaN inside mapInPandas, so the plan
    carries an explicit `isnull` mask column per nullable float field and
    the encoder writes the null union branch from the mask, never from NaN
    (NaN is a legal Avro float value; reference flink-avro keeps the two
    distinct).

    ``partition_by`` writes the Hive-style bucketed directory layout
    (``<path>/<col>=<val>/part-*.avro`` — the reference's FileSink
    BucketAssigner for flink-avro), enabling directory-level pruning on
    read. Unlike Spark's built-in writers the partition columns are kept
    in the file body too, so reading any subtree round-trips the full
    schema without partition-value recovery from paths.

    Requires local mode (single shared filesystem) — raises otherwise.
    """
    _require_driver_visible_fs(df.sparkSession, "sink")
    os.makedirs(path, exist_ok=True)
    partition_by = list(partition_by or [])
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(f"avro sink: partition column(s) {missing} not in "
                         f"schema {df.columns}")
    existing = _list_parts(path)
    suffix = ""
    if mode == "overwrite":
        pass  # old parts removed at commit time, after the job succeeds
    elif mode == "append":
        if existing:  # never collide with prior parts on append
            suffix = "-" + uuid.uuid4().hex[:8]
    elif mode in ("error", "errorifexists"):
        if existing:
            raise FileExistsError(
                f"avro sink: {path} already contains {len(existing)} part files")
    else:
        raise ValueError(f"avro sink: unsupported mode {mode!r}")
    avro_schema = spark_to_avro_schema(df.schema)
    cols = [f.name for f in df.schema.fields]
    # Nullable float/double columns need a driver-side null mask: after the
    # Arrow transfer NaN and NULL are indistinguishable in a float64 column.
    float_nullable = [
        f.name for f in df.schema.fields
        if f.nullable and isinstance(f.dataType, (T.FloatType, T.DoubleType))
    ]
    staging = os.path.join(path, f"_staging-{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)

    def _write_part(body: pd.DataFrame, pid: int, subdir: str) -> str:
        data = encode_container(
            body.itertuples(index=False, name=None), avro_schema, codec=codec)
        d = os.path.join(staging, subdir) if subdir else staging
        os.makedirs(d, exist_ok=True)
        fpath = os.path.join(d, f"part-{pid:05d}{suffix}.avro")
        with open(fpath, "wb") as fh:
            fh.write(data)
        return fpath

    def gen(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pid = int(pdf["__pid"].iloc[0])
        body = pdf[cols].copy()
        for c in float_nullable:
            # object dtype can hold None alongside float NaN; the encoder
            # writes the null branch ONLY for None.
            body[c] = body[c].astype(object).where(~pdf[f"__isnull_{c}"], None)
        written, nrows = [], []
        if partition_by:
            for keys, grp in body.groupby(partition_by, dropna=False,
                                          sort=False):
                keyt = keys if isinstance(keys, tuple) else (keys,)
                sub = "/".join(f"{c}={_hive_val(v)}"
                               for c, v in zip(partition_by, keyt))
                written.append(_write_part(grp, pid, sub))
                nrows.append(len(grp))
        else:
            written.append(_write_part(body, pid, ""))
            nrows.append(len(body))
        yield pd.DataFrame({"path": written, "rows": nrows})

    staged = df.withColumn("__pid", F.spark_partition_id())
    for c in float_nullable:
        staged = staged.withColumn(f"__isnull_{c}", F.isnull(F.col(c)))
    try:
        parts = [
            r.path
            for r in staged.mapInPandas(gen, schema="path string, rows long")
            .collect()
        ]
        if not parts:  # empty input: commit a header-only container file
            fpath = os.path.join(staging, f"part-00000{suffix}.avro")
            with open(fpath, "wb") as fh:
                fh.write(encode_container([], avro_schema, codec=codec))
            parts = [fpath]
        # Commit: job succeeded — now (and only now) replace old parts.
        if mode == "overwrite":
            for f in existing:
                os.remove(os.path.join(path, f))
            # drop partition dirs emptied by the removal (a stale
            # <col>=<val>/ from a previous layout must not linger)
            for root, dirs, files in os.walk(path, topdown=False):
                if root != path and not os.listdir(root) \
                        and not os.path.basename(root).startswith("_staging-"):
                    os.rmdir(root)
        final = []
        for p in dict.fromkeys(parts):  # dedupe: a retried task reports twice
            dest = os.path.join(path, os.path.relpath(p, staging))
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.replace(p, dest)
            final.append(dest)
        return final
    finally:
        # Abort or success: drop whatever staging still holds.
        shutil.rmtree(staging, ignore_errors=True)


def read_avro(spark: SparkSession, path: str,
              schema: T.StructType | None = None) -> DataFrame:
    """Distributed Avro source: binaryFile scan (one task per file) +
    Arrow-batched mapInPandas decode. Schema from the first file's embedded
    avro.schema when not given — the driver parses ONLY the header (magic +
    metadata map), never the data blocks, so a ~128 MB part costs a few KB
    of driver reads. Requires a driver-visible `path` (see write_avro note
    on the shared-filesystem contract)."""
    _require_driver_visible_fs(spark, "source")
    if schema is None:
        names_on_disk = sorted(_list_parts(path)) \
            if os.path.isdir(path) else []
        if not names_on_disk:
            raise FileNotFoundError(
                f"avro source: no .avro files under {path!r} to infer a "
                "schema from — pass schema= explicitly or check the path")
        chunk = 64 * 1024
        with open(os.path.join(path, names_on_disk[0]), "rb") as fh:
            head = fh.read(chunk)
            while True:
                try:
                    avro_schema, _, _, _ = decode_header(head)
                    break
                except (IndexError, json.JSONDecodeError):
                    more = fh.read(chunk)
                    if not more:  # true EOF inside header: corrupt file
                        raise ValueError(
                            f"avro source: truncated header in {names_on_disk[0]}")
                    head += more
        schema = avro_to_spark_schema(avro_schema)
    names = [f.name for f in schema.fields]
    # NaN in a nullable float/double column would be collapsed to null by
    # the Arrow serialization of the mapInPandas OUTPUT (pyarrow from_pandas
    # semantics). The decoder therefore emits an __isnan mask per such
    # column and NaN is reconstructed JVM-side after the map.
    float_nullable = [
        f.name for f in schema.fields
        if f.nullable and isinstance(f.dataType, (T.FloatType, T.DoubleType))
    ]
    ext_schema = T.StructType(
        schema.fields
        + [T.StructField(f"__isnan_{c}", T.BooleanType(), False)
           for c in float_nullable]
    )

    def gen(batches):
        for pdf in batches:
            for content in pdf["content"]:
                _, rows = decode_container(bytes(content))
                if rows:
                    out = pd.DataFrame(rows, columns=names)
                    for c in float_nullable:
                        # mask from the RAW tuples: DataFrame construction
                        # already folded None into NaN in numeric columns
                        i = names.index(c)
                        out[f"__isnan_{c}"] = [
                            isinstance(r[i], float) and r[i] != r[i]
                            for r in rows
                        ]
                    yield out

    out = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("content")
        .mapInPandas(gen, schema=ext_schema)
    )
    for c in float_nullable:
        dt = schema[c].dataType.simpleString()
        out = out.withColumn(
            c,
            F.when(F.col(f"__isnan_{c}"), F.lit(float("nan")).cast(dt))
            .otherwise(F.col(c)),
        )
    return out.select(*names)
