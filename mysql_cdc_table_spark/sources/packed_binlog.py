"""Raw packed-row binlog decode: the reference's core dataflow (walk a
packed row image: width, column-present bitmap, null bitmap, packed
values — layout documented at reference binlog_table_reader.cc:321-323,
null-bit handling :144-149, per-field unpack :151-156) re-expressed as
an Arrow-batched Spark source.

This is NOT MySQL's wire format (decoding that requires MySQL's
table_def/Field machinery — the envelope source in cdc/source.py is the
primary ingest path, per the driver's north star). It is a
self-describing packed format with the same structural walk, proving
the binary-decode architecture end to end:

    event := table_id:varint  op:u8  n_images:u8  ncols:varint  image*
    image := cols_present_bitmap  null_bitmap  value*   (present & non-null)
    (ncols makes the event self-describing in WIDTH — add-column-at-end
    schema evolution decodes old events with NULL-filled new columns,
    like the binlog TABLE_MAP path; wider-than-schema events raise)
    value := i32/i64 LE | f64 LE | varint-len utf8 | i64 epoch-micros
           | zigzag-varint unscaled decimal | varint enum-index
           | varint set-bitmask | varint bit-value

MySQL-specific column kinds that have no Spark type (the reference
decodes them via Field::unpack — binlog_table_reader.cc:151-156; type
space per SURVEY §1.2) are declared as StructField METADATA on their
Spark surface type and get their own wire form:

    {"mysql_type": "enum", "values": [...]} on StringType
        -> varint 1-based index (0 = MySQL's invalid-value '')
    {"mysql_type": "set", "values": [...]}  on StringType
        -> varint bitmask; decodes to comma-joined members in
           definition order (MySQL SET semantics)
    {"mysql_type": "bit"}                   on LongType
        -> varint of the unsigned value
    {"mysql_type": "json"}                  on StringType
        -> utf-8 text (MySQL JSON surfaces as its text form)
    {"mysql_type": "geometry"}              on BinaryType
        -> length-prefixed opaque bytes (MySQL's SRID(4 LE) + WKB
           value, passed through per SURVEY §1.3)

NEWDECIMAL maps to DecimalType at ANY precision (zigzag-varint unscaled
integer — not fixed 8 bytes — so DECIMAL(38,10) round-trips).
DATETIME2 fractional seconds are covered by the epoch-micros timestamp.

Decode runs in ``mapInPandas``: Arrow batches in, pure-Python walk per
event, Arrow batches out. Per-file parallelism, no shuffle — the same
partitioning story as the JSON envelope decode, with Python justified
here because the walk is genuinely imperative (the one place SURVEY §4
allows it). Python cost is bounded by batch size; a production build
would swap the inner loop for a cython/arrow-native kernel with the
same interface.
"""

from __future__ import annotations

import datetime as _datetime
import struct
from collections.abc import Iterator
from datetime import timezone as _tz

_EPOCH_ORDINAL = _datetime.date(1970, 1, 1).toordinal()

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---- varint ----------------------------------------------------------------


def _write_varint(n: int, out: bytearray) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


# ---- per-type codecs (encode used by tests/fixtures, decode by the source) --


def _zigzag(n: int) -> int:
    """Sign-fold an arbitrary-precision int into a non-negative one."""
    return n * 2 if n >= 0 else -n * 2 - 1


def _unzigzag(z: int) -> int:
    return z >> 1 if not z & 1 else -((z + 1) >> 1)


def _mysql_kind(field: T.StructField) -> str | None:
    return (field.metadata or {}).get("mysql_type")


def _encode_value(field: T.StructField, v, out: bytearray) -> None:
    dt = field.dataType
    kind = _mysql_kind(field)
    if kind == "enum":
        values = field.metadata["values"]
        # MySQL stores the 1-based index; unknown value -> 0 ('')
        idx = values.index(v) + 1 if v in values else 0
        _write_varint(idx, out)
    elif kind == "set":
        values = field.metadata["values"]
        members = set(v.split(",")) if v else set()
        mask = sum(1 << i for i, m in enumerate(values) if m in members)
        _write_varint(mask, out)
    elif kind == "bit":
        _write_varint(int(v), out)
    elif isinstance(dt, T.BooleanType):
        out.append(1 if v else 0)
    elif isinstance(dt, T.ShortType):
        out += struct.pack("<h", v)
    elif isinstance(dt, T.IntegerType):
        out += struct.pack("<i", v)
    elif isinstance(dt, T.LongType):
        out += struct.pack("<q", v)
    elif isinstance(dt, T.FloatType):
        out += struct.pack("<f", v)
    elif isinstance(dt, T.DoubleType):
        out += struct.pack("<d", v)
    elif isinstance(dt, T.DecimalType):
        # decimal as zigzag-varint unscaled int (like MySQL NEWDECIMAL's
        # fixed-point idea, simplified): scale comes from the schema and
        # ANY precision fits (varint is arbitrary-length). scaleb must
        # run under a wide context — the default 28-digit context would
        # silently round a DECIMAL(38,*) value.
        import decimal as _decimal

        ctx = _decimal.Context(prec=max(dt.precision, 38) + 4)
        _write_varint(_zigzag(int(v.scaleb(dt.scale, context=ctx))), out)
    elif isinstance(dt, T.StringType):  # also mysql_type=json (text form)
        raw = v.encode("utf-8")
        _write_varint(len(raw), out)
        out += raw
    elif isinstance(dt, T.BinaryType):
        _write_varint(len(v), out)
        out += bytes(v)
    elif isinstance(dt, T.DateType):
        out += struct.pack("<i", v.toordinal() - _EPOCH_ORDINAL)
    elif isinstance(dt, T.TimestampType):
        # naive datetimes are UTC by convention (session tz is pinned UTC)
        out += struct.pack(
            "<q", int(v.replace(tzinfo=_tz.utc).timestamp() * 1_000_000)
        )
    else:
        raise TypeError(f"unsupported packed type {dt}")


def _decode_value(field: T.StructField, buf: bytes, pos: int):
    import datetime as _dt
    from decimal import Decimal

    dt = field.dataType
    kind = _mysql_kind(field)
    if kind == "enum":
        idx, pos = _read_varint(buf, pos)
        values = field.metadata["values"]
        return ("" if idx == 0 else values[idx - 1]), pos
    if kind == "set":
        mask, pos = _read_varint(buf, pos)
        values = field.metadata["values"]
        return ",".join(m for i, m in enumerate(values) if mask >> i & 1), pos
    if kind == "bit":
        v, pos = _read_varint(buf, pos)
        return v, pos
    if isinstance(dt, T.BooleanType):
        return buf[pos] != 0, pos + 1
    if isinstance(dt, T.ShortType):
        return struct.unpack_from("<h", buf, pos)[0], pos + 2
    if isinstance(dt, T.IntegerType):
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    if isinstance(dt, T.LongType):
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if isinstance(dt, T.FloatType):
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if isinstance(dt, T.DoubleType):
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if isinstance(dt, T.DecimalType):
        import decimal as _decimal

        z, pos = _read_varint(buf, pos)
        ctx = _decimal.Context(prec=max(dt.precision, 38) + 4)
        return Decimal(_unzigzag(z)).scaleb(-dt.scale, context=ctx), pos
    if isinstance(dt, T.StringType):
        ln, pos = _read_varint(buf, pos)
        return buf[pos : pos + ln].decode("utf-8"), pos + ln
    if isinstance(dt, T.BinaryType):
        ln, pos = _read_varint(buf, pos)
        return bytes(buf[pos : pos + ln]), pos + ln
    if isinstance(dt, T.DateType):
        days = struct.unpack_from("<i", buf, pos)[0]
        return _dt.date.fromordinal(days + _EPOCH_ORDINAL), pos + 4
    if isinstance(dt, T.TimestampType):
        us = struct.unpack_from("<q", buf, pos)[0]
        return (
            _dt.datetime.fromtimestamp(us / 1_000_000, tz=_tz.utc).replace(
                tzinfo=None
            ),
            pos + 8,
        )
    raise TypeError(f"unsupported packed type {dt}")


# ---- precompiled codec plans ------------------------------------------------
#
# The isinstance ladder in _encode_value/_decode_value costs more than the
# byte work once a scan decodes millions of values. A codec PLAN binds one
# specialized closure per field, built once per schema (cached) and reused
# for every event — the hot loop then does zero type dispatch.


def _make_decoder(field: T.StructField):
    """One specialized (buf, pos) -> (value, pos) closure for a field."""
    import datetime as _dt
    from decimal import Decimal

    dt_ = field.dataType
    kind = _mysql_kind(field)
    if kind == "enum":
        values = field.metadata["values"]

        def dec(buf, pos):
            idx, pos = _read_varint(buf, pos)
            return ("" if idx == 0 else values[idx - 1]), pos

        return dec
    if kind == "set":
        values = field.metadata["values"]

        def dec(buf, pos):
            mask, pos = _read_varint(buf, pos)
            return ",".join(m for i, m in enumerate(values) if mask >> i & 1), pos

        return dec
    if kind == "bit":
        return _read_varint
    if isinstance(dt_, T.BooleanType):
        return lambda buf, pos: (buf[pos] != 0, pos + 1)
    if isinstance(
        dt_, (T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType)
    ):
        fmt = {
            T.ShortType: "<h", T.IntegerType: "<i", T.LongType: "<q",
            T.FloatType: "<f", T.DoubleType: "<d",
        }[type(dt_)]
        s = struct.Struct(fmt)
        unpack, size = s.unpack_from, s.size
        return lambda buf, pos: (unpack(buf, pos)[0], pos + size)
    if isinstance(dt_, T.DecimalType):
        import decimal as _decimal

        scale = dt_.scale
        ctx = _decimal.Context(prec=max(dt_.precision, 38) + 4)

        def dec(buf, pos):
            z, pos = _read_varint(buf, pos)
            return Decimal(_unzigzag(z)).scaleb(-scale, context=ctx), pos

        return dec
    if isinstance(dt_, T.StringType):

        def dec(buf, pos):
            ln, pos = _read_varint(buf, pos)
            return buf[pos : pos + ln].decode("utf-8"), pos + ln

        return dec
    if isinstance(dt_, T.BinaryType):

        def dec(buf, pos):
            ln, pos = _read_varint(buf, pos)
            return bytes(buf[pos : pos + ln]), pos + ln

        return dec
    if isinstance(dt_, T.DateType):
        s = struct.Struct("<i")
        from_ordinal = _dt.date.fromordinal

        def dec(buf, pos):
            return from_ordinal(s.unpack_from(buf, pos)[0] + _EPOCH_ORDINAL), pos + 4

        return dec
    if isinstance(dt_, T.TimestampType):
        s = struct.Struct("<q")
        from_ts = _dt.datetime.fromtimestamp

        def dec(buf, pos):
            us = s.unpack_from(buf, pos)[0]
            return from_ts(us / 1_000_000, tz=_tz.utc).replace(tzinfo=None), pos + 8

        return dec
    raise TypeError(f"unsupported packed type {dt_}")


# keyed by schema object IDENTITY (the schema is pinned in the entry so
# its id can never be recycled) — key building must be O(1), a
# serialized-schema key would put schema.json() in the per-event path.
_PLAN_CACHE: dict = {}
_PLAN_CACHE_MAX = 256


def _decoder_plan(target: T.StructType) -> list:
    entry = _PLAN_CACHE.get(id(target))
    if entry is not None and entry[0] is target:
        return entry[1]
    plan = [_make_decoder(f) for f in target.fields]
    if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        _PLAN_CACHE.clear()
    _PLAN_CACHE[id(target)] = (target, plan)
    return plan


# ---- columnar (vectorized) decode -------------------------------------------
#
# The closure plan above removes type dispatch but still runs Python
# bytecode per FIELD per IMAGE — ~5M calls for a 150k-event file. The
# columnar path below runs numpy per field per CHUNK instead: one
# sequential Python loop survives (the frame-length walk, which is
# inherently serial because frame k+1's offset depends on frame k's
# length), and every other stage — header varints, table-id filter,
# null bitmaps, fixed-width values, string/binary gathers — is a
# vectorized operation across all events in the chunk. Output is
# pyarrow arrays built straight from the numpy buffers, so no Python
# row objects exist anywhere on the scan path. Measured single-thread
# on the bench file set (261k rows, 16 MB): 5.1s closure walk -> 0.7s
# columnar. Row ORDER within a chunk groups by image round (all image-0
# rows, then image-1); the changelog's explicit (__event_seq,
# __image_seq) keys carry ordering, matching the DataFrame contract.


def _varint_vec(u8, pos):
    """Vectorized LEB128: decode one varint at each position. ``pos`` is
    an int64 array (NOT mutated); returns (values int64, new_pos).
    Raises on any varint wider than 64 bits — the 10th byte may only
    contribute bit 63 (values beyond int64, e.g. DECIMAL(>18) payloads,
    go through the per-cell scalar fallback instead)."""
    import numpy as np

    vals = np.zeros(len(pos), np.uint64)
    p = pos.copy()
    shift = 0
    active = np.arange(len(pos))
    while len(active):
        b = u8[p[active]]
        if shift == 63 and bool(((b & 0x7F) > 1).any()):
            # bits 64+ would silently wrap out of the uint64 below
            raise ValueError("varint overflows 64 bits")
        vals[active] |= (b & 0x7F).astype(np.uint64) << np.uint64(shift)
        p[active] += 1
        active = active[b >= 0x80]
        shift += 7
        if shift > 63 and len(active):
            raise ValueError("varint overflows 64 bits")
    return vals.view(np.int64), p


def _varint_vec128(u8, pos):
    """Two-limb (lo, hi uint64) vectorized LEB128 for values up to 128
    bits — the zigzagged unscaled of DECIMAL(19-38) (|unscaled| < 10^38
    < 2^127, so the zigzag fits 128 bits; the 19th byte may only
    contribute bits 126-127). Returns (lo, hi, new_pos); ``pos`` is not
    mutated. Round 7: retires the packed kernel's last wide-decimal
    per-cell fallback (the MySQL wire kernel's twin lives in
    mysql_binlog_vec._wide_decimal_decoder)."""
    import numpy as np

    lo = np.zeros(len(pos), np.uint64)
    hi = np.zeros(len(pos), np.uint64)
    p = pos.copy()
    shift = 0
    active = np.arange(len(pos))
    while len(active):
        b = u8[p[active]]
        c = (b & 0x7F).astype(np.uint64)
        if shift == 126 and bool((c > 3).any()):
            raise ValueError("varint overflows 128 bits")
        if shift < 64:
            lo[active] |= c << np.uint64(shift)
            if shift > 57:  # bits straddle the limb boundary
                hi[active] |= c >> np.uint64(64 - shift)
        else:
            hi[active] |= c << np.uint64(shift - 64)
        p[active] += 1
        active = active[b >= 0x80]
        shift += 7
        if shift > 126 and len(active):
            raise ValueError("varint overflows 128 bits")
    return lo, hi, p


def _gather_bytes_vec(u8, pos, lens):
    """Gather variable-length runs [pos[i], pos[i]+lens[i]) into one
    contiguous buffer + int32 offsets (Arrow varbinary layout)."""
    import numpy as np

    total = int(lens.sum())
    # valid values are disjoint slices of the chunk buffer, so their
    # total can never exceed it — this single bound kills both the
    # corrupt-length OOM (sum of huge claimed lens allocating TBs of
    # gather indices) and any int32 offset overflow (chunks are also
    # byte-bounded by the caller, far below 2^31)
    if total > len(u8):
        raise ValueError(
            "corrupt length prefixes in packed events: values claim "
            f"{total} bytes, chunk has {len(u8)}"
        )
    offsets = np.zeros(len(pos) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    src = np.repeat(pos, lens) + (np.arange(total) - np.repeat(offsets[:-1], lens))
    return u8[np.minimum(src, len(u8) - 1)], offsets.astype(np.int32)


def _valid_buf(valid):
    """Arrow validity bitmap buffer from a bool array (None if no nulls)."""
    import numpy as np
    import pyarrow as pa

    if valid.all():
        return None
    return pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())


def _make_scalar_cell_decoder(field: T.StructField, pa_type):
    """Per-cell closure fallback INSIDE the columnar walk for the few
    field kinds numpy can't batch (decimal >18 digits — unscaled beyond
    int64 — and sets with >8 members). Only this field's cells run
    Python; every other field in the schema stays vectorized. The
    decoder carries ``needs_raw`` so the section walk hands it the
    original bytes object (closures slice+decode, which numpy views
    can't)."""
    import numpy as np
    import pyarrow as pa

    closure = _make_decoder(field)

    def dec(raw, pos, valid):
        idx = np.flatnonzero(valid)
        out = [None] * len(pos)
        for j in idx:
            v, newp = closure(raw, int(pos[j]))
            out[j] = v
            pos[j] = newp
        return pa.array(out, type=pa_type)

    dec.needs_raw = True
    return dec


def _make_vec_decoder(field: T.StructField):
    """-> (fn, pa_type) where fn(u8, pos, valid) decodes the field for
    every row with valid[i] True (mutating pos at those rows) and
    returns a pyarrow array of len(pos) with nulls at ~valid. Raises
    TypeError at PLAN time for kinds the columnar path doesn't cover
    (the caller falls back to the closure walk for the whole scan)."""
    import numpy as np
    import pyarrow as pa

    dt_ = field.dataType
    kind = _mysql_kind(field)

    def _masked(np_vals, valid, pa_type):
        return pa.array(np_vals, type=pa_type, mask=~valid)

    if kind == "enum":
        lookup = np.array(["", *field.metadata["values"]], dtype=object)

        def dec(u8, pos, valid):
            idx = np.flatnonzero(valid)
            v, newp = _varint_vec(u8, pos[idx])
            if v.size and (v.min() < 0 or v.max() >= len(lookup)):
                raise ValueError("enum index out of range")
            pos[idx] = newp
            out = np.full(len(pos), None, dtype=object)
            out[idx] = lookup[v]
            return pa.array(out, type=pa.string())

        return dec, pa.string()
    if kind == "set":
        values = field.metadata["values"]
        if len(values) > 8:  # 2^k lookup too large: per-cell closure
            return _make_scalar_cell_decoder(field, pa.string()), pa.string()
        lookup = np.array(
            [
                ",".join(m for i, m in enumerate(values) if mask >> i & 1)
                for mask in range(1 << len(values))
            ],
            dtype=object,
        )

        def dec(u8, pos, valid):
            idx = np.flatnonzero(valid)
            v, newp = _varint_vec(u8, pos[idx])
            if v.size and (v.min() < 0 or v.max() >= len(lookup)):
                raise ValueError("set mask out of range")
            pos[idx] = newp
            out = np.full(len(pos), None, dtype=object)
            out[idx] = lookup[v]
            return pa.array(out, type=pa.string())

        return dec, pa.string()
    if kind == "bit":

        def dec(u8, pos, valid):
            idx = np.flatnonzero(valid)
            v, newp = _varint_vec(u8, pos[idx])
            pos[idx] = newp
            out = np.zeros(len(pos), np.int64)
            out[idx] = v
            return _masked(out, valid, pa.int64())

        return dec, pa.int64()
    if isinstance(dt_, T.BooleanType):

        def dec(u8, pos, valid):
            idx = np.flatnonzero(valid)
            out = np.zeros(len(pos), bool)
            out[idx] = u8[pos[idx]] != 0
            pos[idx] += 1
            return _masked(out, valid, pa.bool_())

        return dec, pa.bool_()
    _FIXED = {
        T.ShortType: ("<i2", 2, pa.int16()),
        T.IntegerType: ("<i4", 4, pa.int32()),
        T.LongType: ("<i8", 8, pa.int64()),
        T.FloatType: ("<f4", 4, pa.float32()),
        T.DoubleType: ("<f8", 8, pa.float64()),
        T.DateType: ("<i4", 4, pa.date32()),
        T.TimestampType: ("<i8", 8, pa.timestamp("us")),
    }
    if type(dt_) in _FIXED:
        np_dt, width, pa_t = _FIXED[type(dt_)]

        def dec(u8, pos, valid, _np_dt=np_dt, _w=width, _pa_t=pa_t):
            idx = np.flatnonzero(valid)
            p = pos[idx]
            gather = (p[:, None] + np.arange(_w)).ravel()
            vals = (
                u8[np.minimum(gather, len(u8) - 1)]
                .view(_np_dt)
                .astype(_np_dt, copy=False)
            )
            out = np.zeros(len(pos), dtype=_np_dt)
            out[idx] = vals
            pos[idx] = p + _w
            return _masked(out, valid, _pa_t)

        return dec, pa_t
    if isinstance(dt_, T.DecimalType):
        if dt_.precision > 18:
            # unscaled may exceed int64 (varint >9 bytes): two-limb
            # 128-bit varint + zigzag straight into decimal128 buffers
            # (round 7 — previously a per-cell Decimal closure)
            pa_t = pa.decimal128(dt_.precision, dt_.scale)
            bound = 10**dt_.precision - 1  # max |unscaled|
            bm1_hi = np.uint64(bound >> 64)
            bm1_lo = np.uint64(bound & 0xFFFFFFFFFFFFFFFF)

            def dec_wide(u8, pos, valid, _pa_t=pa_t):
                idx = np.flatnonzero(valid)
                lo, hi, newp = _varint_vec128(u8, pos[idx])
                pos[idx] = newp
                # 128-bit zigzag decode: mag = z >> 1; negate if z&1
                neg = (lo & np.uint64(1)).astype(bool)
                mlo = (lo >> np.uint64(1)) | (hi << np.uint64(63))
                mhi = hi >> np.uint64(1)
                # |unscaled| must fit the declared precision (negatives
                # decode to mag+1): Arrow's from_buffers skips the
                # validation the old per-cell Decimal path got for free
                # from pa.array — a corrupt overlong varint would
                # otherwise land silently wrong (review finding, r07)
                gt = (mhi > bm1_hi) | ((mhi == bm1_hi) & (mlo > bm1_lo))
                eq = (mhi == bm1_hi) & (mlo == bm1_lo)
                if bool((gt | (eq & neg)).any()):
                    raise ValueError(
                        f"corrupt packed decimal: |unscaled| exceeds "
                        f"DECIMAL({dt_.precision},{dt_.scale})"
                    )
                mlo = np.where(neg, ~mlo, mlo)
                mhi = np.where(neg, ~mhi, mhi)
                data = np.zeros((len(pos), 2), dtype="<u8")
                data[idx, 0] = mlo
                data[idx, 1] = mhi
                return pa.Array.from_buffers(
                    _pa_t,
                    len(pos),
                    [_valid_buf(valid), pa.py_buffer(data.tobytes())],
                    null_count=int((~valid).sum()),
                )

            return dec_wide, pa_t
        pa_t = pa.decimal128(dt_.precision, dt_.scale)

        def dec(u8, pos, valid, _pa_t=pa_t):
            idx = np.flatnonzero(valid)
            z, newp = _varint_vec(u8, pos[idx])
            pos[idx] = newp
            unscaled = (z >> np.int64(1)) ^ -(z & np.int64(1))
            data = np.zeros((len(pos), 2), dtype="<i8")
            data[idx, 0] = unscaled
            data[idx, 1] = unscaled >> np.int64(63)  # sign extension
            return pa.Array.from_buffers(
                _pa_t,
                len(pos),
                [_valid_buf(valid), pa.py_buffer(data.tobytes())],
                null_count=int((~valid).sum()),
            )

        return dec, pa_t
    if isinstance(dt_, (T.StringType, T.BinaryType)):
        pa_t = pa.string() if isinstance(dt_, T.StringType) else pa.binary()

        def dec(u8, pos, valid, _pa_t=pa_t):
            idx = np.flatnonzero(valid)
            lens, data_start = _varint_vec(u8, pos[idx])
            full_lens = np.zeros(len(pos), np.int64)
            full_lens[idx] = lens
            full_start = np.zeros(len(pos), np.int64)
            full_start[idx] = data_start
            data, offsets = _gather_bytes_vec(u8, full_start, full_lens)
            pos[idx] = data_start + lens
            return pa.Array.from_buffers(
                _pa_t,
                len(pos),
                [
                    _valid_buf(valid),
                    pa.py_buffer(offsets.tobytes()),
                    pa.py_buffer(data.tobytes()),
                ],
                null_count=int((~valid).sum()),
            )

        return dec, pa_t
    raise TypeError(f"unsupported packed type {dt_}")


def _vec_plan(target: T.StructType):
    """Columnar decoder plan, or None if any field needs the scalar
    path. Cached by schema identity alongside the closure plans."""
    entry = _PLAN_CACHE.get(("vec", id(target)))
    if entry is not None and entry[0] is target:
        return entry[1]
    try:
        plan = [_make_vec_decoder(f) for f in target.fields]
    except TypeError:
        plan = None
    if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        _PLAN_CACHE.clear()
    _PLAN_CACHE[("vec", id(target))] = (target, plan)
    return plan


def decode_buffer_columnar(
    buf,
    target: T.StructType,
    table_id: int,
    file_seq: int,
    start: int = 0,
    end: int | None = None,
    chunk_events: int = 65_536,
):
    """Vectorized decode of a contiguous packed-file byte range.

    Yields pyarrow RecordBatch-ready column lists: for each chunk of
    frames and each image round, a tuple (n_rows, [pa arrays]) covering
    target fields + (__op, __gtid, __tm, __file_seq, __event_seq,
    __image_seq) in that order — the DataSource's output layout.
    Caller must have verified _vec_plan(target) is not None."""
    import numpy as np

    u8 = np.frombuffer(buf, dtype=np.uint8)
    if end is None:
        end = len(buf)

    # --- sequential frame walk (the only per-frame Python loop) ---
    hdr_starts: list[int] = []
    frame_ends: list[int] = []
    pos = start
    while pos < end:
        b = buf[pos]
        if b < 0x80:
            flen = b
            pos += 1
        else:
            flen, pos = _read_varint(buf, pos)
        hdr_starts.append(pos)
        pos += flen
        frame_ends.append(pos)
    if pos != end:
        raise ValueError(f"frame at offset {hdr_starts[-1]} overruns range end {end}")

    # chunk by event count AND by bytes: every value a chunk decodes is
    # a slice of the chunk's own frames, so capping chunk bytes at
    # 256 MiB bounds each column's gathered total far below the 2^31
    # Arrow int32-offset limit — even for a footer-less legacy file
    # read as one multi-GB partition
    chunk_bytes = 1 << 28
    bounds = [0]
    for i, fe in enumerate(frame_ends):
        if (
            i - bounds[-1] >= chunk_events
            or fe - hdr_starts[bounds[-1]] > chunk_bytes
        ) and i > bounds[-1]:
            bounds.append(i)
    bounds.append(len(hdr_starts))

    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if hi <= lo:
            continue
        hdr = np.array(hdr_starts[lo:hi], np.int64)
        fend = np.array(frame_ends[lo:hi], np.int64)

        # frame header varints, vectorized across the chunk
        gtid, p = _varint_vec(u8, hdr)
        ts_s, p = _varint_vec(u8, p)
        event_seq, p = _varint_vec(u8, p)
        image_base, p = _varint_vec(u8, p)
        file_seq_arr = np.full(len(hdr), file_seq, np.int32)

        yield from _decode_event_sections(
            u8, buf, p, fend, target, table_id,
            gtid, ts_s, event_seq, image_base, file_seq_arr,
        )


def _decode_event_sections(
    u8, raw, p, fend, target, table_id,
    gtid, ts_s, event_seq, image_base, file_seq_arr,
):
    """Columnar decode of event payload sections at positions ``p`` with
    ends ``fend`` and per-event metadata arrays. Shared by the
    file-framed path (decode_buffer_columnar) and the DataFrame path
    (decode_packed's mapInArrow walk). Yields (n_rows, [pa arrays]) per
    image round in changelog column order."""
    import numpy as np
    import pyarrow as pa

    plan = _vec_plan(target)
    ntarget = len(target.fields)

    # event header: table-id filter (A4), op, image count, width
    tid, p = _varint_vec(u8, p)
    keep = tid == table_id
    if not keep.any():
        return
    p, fend = p[keep], fend[keep]
    gtid, ts_s = gtid[keep], ts_s[keep]
    event_seq, image_base = event_seq[keep], image_base[keep]
    file_seq_arr = file_seq_arr[keep]
    op = u8[p].astype(np.int32)
    n_images = u8[p + 1].astype(np.int64)
    p += 2
    ncols, p = _varint_vec(u8, p)
    if ncols.size and int(ncols.max()) > ntarget:
        raise ValueError(
            f"packed event has {int(ncols.max())} columns; target "
            f"schema has {ntarget} — pass the stream's LATEST schema"
        )
    nbytes = (ncols + 7) // 8

    cur = p
    max_rounds = int(n_images.max()) if n_images.size else 0
    for r in range(max_rounds):
        sel = np.flatnonzero(n_images > r)
        pos_r = cur[sel] + nbytes[sel]  # skip cols-present bitmap
        nb_sel = nbytes[sel]
        maxnb = int(nb_sel.max()) if nb_sel.size else 0
        bitmap_idx = pos_r[:, None] + np.arange(maxnb)
        bitmap = u8[np.minimum(bitmap_idx, len(u8) - 1)]
        pos_r = pos_r + nb_sel

        arrays = []
        nc_sel = ncols[sel]
        for i, (dec, _pa_t) in enumerate(plan):
            stored = i < nc_sel
            if i // 8 < maxnb:
                nullbit = (bitmap[:, i // 8] >> (i % 8) & 1).astype(bool)
            else:
                nullbit = np.zeros(len(sel), bool)
            valid = stored & ~nullbit
            if getattr(dec, "needs_raw", False):
                if raw is None:
                    raw = u8.tobytes()
                arrays.append(dec(raw, pos_r, valid))
            else:
                arrays.append(dec(u8, pos_r, valid))
        cur[sel] = pos_r

        op_r = np.where(op == 2, 2 if r == 0 else 3, op)[sel]
        arrays.append(pa.array(op_r, type=pa.int32()))
        arrays.append(pa.array(gtid[sel], type=pa.int64()))
        arrays.append(
            pa.array(ts_s[sel] * 1_000_000, type=pa.timestamp("us"))
        )
        arrays.append(pa.array(file_seq_arr[sel], type=pa.int32()))
        arrays.append(pa.array(event_seq[sel], type=pa.int64()))
        arrays.append(
            pa.array((image_base[sel] + r).astype(np.int32), type=pa.int32())
        )
        yield len(sel), arrays

    # every event must land exactly on its frame end — a mismatch
    # means a mis-framed or corrupt value section (failfast, same
    # contract as the scalar walk's per-event payload slicing)
    if not np.array_equal(cur, fend):
        bad = int(np.flatnonzero(cur != fend)[0])
        raise ValueError(
            "corrupt packed frame: decoded size mismatch at "
            f"event_seq {int(event_seq[bad])} "
            f"(ended at {int(cur[bad])}, frame ends at {int(fend[bad])})"
        )


# ---- event encode (fixture/writer side) -------------------------------------


def encode_event(
    table_id: int, op: int, images: list[dict], target: T.StructType
) -> bytes:
    """op: 1=INSERT (1 image), 0=DELETE (1 image), 2=UPDATE (2 images:
    before, after) — update carries both images in one event like the
    reference's UPDATE_ROWS event."""
    out = bytearray()
    _write_varint(table_id, out)
    out.append(op)
    out.append(len(images))
    ncols = len(target.fields)
    # the event is self-describing in WIDTH (like the binlog TABLE_MAP's
    # column count): a reader holding a LATER schema (columns added at
    # the end) decodes old events correctly, surfacing new columns as
    # NULL instead of silently misreading the bitmaps
    _write_varint(ncols, out)
    nbytes = (ncols + 7) // 8
    for img in images:
        out += b"\xff" * nbytes  # cols-present bitmap: all columns present
        null_bits = bytearray(nbytes)
        for i, f in enumerate(target.fields):
            if img.get(f.name) is None:
                null_bits[i // 8] |= 1 << (i % 8)
        out += null_bits
        for f in target.fields:
            v = img.get(f.name)
            if v is not None:
                _encode_value(f, v, out)
    return bytes(out)


def _decode_event(
    payload: bytes, target: T.StructType, want_table_id: int
) -> list[tuple[int, list]]:
    """-> [(op_code, values)] — one tuple per row-image, ops mapped to the
    reference's codes (insert 1, delete 0, update-before 2, update-after 3)."""
    plan = _decoder_plan(target)
    table_id, pos = _read_varint(payload, 0)
    if table_id != want_table_id:  # A4 table filter, applied during decode
        return []
    op = payload[pos]
    n_images = payload[pos + 1]
    pos += 2
    ncols_stored, pos = _read_varint(payload, pos)
    ntarget = len(target.fields)
    if ncols_stored > ntarget:
        raise ValueError(
            f"packed event has {ncols_stored} columns; target schema has "
            f"{ntarget} — pass the stream's LATEST schema"
        )
    # add-column-at-end evolution (same contract as the binlog
    # TABLE_MAP path): decode the stored prefix, NULL-fill the rest
    pad = [None] * (ntarget - ncols_stored)
    nbytes = (ncols_stored + 7) // 8
    out: list[tuple[int, list]] = []
    for image_no in range(n_images):
        pos += nbytes  # skip cols-present bitmap (all present in v1)
        null_bits = payload[pos : pos + nbytes]
        pos += nbytes
        vals: list = []
        for i, dec in enumerate(plan[:ncols_stored]):
            if null_bits[i // 8] >> (i % 8) & 1:
                vals.append(None)  # null bit set: value bytes absent
            else:
                v, pos = dec(payload, pos)
                vals.append(v)
        vals += pad
        if op == 2:  # update: image 0 = before (op 2), image 1 = after (op 3)
            out.append((2 if image_no == 0 else 3, vals))
        else:
            out.append((op, vals))
    return out


# ---- distributed encoder (changelog rows -> packed events, no driver hop) --


def encode_packed(
    changelog: DataFrame, target: T.StructType, table_id: int
) -> DataFrame:
    """Inverse of decode_packed, run DISTRIBUTED via mapInPandas: each
    changelog row becomes one single-image packed event (op byte carried
    verbatim; __image_seq is NOT representable per-event here — pair with
    the DataSource writer's frame image_base when ordering must survive,
    or keep 1-image events for op-1/op-0-only feeds). No collect(): at
    100 TB the encode is a map-only stage."""
    import calendar

    names = [f.name for f in target.fields]

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # column-zip, not iterrows: ~10x less per-row overhead in the
        # Python stage (the walk itself is the inherent cost)
        meta_cols = ["__op", "__gtid", "__tm", "__file_seq", "__event_seq"]
        for pdf in batches:
            # columnar accumulation (see decode side: frame-from-dict is
            # an order of magnitude cheaper than frame-from-row-lists)
            pay_c: list = []
            gtid_c: list = []
            ts_c: list = []
            fs_c: list = []
            es_c: list = []
            for tup in zip(*(pdf[c] for c in [*names, *meta_cols])):
                vals, (op, gtid, tm, file_seq, event_seq) = (
                    tup[: len(names)],
                    tup[len(names) :],
                )
                img = {
                    n: (None if pd.isna(v) else v) for n, v in zip(names, vals)
                }
                pay_c.append(encode_event(table_id, int(op), [img], target))
                gtid_c.append(int(gtid))
                ts_c.append(calendar.timegm(tm.timetuple()))
                fs_c.append(int(file_seq))
                es_c.append(int(event_seq))
            yield pd.DataFrame(
                {
                    k: pd.Series(v, dtype="object")
                    for k, v in {
                        "payload": pay_c,
                        "gtid": gtid_c,
                        "ts_s": ts_c,
                        "file_seq": fs_c,
                        "event_seq": es_c,
                    }.items()
                }
            )

    return changelog.mapInPandas(pack, schema=EVENT_INPUT_SCHEMA)


# ---- the Spark source -------------------------------------------------------

EVENT_INPUT_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.BinaryType()),
        T.StructField("gtid", T.LongType()),
        T.StructField("ts_s", T.LongType()),
        T.StructField("file_seq", T.IntegerType()),
        T.StructField("event_seq", T.LongType()),
    ]
)


def _decode_packed_arrow(
    events: DataFrame, target: T.StructType, table_id: int, out_schema
) -> DataFrame:
    """decode_packed's fast path: concatenate each Arrow batch's event
    payloads into one contiguous buffer and run the shared columnar
    kernel over it (_decode_event_sections) — output RecordBatches are
    built straight from numpy, so no Python row objects exist."""

    def walk(batches):
        import numpy as np
        import pyarrow as pa

        from mysql_cdc_table_spark.sources.datasource import _arrow_schema

        pa_schema = _arrow_schema(out_schema)
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            cols = {
                name: rb.column(i) for i, name in enumerate(rb.schema.names)
            }
            payloads = cols["payload"].to_pylist()
            lens = np.fromiter((len(b) for b in payloads), np.int64, n)
            bounds = np.zeros(n + 1, np.int64)
            np.cumsum(lens, out=bounds[1:])
            joined = b"".join(payloads)
            u8 = np.frombuffer(joined, np.uint8)
            as_np = lambda name, dt: (
                cols[name].to_numpy(zero_copy_only=False).astype(dt)
            )
            for _n_rows, arrays in _decode_event_sections(
                u8,
                joined,
                bounds[:-1].copy(),
                bounds[1:].copy(),
                target,
                table_id,
                as_np("gtid", np.int64),
                as_np("ts_s", np.int64),
                as_np("event_seq", np.int64),
                np.zeros(n, np.int64),  # image_base: images number 0..n-1
                as_np("file_seq", np.int32),
            ):
                yield pa.RecordBatch.from_arrays(arrays, schema=pa_schema)

    return events.mapInArrow(walk, schema=out_schema)


def decode_packed(
    events: DataFrame,
    target: T.StructType,
    table_id: int,
    mode: str = "failfast",
) -> DataFrame:
    """Decode a DataFrame of packed events (EVENT_INPUT_SCHEMA) into the
    standard changelog (target cols + __op/__gtid/__tm + ordering cols).
    Decodes ALL row-images per event (the reference stops after the
    first — binlog_table_reader.cc:243,310,388 — a limitation SURVEY
    flags as not-to-copy).

    mode='permissive': a corrupt event yields one all-NULL row with
    __op=-1 carrying its metadata (mirrors from_json's PERMISSIVE null
    row) instead of failing the task — at 100 TB one poison event must
    not kill a stage; filter `__op >= 0` downstream or route the -1 rows
    to a dead-letter sink. mode='failfast': raise (the default, for
    trusted inputs where corruption means a bug)."""
    from mysql_cdc_table_spark.cdc.schema import changelog_schema

    if mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be failfast|permissive, got {mode!r}")
    out_schema = changelog_schema(target)
    if mode == "failfast" and _vec_plan(target) is not None:
        # same columnar kernel as the DataSource scan, entered through
        # mapInArrow (RecordBatches both ways — no pandas, no Python
        # rows). permissive mode and out-of-vec-space schemas (decimal
        # >18, sets >8) stay on the closure walk below, which supports
        # per-event error capture.
        return _decode_packed_arrow(events, target, table_id, out_schema)
    names = [f.name for f in target.fields]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import datetime as _dt

        from_ts = _dt.datetime.fromtimestamp
        utc = _dt.timezone.utc
        for pdf in batches:
            # columnar accumulation: pd.DataFrame from a column dict is
            # ~13x cheaper than from a list of row-lists (measured at
            # 100k rows: 0.10s vs 1.28s) — at scan scale the frame
            # build was costing more than the decode walk itself.
            data: list[list] = [[] for _ in names]
            op_c: list = []
            gtid_c: list = []
            tm_c: list = []
            fs_c: list = []
            es_c: list = []
            is_c: list = []
            last_s = None
            tm = None
            for payload, gtid, ts_s, file_seq, event_seq in zip(
                pdf["payload"], pdf["gtid"], pdf["ts_s"], pdf["file_seq"], pdf["event_seq"]
            ):
                if ts_s != last_s:  # events cluster by second; memoize
                    tm = from_ts(ts_s, tz=utc).replace(tzinfo=None)
                    last_s = ts_s
                try:
                    images = _decode_event(bytes(payload), target, table_id)
                except Exception:
                    if mode == "failfast":
                        raise
                    for col in data:
                        col.append(None)
                    op_c.append(-1)
                    gtid_c.append(gtid)
                    tm_c.append(tm)
                    fs_c.append(file_seq)
                    es_c.append(event_seq)
                    is_c.append(0)
                    continue
                for image_seq, (op, vals) in enumerate(images):
                    for col, v in zip(data, vals):
                        col.append(v)
                    op_c.append(op)
                    gtid_c.append(gtid)
                    tm_c.append(tm)
                    fs_c.append(file_seq)
                    es_c.append(event_seq)
                    is_c.append(image_seq)
            cols = dict(zip(names, data))
            cols["__op"] = op_c
            cols["__gtid"] = gtid_c
            cols["__tm"] = tm_c
            cols["__file_seq"] = fs_c
            cols["__event_seq"] = es_c
            cols["__image_seq"] = is_c
            # object dtype everywhere: empty/all-None columns must NOT be
            # inferred as float64 (Arrow cannot cast float64->timestamp);
            # Arrow converts from objects exactly as the row path did.
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in cols.items()}
            )

    return events.mapInPandas(walk, schema=out_schema)
