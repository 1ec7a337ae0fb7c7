"""Dependency-free minimal HDF5 reader + NetCDF-4 adapter.

The reference loads SITS cubes via xarray (`sits_bridge.py:115-145`),
which reads NetCDF-4 — an HDF5 container — through libhdf5. This
container has no h5py/netCDF4/libhdf5, and NetCDF-4 is what most modern
EO granules ship as, so the classic-only gate in sources/netcdf3.py was
the biggest real-user gap. This module parses the COMMON NetCDF-4 layout
directly from the public HDF5 File Format Specification (v3), the same
dependency-free approach as netcdf3.py and geotiff.py:

Supported (read):
  * superblock v0 (libhdf5 default) and v2/v3 (latest-format), 8-byte
    offsets/lengths;
  * v1 object headers (+ continuation blocks) and v2 ``OHDR`` headers;
  * groups through BOTH link encodings: old-style symbol tables
    (v1 B-tree + SNOD + local heap — h5py default) and new-style COMPACT
    link messages (what libnetcdf's creation-order tracking produces for
    groups with few members);
  * datasets with CONTIGUOUS, COMPACT, or CHUNKED layout (v3 layout
    message; chunked = v1 chunk B-tree walk, full-size fill-padded edge
    chunks) with the standard netCDF-4 filter stack — deflate (zlib),
    shuffle (byte transpose, remainder-aware), fletcher32 (checksum
    VERIFIED per chunk; mismatch raises) — per-chunk, mask-aware;
  * fixed-point, IEEE-float, fixed-string, reference and vlen datatypes;
  * attributes (v1/v2/v3 messages), including vlen payloads through
    global heap collections (``GCOL``) — enough for the netCDF-4
    dimension-scale convention (``CLASS``/``NAME``/``DIMENSION_LIST``/
    CF ``units``).

Gated (clear NotImplementedError, each naming the offline workaround):
superblock v1, szip/nbit/scaleoffset filters, dense links (fractal
heap), dense attributes, compound/enum/array datatypes. `nccopy -k
classic` remains the catch-all offline converter.

The writer emits the old-style layout (superblock v0, symbol-table root
group, v1 headers, contiguous data) with real netCDF-4 dimension-scale
attributes and a real global heap for DIMENSION_LIST — a fixture
generator for tests and the driver row, byte-addressable enough that
tests pin absolute offsets against the spec, not just the round trip.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .netcdf3 import NcVar

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"

# message type ids (HDF5 spec IV.A.2)
MSG_NIL = 0x0000
MSG_DATASPACE = 0x0001
MSG_LINK_INFO = 0x0002
MSG_DATATYPE = 0x0003
MSG_FILL_OLD = 0x0004
MSG_FILL = 0x0005
MSG_LINK = 0x0006
MSG_LAYOUT = 0x0008
MSG_GROUP_INFO = 0x000A
MSG_FILTERS = 0x000B
MSG_ATTRIBUTE = 0x000C
MSG_CONTINUATION = 0x0010
MSG_SYMBOL_TABLE = 0x0011
MSG_ATTR_INFO = 0x0015

# datatype classes
DT_FIXED, DT_FLOAT, DT_TIME, DT_STRING = 0, 1, 2, 3
DT_BITFIELD, DT_OPAQUE, DT_COMPOUND, DT_REFERENCE = 4, 5, 6, 7
DT_ENUM, DT_VLEN, DT_ARRAY = 8, 9, 10


def _u(buf: bytes, off: int, n: int) -> int:
    return int.from_bytes(buf[off : off + n], "little")


# --------------------------------------------------------------------------
# datatype / dataspace
# --------------------------------------------------------------------------


@dataclass
class _Dtype:
    cls: int
    size: int
    np_dtype: np.dtype | None = None
    base: "_Dtype | None" = None  # vlen/array element type
    vlen_is_string: bool = False
    str_pad: int = 0


def _parse_datatype(buf: bytes, off: int) -> _Dtype:
    cv = buf[off]
    cls, version = cv & 0x0F, cv >> 4
    if version not in (1, 2, 3):
        raise NotImplementedError(f"datatype message version {version}")
    b0, b8, b16 = buf[off + 1], buf[off + 2], buf[off + 3]
    size = _u(buf, off + 4, 4)
    props = off + 8
    if cls == DT_FIXED:
        order = ">" if (b0 & 1) else "<"
        kind = "i" if (b0 & 0x08) else "u"
        if size not in (1, 2, 4, 8):
            raise NotImplementedError(f"fixed-point width {size}")
        return _Dtype(cls, size, np.dtype(f"{order}{kind}{size}"))
    if cls == DT_FLOAT:
        order = ">" if (b0 & 1) else "<"
        if size not in (4, 8):
            raise NotImplementedError(
                f"float width {size} (IEEE f4/f8 only)"
            )
        return _Dtype(cls, size, np.dtype(f"{order}f{size}"))
    if cls == DT_STRING:
        return _Dtype(cls, size, np.dtype(f"S{size}"), str_pad=b0 & 0x0F)
    if cls == DT_REFERENCE:
        if (b0 & 0x0F) != 0:
            raise NotImplementedError("non-object reference datatype")
        return _Dtype(cls, size)
    if cls == DT_VLEN:
        base = _parse_datatype(buf, props)
        return _Dtype(cls, size, base=base, vlen_is_string=(b0 & 0x0F) == 1)
    raise NotImplementedError(
        f"datatype class {cls} (compound/enum/array/opaque unsupported — "
        "convert with `nccopy -k classic` offline)"
    )


def _parse_dataspace(buf: bytes, off: int) -> tuple[int, ...]:
    version = buf[off]
    rank = buf[off + 1]
    if version == 1:
        dims_off = off + 8
    elif version == 2:
        dims_off = off + 4
    else:
        raise NotImplementedError(f"dataspace version {version}")
    return tuple(
        _u(buf, dims_off + 8 * i, 8) for i in range(rank)
    )


# --------------------------------------------------------------------------
# object headers (v1 + v2) -> flat message list
# --------------------------------------------------------------------------


def _messages_v1(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    nmsgs = _u(buf, addr + 2, 2)
    hdr_size = _u(buf, addr + 8, 4)
    blocks = [(addr + 16, addr + 16 + hdr_size)]  # 12B prefix + 4B pad
    msgs: list[tuple[int, bytes]] = []
    while blocks and len(msgs) < nmsgs:
        start, end = blocks.pop(0)
        off = start
        while off + 8 <= end and len(msgs) < nmsgs:
            mtype = _u(buf, off, 2)
            msize = _u(buf, off + 2, 2)
            body = buf[off + 8 : off + 8 + msize]
            off += 8 + msize
            if mtype == MSG_CONTINUATION:
                caddr, clen = _u(body, 0, 8), _u(body, 8, 8)
                blocks.append((caddr, caddr + clen))
                msgs.append((MSG_NIL, b""))
            else:
                msgs.append((mtype, body))
    return msgs


def _messages_v2(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    if buf[addr : addr + 4] != b"OHDR":
        raise ValueError("bad v2 object header signature")
    flags = buf[addr + 5]
    off = addr + 6
    if flags & 0x20:  # times present
        off += 16
    if flags & 0x10:  # max compact/dense attrs
        off += 4
    size_width = 1 << (flags & 0x03)
    chunk0 = _u(buf, off, size_width)
    off += size_width
    track_order = bool(flags & 0x04)
    blocks = [(off, off + chunk0)]
    msgs: list[tuple[int, bytes]] = []
    first = True
    while blocks:
        start, end = blocks.pop(0)
        if not first:
            start += 4  # 'OCHK' signature on continuation blocks
        first = False
        o = start
        while o + 4 <= end:
            mtype = buf[o]
            msize = _u(buf, o + 1, 2)
            o += 4 + (2 if track_order else 0)
            body = buf[o : o + msize]
            o += msize
            if mtype == MSG_CONTINUATION:
                caddr, clen = _u(body, 0, 8), _u(body, 8, 8)
                # length includes signature + checksum (4 + 4)
                blocks.append((caddr, caddr + clen - 4))
            else:
                msgs.append((mtype, body))
    return msgs


def _read_messages(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    if buf[addr : addr + 4] == b"OHDR":
        return _messages_v2(buf, addr)
    if buf[addr] == 1:
        return _messages_v1(buf, addr)
    raise NotImplementedError(f"object header version {buf[addr]}")


# --------------------------------------------------------------------------
# groups: symbol-table (old) and compact link messages (new)
# --------------------------------------------------------------------------


def _heap_name(buf: bytes, heap_data: int, off: int) -> str:
    end = buf.index(b"\x00", heap_data + off)
    return buf[heap_data + off : end].decode("utf-8")


def _walk_btree_group(
    buf: bytes, btree_addr: int, heap_data: int, out: dict[str, int]
) -> None:
    if buf[btree_addr : btree_addr + 4] != b"TREE":
        raise ValueError("bad group B-tree signature")
    level = buf[btree_addr + 5]
    used = _u(buf, btree_addr + 6, 2)
    # keys/children interleave after 24-byte header: key0 child0 ... keyN
    base = btree_addr + 24
    for i in range(used):
        child = _u(buf, base + 8 + i * 16, 8)
        if level > 0:
            _walk_btree_group(buf, child, heap_data, out)
            continue
        if buf[child : child + 4] != b"SNOD":
            raise ValueError("bad symbol node signature")
        nsyms = _u(buf, child + 6, 2)
        for s in range(nsyms):
            ent = child + 8 + s * 40
            name_off = _u(buf, ent, 8)
            ohdr = _u(buf, ent + 8, 8)
            out[_heap_name(buf, heap_data, name_off)] = ohdr


def _group_links(buf: bytes, msgs: list[tuple[int, bytes]]) -> dict[str, int]:
    """name -> object header address for the group's hard links."""
    out: dict[str, int] = {}
    for mtype, body in msgs:
        if mtype == MSG_SYMBOL_TABLE:
            btree, heap = _u(body, 0, 8), _u(body, 8, 8)
            if buf[heap : heap + 4] != b"HEAP":
                raise ValueError("bad local heap signature")
            heap_data = _u(buf, heap + 24, 8)
            _walk_btree_group(buf, btree, heap_data, out)
        elif mtype == MSG_LINK:
            version, flags = body[0], body[1]
            if version != 1:
                raise NotImplementedError(f"link message version {version}")
            o = 2
            ltype = 0
            if flags & 0x08:
                ltype = body[o]
                o += 1
            if flags & 0x04:
                o += 8  # creation order
            if flags & 0x10:
                o += 1  # charset
            nlen_w = 1 << (flags & 0x03)
            nlen = _u(body, o, nlen_w)
            o += nlen_w
            name = body[o : o + nlen].decode("utf-8")
            o += nlen
            if ltype == 0:  # hard link
                out[name] = _u(body, o, 8)
        elif mtype == MSG_LINK_INFO:
            o = 2 + (8 if body[1] & 0x01 else 0)
            fheap = _u(body, o, 8)
            if fheap != UNDEF:
                raise NotImplementedError(
                    "dense group links (fractal heap) — only compact/"
                    "symbol-table groups decode without libhdf5"
                )
    return out


# --------------------------------------------------------------------------
# attributes + global heap (vlen payloads)
# --------------------------------------------------------------------------


def _gheap_object(buf: bytes, gcol_addr: int, index: int) -> bytes:
    if buf[gcol_addr : gcol_addr + 4] != b"GCOL":
        raise ValueError("bad global heap signature")
    size = _u(buf, gcol_addr + 8, 8)
    off = gcol_addr + 16
    end = gcol_addr + size
    while off + 16 <= end:
        idx = _u(buf, off, 2)
        osize = _u(buf, off + 8, 8)
        if idx == 0:  # free space object terminates the walk
            break
        if idx == index:
            return buf[off + 16 : off + 16 + osize]
        off += 16 + ((osize + 7) & ~7)
    raise ValueError(f"global heap object {index} not found")


def _decode_values(buf: bytes, dt: _Dtype, shape: tuple, raw: bytes):
    n = int(np.prod(shape)) if shape else 1
    if dt.cls in (DT_FIXED, DT_FLOAT):
        arr = np.frombuffer(raw, dtype=dt.np_dtype, count=n)
        return arr.reshape(shape) if shape else arr[0].item()
    if dt.cls == DT_STRING:
        vals = [
            raw[i * dt.size : (i + 1) * dt.size].split(b"\x00")[0].decode(
                "utf-8", "replace"
            )
            for i in range(n)
        ]
        return vals[0] if not shape else vals
    if dt.cls == DT_REFERENCE:
        refs = [_u(raw, i * 8, 8) for i in range(n)]
        return refs[0] if not shape else refs
    if dt.cls == DT_VLEN:
        out = []
        for i in range(n):
            o = i * 16  # vlen element: count(4) + gheap addr(8) + index(4)
            cnt = _u(raw, o, 4)
            gaddr = _u(raw, o + 4, 8)
            gidx = _u(raw, o + 12, 4)
            data = _gheap_object(buf, gaddr, gidx)
            if dt.vlen_is_string:
                out.append(data[:cnt].decode("utf-8", "replace"))
            else:
                out.append(_decode_values(buf, dt.base, (cnt,), data))
        return out[0] if not shape else out
    raise NotImplementedError(f"attribute datatype class {dt.cls}")


def _parse_attribute(buf: bytes, body: bytes):
    version = body[0]
    # header: version(1) reserved|flags(1) name_size(2) datatype_size(2)
    # dataspace_size(2) [+ encoding(1) in v3] — all sizes are 2 bytes
    name_size = _u(body, 2, 2)
    dt_size = _u(body, 4, 2)
    ds_size = _u(body, 6, 2)
    if version == 1:
        o = 8
        pad = True
        name = body[o : o + name_size].split(b"\x00")[0].decode("utf-8")
        o += (name_size + 7) & ~7
    elif version in (2, 3):
        flags = body[1]
        if flags & 0x03:
            raise NotImplementedError("shared attribute datatype/dataspace")
        o = 8 + (1 if version == 3 else 0)
        pad = False
        name = body[o : o + name_size].split(b"\x00")[0].decode("utf-8")
        o += name_size
    else:
        raise NotImplementedError(f"attribute message version {version}")
    # the datatype/dataspace offsets are relative to the ATTRIBUTE body,
    # but vlen payloads hold absolute file addresses — decode needs `buf`
    dt = _parse_datatype(body, o)
    o += (dt_size + 7) & ~7 if pad else dt_size
    shape = _parse_dataspace(body, o)
    o += (ds_size + 7) & ~7 if pad else ds_size
    n = int(np.prod(shape)) if shape else 1
    raw = body[o : o + n * dt.size]
    return name, _decode_values(buf, dt, shape, raw)


# --------------------------------------------------------------------------
# datasets
# --------------------------------------------------------------------------


@dataclass
class H5Dataset:
    name: str
    addr: int
    shape: tuple[int, ...]
    data: np.ndarray
    attrs: dict = field(default_factory=dict)


# filter ids (HDF5 spec + registered): deflate, shuffle, fletcher32
FILT_DEFLATE, FILT_SHUFFLE, FILT_FLETCHER32 = 1, 2, 3


def fletcher32(data: bytes) -> int:
    """HDF5's H5_checksum_fletcher32: Fletcher-32 over big-endian 16-bit
    words, accumulators folded every 360 words (the largest block a
    32-bit accumulator survives), odd trailing byte taken as its own
    high-byte word. Vectorized per block: within a block
    sum1 += w_k; sum2 += sum1 — so the block contributes cumsum(w)[-1]
    to sum1 and len*sum1_in + sum(cumsum(w)) to sum2."""
    b = np.frombuffer(data, dtype=np.uint8)
    n = len(b)
    nw = n // 2
    words = (
        b[: 2 * nw : 2].astype(np.uint64) << np.uint64(8)
    ) | b[1 : 2 * nw : 2]
    s1 = s2 = 0
    for i in range(0, nw, 360):
        cs = np.cumsum(words[i : i + 360])
        s2 += len(cs) * s1 + int(cs.sum())
        s1 += int(cs[-1])
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    if n % 2:
        s1 += int(b[-1]) << 8
        s2 += s1
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    s1 = (s1 & 0xFFFF) + (s1 >> 16)
    s2 = (s2 & 0xFFFF) + (s2 >> 16)
    return (s2 << 16) | s1


def _parse_filters(body: bytes) -> list[tuple[int, tuple[int, ...]]]:
    """Filter pipeline message (v1/v2) -> [(filter_id, client_values)]
    in WRITE order (inverse-apply in reverse on read)."""
    version, nfilters = body[0], body[1]
    o = 8 if version == 1 else 2
    out: list[tuple[int, tuple[int, ...]]] = []
    for _ in range(nfilters):
        fid = _u(body, o, 2)
        if version == 2 and fid < 256:
            # v2 predefined filters OMIT the Name Length field entirely:
            # flags at o+2, client-value count at o+4, 6-byte header
            # (reading ncv at o+6 walked 2 bytes into the client values
            # and silently dropped the next filter in the pipeline)
            name_len = 0
            ncv = _u(body, o + 4, 2)
            o += 6
        else:
            name_len = _u(body, o + 2, 2)
            ncv = _u(body, o + 6, 2)
            o += 8
        if name_len:
            o += (name_len + 7) & ~7 if version == 1 else name_len
        cvals = tuple(_u(body, o + 4 * i, 4) for i in range(ncv))
        o += 4 * ncv
        if version == 1 and ncv % 2:
            o += 4  # v1 pads client data to 8 bytes
        out.append((fid, cvals))
    return out


def _parse_fill(body: bytes) -> bytes | None:
    """Fill-value message (MSG_FILL) -> raw fill bytes, or None when no
    fill is defined (HDF5's default fill is then all-zero bytes)."""
    v = body[0]
    if v == 1:
        # v1 has NO Fill Value Defined flag: size directly at offset 3
        size = _u(body, 3, 4)
        return bytes(body[7 : 7 + size]) if size else None
    if v == 2:
        if body[3]:  # Fill Value Defined flag
            size = _u(body, 4, 4)
            return bytes(body[8 : 8 + size]) if size else None
        return None
    if v == 3:
        flags = body[1]
        if flags & 0x20:  # fill value defined
            size = _u(body, 2, 4)
            return bytes(body[6 : 6 + size]) if size else None
        return None
    raise NotImplementedError(f"fill-value message version {v}")


def _unfilter(raw: bytes, filters, mask: int, elem_size: int) -> bytes:
    """Invert the pipeline for one chunk (reverse write order). Bit i of
    `mask` set means filter i was SKIPPED for this chunk."""
    for i in range(len(filters) - 1, -1, -1):
        if mask & (1 << i):
            continue
        fid, cvals = filters[i]
        if fid == FILT_DEFLATE:
            import zlib

            raw = zlib.decompress(raw)
        elif fid == FILT_SHUFFLE:
            esize = cvals[0] if cvals else elem_size
            if esize > 1:
                # HDF5 shuffles only the multiple-of-esize prefix and
                # copies the remainder verbatim — the remainder is real
                # whenever fletcher32 ran later in the pipeline (its
                # 4-byte tail makes the chunk a non-multiple)
                main = (len(raw) // esize) * esize
                arr = np.frombuffer(raw[:main], dtype=np.uint8)
                raw = (
                    arr.reshape(esize, main // esize).T.tobytes()
                    + raw[main:]
                )
        elif fid == FILT_FLETCHER32:
            stored = int.from_bytes(raw[-4:], "little")
            payload = raw[:-4]
            if fletcher32(payload) != stored:
                raise ValueError(
                    "fletcher32 checksum mismatch — corrupt HDF5 chunk "
                    f"(stored {stored:#010x})"
                )
            raw = payload
        else:
            raise NotImplementedError(
                f"HDF5 filter {fid} (szip/nbit/scaleoffset need libhdf5)"
            )
    return raw


def _walk_chunk_btree(
    buf: bytes, addr: int, nkey_dims: int,
    out: list[tuple[tuple[int, ...], int, int, int]],
) -> None:
    """v1 B-tree, node type 1 (raw data chunks): collect
    (chunk_offsets, filter_mask, data_addr, nbytes) from every leaf."""
    if buf[addr : addr + 4] != b"TREE":
        raise ValueError("bad chunk B-tree signature")
    if buf[addr + 4] != 1:
        raise ValueError("B-tree node is not a raw-data-chunk node")
    level = buf[addr + 5]
    used = _u(buf, addr + 6, 2)
    key_size = 8 + 8 * nkey_dims
    base = addr + 24
    for i in range(used):
        key_off = base + i * (key_size + 8)
        child = _u(buf, key_off + key_size, 8)
        if level > 0:
            _walk_chunk_btree(buf, child, nkey_dims, out)
            continue
        nbytes = _u(buf, key_off, 4)
        mask = _u(buf, key_off + 4, 4)
        offsets = tuple(
            _u(buf, key_off + 8 + 8 * d, 8) for d in range(nkey_dims - 1)
        )
        out.append((offsets, mask, child, nbytes))


def _fill_scalar(fill: bytes | None, dt: _Dtype):
    """Dataset fill value as a numpy scalar; HDF5's default (no fill
    message / undefined fill) is all-zero bytes."""
    if fill is None or len(fill) != dt.size:
        return np.zeros((), dtype=dt.np_dtype)[()]
    return np.frombuffer(fill, dtype=dt.np_dtype, count=1)[0]


def _read_chunked(
    buf: bytes, name: str, body: bytes, shape: tuple[int, ...],
    dt: _Dtype, filters, fill: bytes | None = None,
) -> np.ndarray:
    """Chunked layout (v3 class 2): walk the chunk B-tree, inverse-filter
    each chunk (deflate/shuffle/fletcher32 — the standard netCDF-4
    compression stack), assemble onto a padded canvas, crop. Edge chunks
    are stored FULL-SIZE (fill-padded) per the spec. The canvas starts at
    the dataset FILL VALUE (netCDF-4 default 9.97e36, or _FillValue), so
    chunks absent from the B-tree — sparse real-world granules — read as
    fill like libhdf5, not as silent zeros."""
    ndims = body[2]  # rank + 1 (the trailing element-size dim)
    btree = _u(body, 3, 8)
    cdims = tuple(_u(body, 11 + 4 * i, 4) for i in range(ndims))
    if len(cdims) - 1 != len(shape):
        raise ValueError(f"chunk rank mismatch on {name!r}")
    chunk_shape = cdims[:-1]
    padded = tuple(
        -(-s // c) * c for s, c in zip(shape, chunk_shape)
    ) or (1,)
    canvas = np.full(padded, _fill_scalar(fill, dt), dtype=dt.np_dtype)
    if btree != UNDEF:
        chunks: list[tuple[tuple[int, ...], int, int, int]] = []
        _walk_chunk_btree(buf, btree, ndims, chunks)
        for offsets, mask, daddr, nbytes in chunks:
            raw = _unfilter(
                buf[daddr : daddr + nbytes], filters, mask, dt.size
            )
            tile = np.frombuffer(
                raw, dtype=dt.np_dtype, count=int(np.prod(chunk_shape))
            ).reshape(chunk_shape)
            sel = tuple(
                slice(o, o + c) for o, c in zip(offsets, chunk_shape)
            )
            canvas[sel] = tile
    return canvas[tuple(slice(0, s) for s in shape)]


def _parse_dataset(buf: bytes, name: str, addr: int) -> H5Dataset:
    msgs = _read_messages(buf, addr)
    shape: tuple[int, ...] | None = None
    dt: _Dtype | None = None
    raw: bytes | None = None
    layout_chunked: bytes | None = None
    filters: list = []
    attrs: dict = {}
    fill: bytes | None = None
    unallocated = False
    for mtype, body in msgs:
        if mtype == MSG_DATASPACE:
            shape = _parse_dataspace(body, 0)
        elif mtype == MSG_DATATYPE:
            dt = _parse_datatype(body, 0)
        elif mtype == MSG_FILTERS:
            filters = _parse_filters(body)
        elif mtype == MSG_FILL:
            fill = _parse_fill(body) or fill
        elif mtype == MSG_FILL_OLD:
            size = _u(body, 0, 4)
            if size:
                fill = bytes(body[4 : 4 + size])
        elif mtype == MSG_LAYOUT:
            version, lclass = body[0], body[1]
            if version != 3:
                raise NotImplementedError(
                    f"data layout message version {version}"
                )
            if lclass == 0:  # compact
                csize = _u(body, 2, 2)
                raw = body[4 : 4 + csize]
            elif lclass == 1:  # contiguous
                daddr, dsize = _u(body, 2, 8), _u(body, 10, 8)
                if daddr == UNDEF:
                    # storage never allocated: every element reads as the
                    # dataset fill value (libhdf5 semantics), not as a
                    # zero-length buffer that trips frombuffer downstream
                    unallocated = True
                    raw = b""
                else:
                    raw = buf[daddr : daddr + dsize]
            elif lclass == 2:  # chunked — decoded once shape/dtype known
                layout_chunked = body
            else:
                raise NotImplementedError(
                    f"data layout class {lclass} on {name!r}"
                )
        elif mtype == MSG_ATTR_INFO:
            o = 2 + (2 if body[1] & 0x01 else 0)
            if _u(body, o, 8) != UNDEF:
                raise NotImplementedError(
                    f"dense attributes on {name!r} (fractal heap)"
                )
        elif mtype == MSG_ATTRIBUTE:
            k, v = _parse_attribute(buf, body)
            attrs[k] = v
    if shape is None or dt is None or (
        raw is None and layout_chunked is None
    ):
        raise ValueError(f"dataset {name!r} missing core messages")
    if dt.cls not in (DT_FIXED, DT_FLOAT, DT_STRING):
        raise NotImplementedError(
            f"dataset {name!r} datatype class {dt.cls} (numeric/fixed-"
            "string data only)"
        )
    if layout_chunked is not None:
        arr = _read_chunked(
            buf, name, layout_chunked, shape, dt, filters, fill
        )
    elif unallocated:
        arr = np.full(shape, _fill_scalar(fill, dt), dtype=dt.np_dtype)
    else:
        n = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(raw, dtype=dt.np_dtype, count=n).reshape(shape)
    return H5Dataset(name, addr, shape, arr, attrs)


def read_hdf5(buf: bytes) -> dict[str, H5Dataset]:
    """Parse the root group's datasets from an HDF5 file in memory."""
    if buf[:8] != _SIG:
        raise ValueError(f"not an HDF5 file (magic {buf[:8]!r})")
    sb_ver = buf[8]
    if sb_ver == 0:
        if buf[13] != 8 or buf[14] != 8:
            raise NotImplementedError(
                "non-8-byte offsets/lengths in superblock"
            )
        # root symbol table entry at fixed offset 56 for v0 (8 sig + 16
        # version/K/flags fields + 32 addresses)
        root_addr = _u(buf, 56 + 8, 8)
    elif sb_ver in (2, 3):
        if buf[9] != 8 or buf[10] != 8:
            raise NotImplementedError(
                "non-8-byte offsets/lengths in superblock"
            )
        root_addr = _u(buf, 36, 8)
    else:
        raise NotImplementedError(f"superblock version {sb_ver}")
    msgs = _read_messages(buf, root_addr)
    links = _group_links(buf, msgs)
    out: dict[str, H5Dataset] = {}
    for name in sorted(links):
        child_msgs = _read_messages(buf, links[name])
        if any(
            m in (MSG_SYMBOL_TABLE, MSG_LINK, MSG_LINK_INFO)
            for m, _ in child_msgs
        ):
            raise NotImplementedError(
                f"nested group {name!r} — flat NetCDF-4 layouts only"
            )
        out[name] = _parse_dataset(buf, name, links[name])
    return out


# --------------------------------------------------------------------------
# NetCDF-4 adapter: HDF5 datasets -> the read_netcdf3 dict contract
# --------------------------------------------------------------------------


def read_netcdf4(buf: bytes) -> dict:
    """Parse a (flat-group) NetCDF-4 file into the same dict
    read_netcdf3 returns, so sources/loaders._classic_to_frame works on
    both formats. Dimension mapping follows the public netCDF-4 /
    HDF5-dimension-scales convention: datasets with CLASS =
    'DIMENSION_SCALE' define the dims; data variables name their axes
    through DIMENSION_LIST (vlen object-reference) attributes."""
    dsets = read_hdf5(buf)
    addr_to_name = {d.addr: name for name, d in dsets.items()}
    scales = {
        name: d
        for name, d in dsets.items()
        if d.attrs.get("CLASS") == "DIMENSION_SCALE"
    }
    dims = {name: (d.shape[0] if d.shape else 1) for name, d in scales.items()}
    hidden = {"CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST",
              "_Netcdf4Dimid", "_Netcdf4Coordinates", "_NCProperties"}
    nc_vars: dict[str, NcVar] = {}
    for name, d in dsets.items():
        attrs = {k: v for k, v in d.attrs.items() if k not in hidden}
        if name in scales:
            # phantom dims (netCDF dims without a coordinate variable)
            # carry the "This is a netCDF dimension but not a netCDF
            # variable" NAME marker — they are not variables
            marker = d.attrs.get("NAME", "")
            if isinstance(marker, str) and marker.startswith(
                "This is a netCDF dimension"
            ):
                continue
            nc_vars[name] = NcVar(name, (name,), d.data, attrs)
            continue
        dim_list = d.attrs.get("DIMENSION_LIST")
        if dim_list is None:
            raise NotImplementedError(
                f"variable {name!r} has no DIMENSION_LIST — not a "
                "netCDF-4 dimension-scales file"
            )
        var_dims = []
        for refs in dim_list:
            ref = refs[0] if isinstance(refs, list) else refs
            dim_name = addr_to_name.get(ref)
            if dim_name is None:
                raise ValueError(
                    f"DIMENSION_LIST of {name!r} references an unknown "
                    "object"
                )
            var_dims.append(dim_name)
        nc_vars[name] = NcVar(name, tuple(var_dims), d.data, attrs)
    return {
        "dims": dims,
        "record_dim": None,
        "numrecs": 0,
        "gattrs": {},
        "vars": nc_vars,
    }


# --------------------------------------------------------------------------
# writer (fixture generator): old-style HDF5 with netCDF-4 dim scales
# --------------------------------------------------------------------------


def _dt_message(dtype: np.dtype) -> bytes:
    """v1 datatype message body for fixed/float/fixed-string numpy dtypes
    (little-endian)."""
    if dtype.kind in ("i", "u"):
        b0 = 0x08 if dtype.kind == "i" else 0x00
        return struct.pack(
            "<BBBBIHH", 0x10 | DT_FIXED, b0, 0, 0, dtype.itemsize,
            0, dtype.itemsize * 8,
        )
    if dtype.kind == "f":
        # IEEE little-endian: mantissa-normalization 2, sign bit at MSB
        if dtype.itemsize == 4:
            eloc, esz, mloc, msz, bias = 23, 8, 0, 23, 127
        else:
            eloc, esz, mloc, msz, bias = 52, 11, 0, 52, 1023
        b0 = 0x20  # mantissa normalization: MSB set, not stored
        sign_loc = dtype.itemsize * 8 - 1
        return struct.pack(
            "<BBBBIHHBBBBI", 0x10 | DT_FLOAT, b0, sign_loc, 0,
            dtype.itemsize, 0, dtype.itemsize * 8,
            eloc, esz, mloc, msz, bias,
        )
    if dtype.kind == "S":
        return struct.pack(
            "<BBBBI", 0x10 | DT_STRING, 0, 0, 0, dtype.itemsize
        )
    raise NotImplementedError(f"writer datatype {dtype}")


_DT_REF = struct.pack("<BBBBI", 0x10 | DT_REFERENCE, 0, 0, 0, 8)
_DT_VLEN_REF = (
    struct.pack("<BBBBI", 0x10 | DT_VLEN, 0, 0, 0, 16) + _DT_REF
)


def _ds_message(shape: tuple[int, ...]) -> bytes:
    return (
        struct.pack("<BBBBI", 1, len(shape), 0, 0, 0)
        + b"".join(struct.pack("<Q", s) for s in shape)
    )


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _attr_message(name: str, dt_msg: bytes, shape: tuple, data: bytes) -> bytes:
    nm = name.encode() + b"\x00"
    ds_msg = _ds_message(shape) if shape else struct.pack(
        "<BBBBI", 1, 0, 0, 0, 0
    )
    return (
        struct.pack("<BBHHH", 1, 0, len(nm), len(dt_msg), len(ds_msg))
        + _pad8(nm) + _pad8(dt_msg) + _pad8(ds_msg) + data
    )


def _str_attr(name: str, value: str) -> bytes:
    raw = value.encode() + b"\x00"
    return _attr_message(name, _dt_message(np.dtype(f"S{len(raw)}")), (), raw)


def write_netcdf4(
    dims: dict[str, int],
    variables: list[NcVar],
    chunked: dict | None = None,
) -> bytes:
    """Minimal NetCDF-4 (HDF5) file: superblock v0, one flat root group
    (symbol-table encoding), little-endian data, dimension-scale
    attributes, and DIMENSION_LIST vlen references through a real global
    heap. Mirrors write_netcdf3's signature (dims sizes may be None ->
    taken from the coordinate variable).

    `chunked` opts a variable into the CHUNKED layout with the standard
    netCDF-4 compression stack: {name: {"chunks": (c0, ...),
    "shuffle": bool, "deflate": bool, "fletcher32": bool}} — full-size
    fill-padded edge chunks indexed by a v1 B-tree; fletcher32 checksum
    first (libnetcdf's pipeline order), then shuffle (byte transpose),
    then zlib per chunk — exactly what `nc_def_var_deflate` +
    `nc_def_var_fletcher32` produce."""
    var_by_name = {v.name: v for v in variables}
    dim_sizes: dict[str, int] = {}
    for dn, size in dims.items():
        if size is None:
            size = len(np.asarray(var_by_name[dn].data))
        dim_sizes[dn] = int(size)
    names = sorted(var_by_name)
    if len(names) > 8:
        raise NotImplementedError("fixture writer: one SNOD, <=8 datasets")

    # ---- plan the layout back-to-front so addresses are known ----------
    # [superblock 96] [root ohdr 40] [heap hdr 32 + heap data]
    # [btree 48] [snod 8+40*n] [per-dataset: data block, then ohdr]
    # [gcol global heap]
    root_ohdr = 96
    heap_hdr = root_ohdr + 40
    heap_data = heap_hdr + 32
    name_offs: dict[str, int] = {}
    off = 8  # offset 0 holds the empty string (B-tree smallest key)
    for n in names:
        name_offs[n] = off
        off += (len(n.encode()) + 1 + 7) & ~7
    heap_size = max(off, 8)
    btree = heap_data + heap_size
    snod = btree + 24 + 2 * 16  # header + (key,child,key)
    snod_size = 8 + 40 * len(names)
    cur = snod + snod_size

    chunked = chunked or {}
    data_addr: dict[str, int] = {}
    arrays: dict[str, np.ndarray] = {}
    chunk_plan: dict[str, dict] = {}  # name -> btree addr/bytes, dims, ...
    blocks: list[tuple[int, bytes]] = []  # (addr, raw) chunk payloads
    for n in names:
        a = np.asarray(var_by_name[n].data)
        a = a.astype(a.dtype.newbyteorder("<")) if a.dtype.kind in "iuf" else a
        arrays[n] = a
        if n in chunked:
            spec = chunked[n]
            cshape = tuple(int(c) for c in spec["chunks"])
            if len(cshape) != a.ndim:
                raise ValueError(f"chunk rank mismatch for {n!r}")
            esize = a.dtype.itemsize
            grid = [range(0, s, c) for s, c in zip(a.shape, cshape)]
            entries: list[tuple[tuple[int, ...], int, int]] = []
            import itertools

            for origin in itertools.product(*grid):
                pad = np.zeros(cshape, dtype=a.dtype)
                sel = tuple(
                    slice(o, min(o + c, s))
                    for o, c, s in zip(origin, cshape, a.shape)
                )
                dst = tuple(
                    slice(0, min(o + c, s) - o)
                    for o, c, s in zip(origin, cshape, a.shape)
                )
                pad[dst] = a[sel]
                raw = pad.tobytes()
                # pipeline order mirrors libnetcdf: fletcher32 first
                # (checksums the raw chunk), then shuffle, then deflate
                if spec.get("fletcher32"):
                    raw = raw + struct.pack("<I", fletcher32(raw))
                if spec.get("shuffle"):
                    main = (len(raw) // esize) * esize
                    raw = (
                        np.frombuffer(raw[:main], np.uint8)
                        .reshape(main // esize, esize)
                        .T.tobytes()
                        + raw[main:]
                    )
                if spec.get("deflate", True):
                    import zlib

                    raw = zlib.compress(raw)
                blocks.append((cur, raw))
                entries.append((origin, cur, len(raw)))
                cur += len(raw)
                cur += -cur % 8
            # one level-0 v1 B-tree node indexes every chunk
            nd = a.ndim + 1
            node = bytearray()
            node += b"TREE" + struct.pack("<BBHQQ", 1, 0, len(entries),
                                          UNDEF, UNDEF)
            for origin, addr, nbytes in entries:
                node += struct.pack("<II", nbytes, 0)
                node += b"".join(struct.pack("<Q", o) for o in origin)
                node += struct.pack("<QQ", 0, addr)
            # trailing bound key: the grid end
            node += struct.pack("<II", 0, 0)
            node += b"".join(
                struct.pack("<Q", -(-s // c) * c)
                for s, c in zip(a.shape, cshape)
            )
            node += struct.pack("<Q", 0)
            blocks.append((cur, bytes(node)))
            filters = []
            if spec.get("fletcher32"):
                filters.append((FILT_FLETCHER32, ()))
            if spec.get("shuffle"):
                filters.append((FILT_SHUFFLE, (esize,)))
            if spec.get("deflate", True):
                filters.append((FILT_DEFLATE, (6,)))
            chunk_plan[n] = {
                "btree": cur,
                "cdims": cshape + (esize,),
                "filters": filters,
                "nd": nd,
            }
            cur += len(node)
            cur += -cur % 8
        else:
            data_addr[n] = cur
            cur += a.nbytes
            cur += -cur % 8

    # global heap objects for DIMENSION_LIST refs get assigned as object
    # headers are built; collect (addresses) lazily
    gheap_objects: list[bytes] = []

    def _gheap_add(payload: bytes) -> int:
        gheap_objects.append(payload)
        return len(gheap_objects)  # 1-based heap object index

    # object headers are built AFTER data/gcol addresses are fixed, but
    # DIMENSION_LIST payloads need the gcol address — reserve it by
    # first sizing all headers with a dry run, which is circular. Break
    # the cycle the simple way: place the gcol FIRST, before the object
    # headers, sized from the known ref counts.
    gcol_addr = cur
    n_gobjs = sum(
        len(var_by_name[n].dims)
        for n in names
        if not (
            len(var_by_name[n].dims) == 1 and var_by_name[n].dims[0] == n
        )
        and var_by_name[n].dims
    )
    gcol_size = 16 + n_gobjs * (16 + 8) + 16  # header + objs + free obj
    cur = gcol_addr + gcol_size

    ohdr_addr: dict[str, int] = {}
    ohdrs: dict[str, bytes] = {}

    def _v1_header(msgs: list[tuple[int, bytes]]) -> bytes:
        body = b""
        for mtype, mbody in msgs:
            mbody = _pad8(mbody)
            body += struct.pack("<HHBBBB", mtype, len(mbody), 0, 0, 0, 0)
            body += mbody
        return (
            struct.pack("<BBHII", 1, 0, len(msgs), 1, len(body))
            + b"\x00" * 4
            + body
        )

    # first pass: assign object header addresses (headers are built in
    # the second pass once every dataset's address is known for refs)
    plans: dict[str, list[tuple[int, bytes]]] = {}
    for n in names:
        v = var_by_name[n]
        a = arrays[n]
        if n in chunk_plan:
            cp = chunk_plan[n]
            layout = (
                struct.pack("<BBB", 3, 2, cp["nd"])
                + struct.pack("<Q", cp["btree"])
                + b"".join(struct.pack("<I", c) for c in cp["cdims"])
            )
        else:
            layout = struct.pack("<BBQQ", 3, 1, data_addr[n], a.nbytes)
        msgs: list[tuple[int, bytes]] = [
            (MSG_DATASPACE, _ds_message(a.shape)),
            (MSG_DATATYPE, _dt_message(a.dtype)),
            (MSG_LAYOUT, layout),
        ]
        if n in chunk_plan and chunk_plan[n]["filters"]:
            filts = chunk_plan[n]["filters"]
            fbody = struct.pack("<BB6x", 1, len(filts))
            for fid, cvals in filts:
                fbody += struct.pack("<HHHH", fid, 0, 0, len(cvals))
                fbody += b"".join(struct.pack("<I", c) for c in cvals)
                if len(cvals) % 2:
                    fbody += b"\x00" * 4  # v1 pads client data to 8
            msgs.append((MSG_FILTERS, fbody))
        is_scale = len(v.dims) == 1 and v.dims[0] == n
        if is_scale:
            msgs.append((MSG_ATTRIBUTE, _str_attr("CLASS", "DIMENSION_SCALE")))
            msgs.append((MSG_ATTRIBUTE, _str_attr("NAME", n)))
        for k, val in v.attrs.items():
            if isinstance(val, str):
                msgs.append((MSG_ATTRIBUTE, _str_attr(k, val)))
            else:
                arr = np.atleast_1d(np.asarray(val))
                arr = arr.astype(arr.dtype.newbyteorder("<"))
                msgs.append(
                    (
                        MSG_ATTRIBUTE,
                        _attr_message(
                            k, _dt_message(arr.dtype), arr.shape,
                            arr.tobytes(),
                        ),
                    )
                )
        plans[n] = msgs

    # second pass: DIMENSION_LIST attributes (need every ohdr address →
    # compute addresses first from sizes without the attr, then rebuild
    # with it — attr size is fixed, so include a placeholder now)
    for n in names:
        v = var_by_name[n]
        is_scale = len(v.dims) == 1 and v.dims[0] == n
        if v.dims and not is_scale:
            rank = len(v.dims)
            placeholder = b"\x00" * (rank * 16)
            plans[n].append(
                (
                    MSG_ATTRIBUTE,
                    _attr_message(
                        "DIMENSION_LIST", _DT_VLEN_REF, (rank,), placeholder
                    ),
                )
            )
    for n in names:
        ohdr_addr[n] = cur
        cur += len(_v1_header(plans[n]))
        cur += -cur % 8

    # now real DIMENSION_LIST payloads (scale ohdr addresses known)
    for n in names:
        v = var_by_name[n]
        is_scale = len(v.dims) == 1 and v.dims[0] == n
        if not v.dims or is_scale:
            continue
        payload = b""
        for dn in v.dims:
            if dn not in ohdr_addr:
                raise ValueError(
                    f"variable {n!r} references undeclared dim {dn!r}"
                )
            idx = _gheap_add(struct.pack("<Q", ohdr_addr[dn]))
            payload += struct.pack("<IQI", 1, gcol_addr, idx)
        plans[n][-1] = (
            MSG_ATTRIBUTE,
            _attr_message(
                "DIMENSION_LIST", _DT_VLEN_REF, (len(v.dims),), payload
            ),
        )
    for n in names:
        ohdrs[n] = _v1_header(plans[n])

    # ---- emit ------------------------------------------------------------
    eof = cur
    out = bytearray(eof)
    out[0:8] = _SIG
    struct.pack_into(
        "<8B2H I", out, 8, 0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0
    )
    struct.pack_into("<QQQQ", out, 24, 0, UNDEF, eof, UNDEF)
    # root symbol table entry: name offset 0, root object header, no cache
    struct.pack_into("<QQII16x", out, 56, 0, root_ohdr, 0, 0)

    root = _v1_header(
        [(MSG_SYMBOL_TABLE, struct.pack("<QQ", btree, heap_hdr))]
    )
    out[root_ohdr : root_ohdr + len(root)] = root

    out[heap_hdr : heap_hdr + 4] = b"HEAP"
    struct.pack_into("<QQQ", out, heap_hdr + 8, heap_size, 0, heap_data)
    for n in names:
        nm = n.encode() + b"\x00"
        out[heap_data + name_offs[n] : heap_data + name_offs[n] + len(nm)] = nm

    out[btree : btree + 4] = b"TREE"
    struct.pack_into("<BBHQQ", out, btree + 4, 0, 0, 1, UNDEF, UNDEF)
    struct.pack_into(
        "<QQQ", out, btree + 24, 0, snod, name_offs[names[-1]]
    )

    out[snod : snod + 4] = b"SNOD"
    struct.pack_into("<BBH", out, snod + 4, 1, 0, len(names))
    for i, n in enumerate(names):
        struct.pack_into(
            "<QQII16x", out, snod + 8 + 40 * i,
            name_offs[n], ohdr_addr[n], 0, 0,
        )

    for n in names:
        a = arrays[n]
        if n in data_addr:
            out[data_addr[n] : data_addr[n] + a.nbytes] = a.tobytes()
        out[ohdr_addr[n] : ohdr_addr[n] + len(ohdrs[n])] = ohdrs[n]
    for addr, raw in blocks:  # chunk payloads + chunk B-tree nodes
        out[addr : addr + len(raw)] = raw

    out[gcol_addr : gcol_addr + 4] = b"GCOL"
    out[gcol_addr + 4] = 1
    struct.pack_into("<Q", out, gcol_addr + 8, gcol_size)
    go = gcol_addr + 16
    for i, payload in enumerate(gheap_objects, start=1):
        struct.pack_into("<HHIQ", out, go, i, 1, 0, len(payload))
        out[go + 16 : go + 16 + len(payload)] = payload
        go += 16 + ((len(payload) + 7) & ~7)
    # free-space object (index 0) fills the remainder of the collection
    struct.pack_into("<HHIQ", out, go, 0, 0, 0, gcol_addr + gcol_size - go)

    return bytes(out)
