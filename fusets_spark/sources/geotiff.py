"""Dependency-free baseline (Geo)TIFF reader/writer.

The reference's `load_sits_geotiff` (sits_bridge.py:148-199) stacks
per-date GeoTIFF rasters into a `(t, y, x)` cube via rioxarray; this
container has no raster libraries. BASELINE TIFF — uncompressed,
strip-organized, chunky planar layout — is a small public format
(header + IFD tag directory + raw strips) that numpy parses directly,
the same approach as the BMP pixel decoder (`operators/multimodal.py`)
and the classic-netCDF parser (`sources/netcdf3.py`). Real byte-level
decoding with an explicit gate for compressed/tiled variants.

Supported: II and MM byte orders, multi-IFD (multi-page) files, u8/u16/
u32/i8/i16/i32/f32/f64 samples, multi-sample chunky pixels, multi-strip
data, DEFLATE-compressed strips (Compression 8 "Adobe deflate" and the
legacy 32946 code; zlib is stdlib) with horizontal differencing
(Predictor 2) on integer samples, and the GeoTIFF georeferencing tags
(ModelPixelScale 33550, ModelTiepoint 33922, GDAL nodata 42113) → an
affine geotransform.
Gated (clear NotImplementedError): other compressions (LZW/JPEG/
PackBits/ZSTD…), the floating-point Predictor 3, tiled layout, and
planar configuration 2.

Scale path: `sources.loaders.load_sits_geotiff` explodes raster pixels
to long rows ON EXECUTORS (binaryFile + mapInPandas), one granule per
task — the reference's "raster pixel -> row explosion" recast.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d"}

T_WIDTH, T_HEIGHT, T_BITS, T_COMPRESSION = 256, 257, 258, 259
T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_PLANAR, T_SAMPLE_FORMAT = 284, 339
T_PREDICTOR = 317
T_PIXEL_SCALE, T_TIEPOINT, T_NODATA = 33550, 33922, 42113

_DEFLATE_CODES = (8, 32946)  # Adobe deflate + the legacy COMPRESSION_DEFLATE


@dataclass
class TiffPage:
    width: int
    height: int
    data: np.ndarray  # (height, width) or (height, width, samples)
    pixel_scale: tuple | None = None  # (sx, sy, sz)
    tiepoint: tuple | None = None  # (i, j, k, x, y, z)
    nodata: float | None = None
    tags: dict = field(default_factory=dict)

    def geotransform(self) -> tuple | None:
        """(origin_x, px_w, 0, origin_y, 0, -px_h) for the raster-space
        (0,0) anchor — GDAL's convention; None when ungeoreferenced."""
        if self.pixel_scale is None or self.tiepoint is None:
            return None
        i, j, _k, x, y, _z = self.tiepoint
        sx, sy, _sz = self.pixel_scale
        return (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)


def _read_tag_values(buf, bo, ttype, count, value_field):
    size = _TYPE_SIZES.get(ttype, 1) * count
    raw = value_field[:size] if size <= 4 else None
    if raw is None:
        (off,) = struct.unpack(bo + "I", value_field)
        raw = buf[off : off + size]
    if ttype == 2:  # ASCII, NUL-terminated
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if ttype not in _TYPE_FMT and ttype not in (5, 10):
        # UNDEFINED(7) and any exotic type: keep the raw bytes — real
        # files carry e.g. ICC profiles (34675, type 7) that must not
        # crash the tag walk
        return raw
    if ttype in (5, 10):  # RATIONAL: pairs of (u32|i32)
        f = "I" if ttype == 5 else "i"
        vals = struct.unpack(bo + f * (2 * count), raw)
        return tuple(vals[2 * i] / (vals[2 * i + 1] or 1)
                     for i in range(count))
    vals = struct.unpack(bo + _TYPE_FMT[ttype] * count, raw)
    return vals if count > 1 else vals[0]


def read_tiff(buf: bytes) -> list[TiffPage]:
    """Parse every IFD (page) of a baseline TIFF held in memory."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"not a TIFF (byte-order mark {buf[:2]!r})")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    if magic != 42:
        raise NotImplementedError(
            f"TIFF magic {magic} (BigTIFF and variants unsupported)"
        )
    (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    pages: list[TiffPage] = []
    seen_offsets: set[int] = set()
    while ifd_off:
        if ifd_off in seen_offsets:
            raise ValueError("circular IFD chain (corrupt TIFF)")
        seen_offsets.add(ifd_off)
        (n_tags,) = struct.unpack_from(bo + "H", buf, ifd_off)
        tags: dict = {}
        for i in range(n_tags):
            ent = ifd_off + 2 + 12 * i
            tag, ttype = struct.unpack_from(bo + "HH", buf, ent)
            (count,) = struct.unpack_from(bo + "I", buf, ent + 4)
            tags[tag] = _read_tag_values(
                buf, bo, ttype, count, buf[ent + 8 : ent + 12]
            )
        (ifd_off,) = struct.unpack_from(bo + "I", buf, ifd_off + 2 + 12 * n_tags)

        compression = int(tags.get(T_COMPRESSION, 1))
        if compression != 1 and compression not in _DEFLATE_CODES:
            raise NotImplementedError(
                f"TIFF compression {compression} — only baseline "
                "uncompressed and DEFLATE (8/32946) rasters decode "
                "without raster libraries (convert with "
                "`gdal_translate -co COMPRESS=DEFLATE` offline)"
            )
        if 322 in tags or 323 in tags:  # TileWidth/TileLength
            raise NotImplementedError("tiled TIFF layout unsupported")
        if tags.get(T_PLANAR, 1) != 1:
            raise NotImplementedError("planar configuration 2 unsupported")

        w, h = int(tags[T_WIDTH]), int(tags[T_HEIGHT])
        spp = int(tags.get(T_SPP, 1))
        bits = tags.get(T_BITS, 8)
        bits = bits[0] if isinstance(bits, tuple) else bits
        fmt = tags.get(T_SAMPLE_FORMAT, 1)
        fmt = fmt[0] if isinstance(fmt, tuple) else fmt
        kind = {1: "u", 2: "i", 3: "f"}.get(int(fmt))
        if kind is None or (kind == "f" and bits not in (32, 64)) or (
            kind != "f" and bits not in (8, 16, 32)
        ):
            raise NotImplementedError(
                f"sample format {fmt} / {bits} bits unsupported"
            )
        dtype = np.dtype(f"{bo}{kind}{bits // 8}")

        offs = tags[T_STRIP_OFFSETS]
        cnts = tags[T_STRIP_COUNTS]
        offs = offs if isinstance(offs, tuple) else (offs,)
        cnts = cnts if isinstance(cnts, tuple) else (cnts,)
        if compression in _DEFLATE_CODES:
            import zlib

            # strips are independently deflated zlib streams
            raw = b"".join(
                zlib.decompress(buf[o : o + c])
                for o, c in zip(offs, cnts)
            )
        else:
            raw = b"".join(buf[o : o + c] for o, c in zip(offs, cnts))
        data = np.frombuffer(raw, dtype=dtype, count=h * w * spp)
        data = data.reshape((h, w) if spp == 1 else (h, w, spp))

        predictor = int(tags.get(T_PREDICTOR, 1))
        if predictor == 2:
            # horizontal differencing: stored[x] = cur[x] - cur[x-1]
            # (mod 2^bits) per row and sample channel; reconstruction is
            # a wrapping cumulative sum over the width axis on the
            # UNSIGNED view of the decoded samples (the spec defines the
            # difference on the sample's bit pattern)
            if kind == "f":
                raise NotImplementedError(
                    "TIFF Predictor 3 (floating point) unsupported"
                )
            u = np.dtype(f"u{bits // 8}")
            acc = np.add.accumulate(
                data.astype(data.dtype.newbyteorder("=")).view(u),
                axis=1,
                dtype=u,
            )
            data = acc.view(f"{kind}{bits // 8}")
        elif predictor == 3:
            raise NotImplementedError(
                "TIFF Predictor 3 (floating point) unsupported"
            )

        nodata = tags.get(T_NODATA)
        pages.append(
            TiffPage(
                width=w,
                height=h,
                data=data,
                pixel_scale=tags.get(T_PIXEL_SCALE),
                tiepoint=tags.get(T_TIEPOINT),
                nodata=float(nodata) if nodata is not None else None,
                tags=tags,
            )
        )
    return pages


def write_tiff(
    data: np.ndarray,
    pixel_scale: tuple | None = None,
    tiepoint: tuple | None = None,
    nodata: float | None = None,
    compress: str | None = None,
    predictor: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Minimal single-page little-endian TIFF — fixture generator for
    tests and offline conversion checks. compress='deflate' produces
    Compression=8 strips (independent zlib streams, `rows_per_strip`
    rows each); predictor=2 applies horizontal differencing on integer
    samples before compression (the layout GDAL's
    `-co COMPRESS=DEFLATE -co PREDICTOR=2` emits)."""
    data = np.asarray(data)
    if data.ndim == 2:
        h, w = data.shape
        spp = 1
    else:
        h, w, spp = data.shape
    kind = data.dtype.kind
    fmt = {"u": 1, "i": 2, "f": 3}[kind]
    bits = data.dtype.itemsize * 8
    if compress not in (None, "deflate"):
        raise NotImplementedError(f"write compression {compress!r}")
    if predictor not in (1, 2):
        raise NotImplementedError(f"write predictor {predictor}")
    native = data.astype(f"<{kind}{data.dtype.itemsize}")
    if predictor == 2:
        if kind == "f":
            raise NotImplementedError(
                "Predictor 2 is integer-only (3 would be the float one)"
            )
        u = np.dtype(f"<u{data.dtype.itemsize}")
        uv = native.view(u)
        diff = uv.copy()
        if data.ndim == 2:
            diff[:, 1:] = uv[:, 1:] - uv[:, :-1]
        else:
            diff[:, 1:, :] = uv[:, 1:, :] - uv[:, :-1, :]
        native = diff.view(native.dtype)
    rps = h if rows_per_strip is None else max(1, int(rows_per_strip))
    strips: list[bytes] = []
    for r0 in range(0, h, rps):
        chunk = native[r0 : r0 + rps].tobytes()
        if compress == "deflate":
            import zlib

            chunk = zlib.compress(chunk)
        strips.append(chunk)
    pix = b"".join(strips)

    strip_off = 8
    strip_offs = []
    o = strip_off
    for s in strips:
        strip_offs.append(o)
        o += len(s)
    ext: list[bytes] = []
    ext_off = strip_off + len(pix) + (len(pix) & 1)

    def ext_values(fmt_char: str, vals) -> int:
        nonlocal ext_off
        raw = struct.pack("<" + fmt_char * len(vals), *vals)
        ext.append(raw)
        off = ext_off
        ext_off += len(raw) + (len(raw) & 1)
        return off

    entries: list[tuple[int, int, int, bytes]] = []

    def tag(tagno, ttype, vals, fmt_char):
        size = _TYPE_SIZES[ttype] * len(vals)
        if size <= 4:
            field_ = struct.pack("<" + fmt_char * len(vals), *vals)
            field_ += b"\x00" * (4 - len(field_))
        else:
            field_ = struct.pack("<I", ext_values(fmt_char, vals))
        entries.append((tagno, ttype, len(vals), field_))

    tag(T_WIDTH, 4, [w], "I")
    tag(T_HEIGHT, 4, [h], "I")
    tag(T_BITS, 3, [bits] * spp, "H")
    tag(T_COMPRESSION, 3, [8 if compress == "deflate" else 1], "H")
    tag(262, 3, [1], "H")  # BlackIsZero
    tag(T_STRIP_OFFSETS, 4, strip_offs, "I")
    tag(T_SPP, 3, [spp], "H")
    tag(T_ROWS_PER_STRIP, 4, [rps], "I")
    tag(T_STRIP_COUNTS, 4, [len(s) for s in strips], "I")
    tag(T_PLANAR, 3, [1], "H")
    tag(T_SAMPLE_FORMAT, 3, [fmt] * spp, "H")
    if predictor == 2:
        tag(T_PREDICTOR, 3, [2], "H")
    if pixel_scale is not None:
        tag(T_PIXEL_SCALE, 12, list(pixel_scale), "d")
    if tiepoint is not None:
        tag(T_TIEPOINT, 12, list(tiepoint), "d")
    if nodata is not None:
        s = f"{nodata:g}".encode() + b"\x00"
        size = len(s)
        if size <= 4:
            field_ = s + b"\x00" * (4 - size)
            entries.append((T_NODATA, 2, size, field_))
        else:
            entries.append(
                (T_NODATA, 2, size,
                 struct.pack("<I", ext_values("B", list(s))))
            )

    entries.sort(key=lambda e: e[0])  # spec: ascending tag order
    ifd_off = ext_off
    out = [struct.pack("<2sHI", b"II", 42, ifd_off)]
    out.append(pix + b"\x00" * (len(pix) & 1))
    for raw in ext:
        out.append(raw + b"\x00" * (len(raw) & 1))
    out.append(struct.pack("<H", len(entries)))
    for tagno, ttype, count, field_ in entries:
        out.append(struct.pack("<HHI", tagno, ttype, count) + field_)
    out.append(struct.pack("<I", 0))  # no next IFD
    return b"".join(out)
