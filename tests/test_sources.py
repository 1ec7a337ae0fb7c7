"""Sources: CSV point-series loader, wide->long melt, cube merge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fusets_spark.sources import (
    load_points_csv,
    load_sits_netcdf,
    merge_cubes,
    wide_to_long,
)


def test_load_points_csv(spark, tmp_path):
    ts = pd.date_range("2022-01-01", periods=10, freq="5D")
    pdf = pd.DataFrame(
        {
            "Index": ts.strftime("%Y-%m-%d"),
            "plot": ["p1"] * 5 + ["p2"] * 5,
            "ndvi": np.linspace(0.1, 0.9, 10),
            "evi": np.linspace(0.2, 0.8, 10),
            "note": ["x"] * 10,  # non-numeric -> ignored
        }
    )
    path = str(tmp_path / "sits.csv")
    pdf.to_csv(path, index=False)
    got = load_points_csv(
        spark, path, time_col="Index", series_cols=["plot"]
    ).toPandas()
    assert set(got["source"].unique()) == {"ndvi", "evi"}
    assert set(got["doc_id"].unique()) == {"p1", "p2"}
    assert len(got) == 20
    g = got[(got["source"] == "ndvi") & (got["doc_id"] == "p1")].sort_values("ts")
    np.testing.assert_allclose(g["value"].to_numpy(), np.linspace(0.1, 0.9, 10)[:5])


def test_wide_to_long_roundtrip(spark):
    pdf = pd.DataFrame(
        {"k": [1, 2], "b1": [1.0, 2.0], "b2": [3.0, 4.0], "txt": ["a", "b"]}
    )
    got = wide_to_long(spark.createDataFrame(pdf), ["k"]).toPandas()
    assert len(got) == 4
    assert set(got["band"]) == {"b1", "b2"}


def test_merge_cubes_union_and_outer(spark):
    t = pd.date_range("2022-01-01", periods=4, freq="D")
    a = pd.DataFrame({"source": "vv", "doc_id": "d", "ts": t[:3], "value": [1.0, 2, 3]})
    b = pd.DataFrame({"source": "vh", "doc_id": "d", "ts": t[1:], "value": [9.0, 8, 7]})
    fa, fb = spark.createDataFrame(a), spark.createDataFrame(b)
    u = merge_cubes(fa, fb).toPandas()
    assert len(u) == 6
    w = merge_cubes(fa, fb, how="outer").toPandas().sort_values("ts")
    # union of time grids with NULLs where a band lacks data
    assert len(w) == 4
    assert w["vv"].isna().sum() == 1 and w["vh"].isna().sum() == 1


def test_netcdf_gated(spark, tmp_path):
    """Round 6 narrowed the NetCDF-4 gate: simple (contiguous,
    uncompressed) HDF5 containers now PARSE through the loader; only
    chunked/compressed layouts remain gated — and the gate must still
    fire from the loader with a clear message."""
    import numpy as np

    from fusets_spark.sources.hdf5 import write_netcdf4
    from fusets_spark.sources.netcdf3 import NcVar

    buf = write_netcdf4(
        {"time": None},
        [
            NcVar("time", ("time",), np.arange(3, dtype=np.int32),
                  {"units": "days since 2024-01-01"}),
            NcVar("value", ("time",), np.array([1.0, 2.0, 3.0])),
        ],
    )
    p = tmp_path / "v4.nc"
    p.write_bytes(buf)
    out = load_sits_netcdf(spark, str(p)).toPandas()
    assert sorted(out["value"]) == [1.0, 2.0, 3.0]
    # exotic layouts stay gated: flip the contiguous layout message's
    # class byte to an unknown class
    marker = b"\x08\x00\x18\x00\x00\x00\x00\x00\x03\x01"
    weird = bytearray(buf)
    pos = weird.index(marker)
    weird[pos + 9] = 4
    p2 = tmp_path / "v4_weird.nc"
    p2.write_bytes(bytes(weird))
    with pytest.raises(NotImplementedError, match="layout class"):
        load_sits_netcdf(spark, str(p2))


# --- netCDF3 classic (dependency-free parser, sources/netcdf3.py) ----------

def _handcrafted_classic_bytes():
    """A tiny CDF-1 file built field-by-field from the PUBLIC classic
    format spec with raw struct.pack — INDEPENDENT of the module's writer,
    so reader and writer are both pinned to the spec rather than merely to
    each other. Layout: record dim time(0), fixed dim x(2); one record
    variable v(time, x) of NC_DOUBLE; numrecs=2; data [[1,2],[3,4]]."""
    import struct

    h = b"CDF\x01"
    h += struct.pack(">I", 2)  # numrecs
    h += struct.pack(">ii", 0x0A, 2)  # NC_DIMENSION, 2 dims
    h += struct.pack(">i", 4) + b"time" + struct.pack(">i", 0)
    h += struct.pack(">i", 1) + b"x\x00\x00\x00" + struct.pack(">i", 2)
    h += struct.pack(">ii", 0, 0)  # no global attrs
    h += struct.pack(">ii", 0x0B, 1)  # NC_VARIABLE, 1 var
    h += struct.pack(">i", 1) + b"v\x00\x00\x00"  # name
    h += struct.pack(">i", 2)  # ndims
    h += struct.pack(">ii", 0, 1)  # dimids: time, x
    h += struct.pack(">ii", 0, 0)  # no var attrs
    h += struct.pack(">i", 6)  # NC_DOUBLE
    h += struct.pack(">i", 16)  # vsize: 2 doubles/record
    begin = len(h) + 4  # begin field itself is 4 bytes in CDF-1
    h += struct.pack(">I", begin)
    h += struct.pack(">4d", 1.0, 2.0, 3.0, 4.0)
    return h


def test_netcdf3_reader_matches_spec_golden():
    import numpy as np

    from fusets_spark.sources.netcdf3 import read_netcdf3

    d = read_netcdf3(_handcrafted_classic_bytes())
    assert d["dims"] == {"time": 0, "x": 2}
    assert d["record_dim"] == "time" and d["numrecs"] == 2
    v = d["vars"]["v"]
    assert v.dims == ("time", "x")
    np.testing.assert_array_equal(v.data, [[1.0, 2.0], [3.0, 4.0]])


def test_netcdf3_writer_matches_spec_golden():
    import numpy as np

    from fusets_spark.sources.netcdf3 import NcVar, write_netcdf3

    got = write_netcdf3(
        {"time": None, "x": 2},
        [NcVar("v", ("time", "x"),
               np.array([[1.0, 2.0], [3.0, 4.0]], dtype=">f8"))],
    )
    assert got == _handcrafted_classic_bytes()


def test_netcdf3_roundtrip_variants():
    import numpy as np

    from fusets_spark.sources.netcdf3 import (
        NcVar,
        read_netcdf3,
        write_netcdf3,
    )

    dims = {"time": None, "series": 3}
    cube = [
        NcVar("time", ("time",), np.arange(4, dtype=">i4"),
              {"units": "days since 2024-01-01"}),
        NcVar("ndvi", ("time", "series"),
              (np.arange(12, dtype=">f8") / 8).reshape(4, 3),
              {"scale_factor": 2.0}),
        NcVar("sid", ("series",), np.array([7, 8, 9], dtype=">i4")),
    ]
    for version in (1, 2):
        d = read_netcdf3(
            write_netcdf3(dims, cube, {"title": "t", "n": 5},
                          version=version)
        )
        assert d["numrecs"] == 4
        assert d["gattrs"] == {"title": "t", "n": 5}
        np.testing.assert_array_equal(
            d["vars"]["ndvi"].data, (np.arange(12) / 8).reshape(4, 3)
        )
        assert d["vars"]["ndvi"].attrs["scale_factor"] == 2.0
        np.testing.assert_array_equal(d["vars"]["sid"].data, [7, 8, 9])
    # single sub-4-byte record variable: the spec's no-padding exception
    d = read_netcdf3(
        write_netcdf3({"t": None},
                      [NcVar("b", ("t",), np.arange(5, dtype=">i2"))])
    )
    np.testing.assert_array_equal(d["vars"]["b"].data, np.arange(5))


def test_netcdf3_hdf5_gated():
    import pytest as _pytest

    from fusets_spark.sources.netcdf3 import read_netcdf3

    with _pytest.raises(NotImplementedError, match="HDF5"):
        read_netcdf3(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)


def test_load_sits_netcdf_classic(spark, tmp_path):
    """End-to-end: write a classic SITS cube, load through the Spark
    loader (no xarray in this container -> the numpy parser path), and
    check the long frame: CF time decoded, dims crossed, values exact."""
    import numpy as np
    import pandas as pd

    from fusets_spark.sources.loaders import load_sits_netcdf
    from fusets_spark.sources.netcdf3 import NcVar, write_netcdf3

    vals = (np.arange(12, dtype=">f8") / 4).reshape(4, 3)
    buf = write_netcdf3(
        {"time": None, "series": 3},
        [
            NcVar("time", ("time",), np.arange(4, dtype=">i4"),
                  {"units": "days since 2024-01-01"}),
            NcVar("series", ("series",), np.array([10, 20, 30], dtype=">i4")),
            NcVar("ndvi", ("time", "series"), vals),
        ],
    )
    p = tmp_path / "cube.nc"
    p.write_bytes(buf)
    got = (
        load_sits_netcdf(spark, str(p))
        .toPandas()
        .sort_values(["time", "series"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["time", "series", "ndvi"]
    assert got["time"].iloc[0] == pd.Timestamp("2024-01-01")
    assert got["time"].iloc[-1] == pd.Timestamp("2024-01-04")
    assert got["series"].tolist() == [10, 20, 30] * 4
    np.testing.assert_array_equal(got["ndvi"].to_numpy(), vals.ravel())


def test_load_netcdf_dir_distributed(spark, tmp_path):
    """Directory ingest: each classic file parses on an executor via
    binaryFile + mapInPandas; rows carry src_file lineage and concatenate
    across files."""
    import numpy as np

    from fusets_spark.sources.loaders import load_netcdf_dir
    from fusets_spark.sources.netcdf3 import NcVar, write_netcdf3

    for k in range(3):
        buf = write_netcdf3(
            {"time": None, "series": 2},
            [
                NcVar("time", ("time",), np.arange(2, dtype=">i4"),
                      {"units": "hours since 2024-01-01"}),
                NcVar("ndvi", ("time", "series"),
                      np.full((2, 2), float(k), dtype=">f8")),
            ],
        )
        (tmp_path / f"granule-{k}.nc").write_bytes(buf)
    got = load_netcdf_dir(spark, str(tmp_path)).toPandas()
    assert len(got) == 3 * 2 * 2
    assert got["src_file"].nunique() == 3
    assert sorted(got["ndvi"].unique()) == [0.0, 1.0, 2.0]


# --- baseline GeoTIFF (dependency-free parser, sources/geotiff.py) ---------

def _handcrafted_tiff_bytes():
    """A minimal little-endian baseline TIFF built field-by-field from the
    public TIFF 6.0 spec with raw struct.pack — independent of the
    module's writer. 2x2 uint8 raster [[1,2],[3,4]], one strip at offset
    8, IFD at offset 12."""
    import struct

    h = b"II" + struct.pack("<HI", 42, 12)
    h += bytes([1, 2, 3, 4])  # pixel strip at offset 8

    def entry(tag, ttype, count, value_bytes):
        return struct.pack("<HHI", tag, ttype, count) + value_bytes

    ifd = struct.pack("<H", 6)
    ifd += entry(256, 4, 1, struct.pack("<I", 2))  # width
    ifd += entry(257, 4, 1, struct.pack("<I", 2))  # height
    ifd += entry(258, 3, 1, struct.pack("<HH", 8, 0))  # bits
    ifd += entry(259, 3, 1, struct.pack("<HH", 1, 0))  # uncompressed
    ifd += entry(273, 4, 1, struct.pack("<I", 8))  # strip offset
    ifd += entry(279, 4, 1, struct.pack("<I", 4))  # strip bytes
    ifd += struct.pack("<I", 0)  # no next IFD
    return h + ifd


def test_geotiff_reader_matches_spec_golden():
    import numpy as np

    from fusets_spark.sources.geotiff import read_tiff

    pages = read_tiff(_handcrafted_tiff_bytes())
    assert len(pages) == 1
    p = pages[0]
    assert (p.width, p.height) == (2, 2)
    np.testing.assert_array_equal(np.asarray(p.data), [[1, 2], [3, 4]])
    assert p.geotransform() is None and p.nodata is None


def test_geotiff_roundtrip_variants():
    import numpy as np

    from fusets_spark.sources.geotiff import read_tiff, write_tiff

    rng = np.random.default_rng(1)
    for arr in (
        (np.arange(12, dtype=np.float32) / 2).reshape(3, 4),
        (np.arange(6, dtype=np.uint16) * 999).reshape(2, 3),
        np.arange(-6, 6, dtype=np.int16).reshape(2, 3, 2),
        rng.normal(size=(5, 7)),
    ):
        p = read_tiff(write_tiff(arr))[0]
        np.testing.assert_array_equal(np.asarray(p.data), arr)
    # georeferencing tags -> GDAL-convention geotransform + nodata
    p = read_tiff(
        write_tiff(
            np.ones((2, 2), dtype=np.float32),
            pixel_scale=(10.0, 10.0, 0.0),
            tiepoint=(0, 0, 0, 500000.0, 4600000.0, 0.0),
            nodata=-9999,
        )
    )[0]
    assert p.geotransform() == (500000.0, 10.0, 0.0, 4600000.0, 0.0, -10.0)
    assert p.nodata == -9999.0


def test_geotiff_compressed_gated():
    import struct

    import pytest as _pytest

    from fusets_spark.sources.geotiff import read_tiff

    buf = bytearray(_handcrafted_tiff_bytes())
    # flip the Compression entry (tag 259, 4th entry) to 7 (JPEG —
    # DEFLATE/LZW/PackBits are supported now, JPEG keeps the gate)
    off = 12 + 2 + 3 * 12 + 8
    buf[off : off + 2] = struct.pack("<H", 7)
    with _pytest.raises(NotImplementedError, match="compression"):
        read_tiff(bytes(buf))


def test_load_sits_geotiff_file_per_date(spark, tmp_path):
    """The reference's GeoTIFF stack: sorted files pair with sorted time
    coords; pixels explode to rows on executors with cell-center map
    coordinates and nodata masked to NULL."""
    import numpy as np

    from fusets_spark.sources.geotiff import write_tiff
    from fusets_spark.sources.loaders import load_sits_geotiff

    for k in range(3):
        arr = np.full((2, 3), float(k), dtype=np.float32)
        arr[0, 0] = -9999.0  # nodata pixel
        (tmp_path / f"date-{k}.tif").write_bytes(
            write_tiff(
                arr,
                pixel_scale=(10.0, 10.0, 0.0),
                tiepoint=(0, 0, 0, 100.0, 900.0, 0.0),
                nodata=-9999,
            )
        )
    times = ["2024-01-01", "2024-01-06", "2024-01-11"]
    got = (
        load_sits_geotiff(spark, str(tmp_path), times)
        .toPandas()
        .sort_values(["ts", "y", "x"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert len(got) == 3 * 6
    assert sorted(got["ts"].unique()) == [
        np.datetime64(t) for t in times
    ]
    # cell centers of a 10m grid anchored at (100, 900)
    assert sorted(got["x"].unique()) == [105.0, 115.0, 125.0]
    assert sorted(got["y"].unique()) == [885.0, 895.0]
    # one masked pixel per date
    assert int(got["value"].isna().sum()) == 3
    d0 = got[(got["ts"] == np.datetime64("2024-01-06"))
             & got["value"].notna()]
    assert set(d0["value"]) == {1.0}


def test_geotiff_deflate_roundtrip_multistrip():
    """DEFLATE strips (Compression=8) decode without raster libraries:
    multi-strip float32 raster, independent zlib streams per strip."""
    import numpy as np

    from fusets_spark.sources.geotiff import read_tiff, write_tiff

    rng = np.random.default_rng(7)
    arr = rng.normal(size=(9, 5)).astype(np.float32)
    buf = write_tiff(arr, compress="deflate", rows_per_strip=4)
    assert len(read_tiff.__doc__) > 0
    p = read_tiff(buf)[0]
    np.testing.assert_array_equal(np.asarray(p.data), arr)


def test_geotiff_deflate_predictor2_roundtrip():
    """Horizontal differencing (Predictor=2) on integer samples — the
    GDAL `-co COMPRESS=DEFLATE -co PREDICTOR=2` layout — reconstructs
    exactly, including wraparound at the dtype boundary and multi-sample
    pixels."""
    import numpy as np

    from fusets_spark.sources.geotiff import read_tiff, write_tiff

    # u16 with wraparound-inducing jumps
    arr = np.array(
        [[0, 65535, 1, 40000], [7, 7, 7, 65534]], dtype=np.uint16
    )
    p = read_tiff(
        write_tiff(arr, compress="deflate", predictor=2, rows_per_strip=1)
    )[0]
    np.testing.assert_array_equal(np.asarray(p.data), arr)
    # signed 16-bit, negative values
    arr_i = np.array([[-5, 100, -30000], [32767, -32768, 0]], dtype=np.int16)
    p = read_tiff(write_tiff(arr_i, compress="deflate", predictor=2))[0]
    np.testing.assert_array_equal(np.asarray(p.data), arr_i)
    # multi-sample chunky pixels: predictor differences per channel
    arr_m = np.arange(2 * 3 * 2, dtype=np.uint8).reshape(2, 3, 2) * 7
    p = read_tiff(write_tiff(arr_m, compress="deflate", predictor=2))[0]
    np.testing.assert_array_equal(np.asarray(p.data), arr_m)


def test_geotiff_deflate_predictor_golden_bytes():
    """Spec-golden: the stored first strip of a predictor-2 deflate file
    must inflate to the horizontally-differenced byte layout (not the
    raw samples) — pins the writer against self-consistent-but-wrong
    encode/decode pairs."""
    import struct
    import zlib

    import numpy as np

    from fusets_spark.sources.geotiff import write_tiff

    arr = np.array([[10, 13, 11]], dtype=np.uint8)
    buf = write_tiff(arr, compress="deflate", predictor=2)
    # single strip at offset 8; find its byte count from the IFD (tag 279)
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n_tags,) = struct.unpack_from("<H", buf, ifd_off)
    cnt = None
    for i in range(n_tags):
        tagno, ttype = struct.unpack_from("<HH", buf, ifd_off + 2 + 12 * i)
        if tagno == 279:
            (cnt,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * i + 8)
    assert cnt is not None
    # 10, 13-10=3, 11-13=-2 (mod 256 = 254)
    assert zlib.decompress(buf[8 : 8 + cnt]) == bytes([10, 3, 254])


def test_geotiff_exotic_codecs_still_gated():
    """DEFLATE, LZW and PackBits joined the supported set — JPEG/ZSTD
    keep their clear gates."""
    import numpy as np
    import pytest as _pytest

    from fusets_spark.sources.geotiff import read_tiff, write_tiff

    with _pytest.raises(NotImplementedError, match="compression"):
        write_tiff(np.zeros((2, 2), np.uint8), compress="jpeg")
    # float predictor stays gated on read and write
    with _pytest.raises(NotImplementedError, match="integer-only"):
        write_tiff(
            np.zeros((2, 2), np.float32), compress="deflate", predictor=2
        )


def test_load_sits_geotiff_fractional_nodata_f32(spark, tmp_path):
    """Fractional nodata in a float32 raster must mask: the compare runs
    in the NATIVE dtype (float64(float32(-9999.9)) != -9999.9, so a
    post-cast compare would silently pass the pixel through)."""
    import numpy as np

    from fusets_spark.sources.geotiff import write_tiff
    from fusets_spark.sources.loaders import load_sits_geotiff

    arr = np.full((2, 2), 5.0, dtype=np.float32)
    arr[1, 1] = np.float32(-9999.9)
    (tmp_path / "a.tif").write_bytes(write_tiff(arr, nodata=-9999.9))
    got = load_sits_geotiff(
        spark, str(tmp_path), ["2024-01-01"]
    ).toPandas()
    assert int(got["value"].isna().sum()) == 1
    assert set(got["value"].dropna()) == {5.0}


def test_load_sits_geotiff_natural_order_pairing(spark, tmp_path):
    """date-2.tif must pair BEFORE date-10.tif (natural path order,
    positional with caller-given coords) — lexicographic order would
    silently attach the wrong dates (reference assign_coords is
    positional)."""
    import numpy as np

    from fusets_spark.sources.geotiff import write_tiff
    from fusets_spark.sources.loaders import load_sits_geotiff

    for k in (2, 10):
        (tmp_path / f"date-{k}.tif").write_bytes(
            write_tiff(np.full((1, 1), float(k), dtype=np.float32))
        )
    got = load_sits_geotiff(
        spark, str(tmp_path), ["2024-01-02", "2024-01-10"]
    ).toPandas()
    by_ts = got.set_index("ts")["value"].to_dict()
    assert by_ts[pd.Timestamp("2024-01-02")] == 2.0
    assert by_ts[pd.Timestamp("2024-01-10")] == 10.0


def test_load_sits_geotiff_band_count_mismatch(spark, tmp_path):
    """Band mode validates band count vs time coords on the driver with
    a clear error, not an executor-side IndexError / silent drop."""
    import numpy as np

    from fusets_spark.sources.geotiff import write_tiff
    from fusets_spark.sources.loaders import load_sits_geotiff

    cube = np.stack(
        [np.full((2, 2), 1.0), np.full((2, 2), 2.0)], axis=2
    ).astype(np.float32)
    (tmp_path / "stack.tif").write_bytes(write_tiff(cube))
    with pytest.raises(ValueError, match="2 bands but 3 time coords"):
        load_sits_geotiff(
            spark,
            str(tmp_path / "stack.tif"),
            ["2024-03-01", "2024-03-02", "2024-03-03"],
            time_dimension="band",
        )


def test_load_sits_geotiff_band_mode(spark, tmp_path):
    """time_dimension='band': one multi-sample file, bands = dates."""
    import numpy as np

    from fusets_spark.sources.geotiff import write_tiff
    from fusets_spark.sources.loaders import load_sits_geotiff

    cube = np.stack(
        [np.full((2, 2), 1.0), np.full((2, 2), 2.0)], axis=2
    ).astype(np.float32)
    (tmp_path / "stack.tif").write_bytes(write_tiff(cube))
    got = (
        load_sits_geotiff(
            spark,
            str(tmp_path / "stack.tif"),
            ["2024-03-01", "2024-03-02"],
            time_dimension="band",
        )
        .toPandas()
    )
    assert len(got) == 8
    by_ts = got.groupby("ts")["value"].unique().to_dict()
    assert {pd.Timestamp(k): list(v) for k, v in by_ts.items()} == {
        pd.Timestamp("2024-03-01"): [1.0],
        pd.Timestamp("2024-03-02"): [2.0],
    }


def test_cf_time_fractional_and_tiff_robustness():
    """CF float time values (days 0.5) must round to µs, not truncate;
    unknown/UNDEFINED TIFF tag types come back as raw bytes instead of
    crashing the tag walk; a circular IFD chain raises instead of
    spinning."""
    import struct

    import numpy as np
    import pytest as _pytest

    from fusets_spark.sources.geotiff import read_tiff
    from fusets_spark.sources.netcdf3 import decode_cf_time

    got = decode_cf_time(np.array([0.0, 0.5, 1.25]),
                         "days since 2024-01-01")
    assert list(got.astype("datetime64[h]").astype(str)) == [
        "2024-01-01T00", "2024-01-01T12", "2024-01-02T06",
    ]

    # append an UNDEFINED(7) tag to the golden: entry count 6 -> 7
    base = bytearray(_handcrafted_tiff_bytes())
    base[12:14] = struct.pack("<H", 7)
    extra = struct.pack("<HHI", 34675, 7, 3) + b"abc\x00"
    buf = bytes(base[:-4]) + extra + struct.pack("<I", 0)
    p = read_tiff(buf)[0]
    assert p.tags[34675] == b"abc"

    # next-IFD pointer looping back to itself
    circ = bytearray(_handcrafted_tiff_bytes())
    circ[-4:] = struct.pack("<I", 12)
    with _pytest.raises(ValueError, match="circular"):
        read_tiff(bytes(circ))


# ---------------------------------------------------------------------------
# NetCDF-4 / HDF5 (round 6: sources/hdf5.py — contiguous uncompressed)
# ---------------------------------------------------------------------------


def test_netcdf4_roundtrip_cube():
    """write_netcdf4 -> read_netcdf4 round trip: dimension scales,
    DIMENSION_LIST vlen references through a real global heap, CF units
    attr, NaN gaps, non-alphabetical dim order."""
    import numpy as np

    from fusets_spark.sources.hdf5 import read_hdf5, read_netcdf4, write_netcdf4
    from fusets_spark.sources.netcdf3 import NcVar

    time = np.arange(5, dtype=np.int32)
    series = np.array([101, 202, 303], dtype=np.int32)
    cube = np.arange(15, dtype=np.float64).reshape(5, 3) * 1.5
    cube[2, 1] = np.nan
    buf = write_netcdf4(
        {"time": None, "series": 3},
        [
            NcVar("time", ("time",), time,
                  {"units": "days since 2024-01-01"}),
            NcVar("series", ("series",), series),
            NcVar("value", ("time", "series"), cube),
        ],
    )
    parsed = read_netcdf4(buf)
    assert parsed["dims"] == {"time": 5, "series": 3}
    v = parsed["vars"]["value"]
    assert v.dims == ("time", "series")  # ref order, not name order
    np.testing.assert_array_equal(v.data, cube)
    np.testing.assert_array_equal(parsed["vars"]["time"].data, time)
    assert parsed["vars"]["time"].attrs["units"] == "days since 2024-01-01"
    # dimension scales carry the convention attrs at the HDF5 level
    raw = read_hdf5(buf)
    assert raw["series"].attrs["CLASS"] == "DIMENSION_SCALE"
    assert raw["series"].attrs["NAME"] == "series"


def test_netcdf4_superblock_spec_golden():
    """Spec-golden absolute offsets (HDF5 File Format Spec III.A, v0
    superblock): signature at 0, version byte at 8, 8-byte offsets/
    lengths at 13/14, EOF address field at 40 == file size, root symbol
    table entry's object header address at 64, and the structure
    signatures at the addresses the structures point to."""
    import struct

    import numpy as np

    from fusets_spark.sources.hdf5 import write_netcdf4
    from fusets_spark.sources.netcdf3 import NcVar

    buf = write_netcdf4(
        {"t": None},
        [
            NcVar("t", ("t",), np.arange(3, dtype=np.int32)),
            NcVar("v", ("t",), np.array([1.0, 2.0, 3.0])),
        ],
    )
    assert buf[:8] == b"\x89HDF\r\n\x1a\n"
    assert buf[8] == 0  # superblock v0
    assert buf[13] == 8 and buf[14] == 8  # offset/length widths
    (eof,) = struct.unpack_from("<Q", buf, 40)
    assert eof == len(buf)
    (root_ohdr,) = struct.unpack_from("<Q", buf, 64)
    assert root_ohdr == 96 and buf[96] == 1  # v1 object header
    # the root symbol table message points at a HEAP and a TREE
    (btree, heap) = struct.unpack_from("<QQ", buf, 96 + 16 + 8)
    assert buf[heap : heap + 4] == b"HEAP"
    assert buf[btree : btree + 4] == b"TREE"
    assert b"SNOD" in buf and b"GCOL" in buf


def test_netcdf4_gates_are_clear():
    """Unsupported-feature paths raise NAMED NotImplementedErrors (never
    garbage): superblock v1, chunked layout, bad magic."""
    import numpy as np
    import pytest as _pytest

    from fusets_spark.sources.hdf5 import read_hdf5, write_netcdf4
    from fusets_spark.sources.netcdf3 import NcVar

    buf = write_netcdf4(
        {"t": None},
        [
            NcVar("t", ("t",), np.arange(2, dtype=np.int32)),
            NcVar("v", ("t",), np.array([1.0, 2.0])),
        ],
    )
    with _pytest.raises(ValueError, match="not an HDF5 file"):
        read_hdf5(b"CDF\x01" + bytes(100))
    v1 = bytearray(buf)
    v1[8] = 1
    with _pytest.raises(NotImplementedError, match="superblock version 1"):
        read_hdf5(bytes(v1))
    # flip a contiguous layout message's class byte to an unknown
    # class; the padded v1 message is type=8, size=24, then body 03 01
    marker = b"\x08\x00\x18\x00\x00\x00\x00\x00\x03\x01"
    pos = buf.index(marker)
    weird = bytearray(buf)
    weird[pos + 9] = 4
    with _pytest.raises(NotImplementedError, match="layout class"):
        read_hdf5(bytes(weird))
    # unsupported FILTERS stay gated: write a chunked+deflate var and
    # flip the pipeline's filter id to 4 (szip)
    import struct as _struct

    from fusets_spark.sources.hdf5 import write_netcdf4 as _w

    cbuf = _w(
        {"t": None},
        [
            NcVar("t", ("t",), np.arange(6, dtype=np.int32)),
            NcVar("v", ("t",), np.arange(6) * 1.5),
        ],
        chunked={"v": {"chunks": (4,), "deflate": True}},
    )
    fmark = _struct.pack("<HHHH", 1, 0, 0, 1) + _struct.pack("<I", 6)
    fpos = cbuf.index(fmark)
    szip = bytearray(cbuf)
    szip[fpos] = 4
    with _pytest.raises(NotImplementedError, match="filter 4"):
        read_hdf5(bytes(szip))


def test_hdf5_v2_superblock_ohdr_golden():
    """Hand-crafted latest-format file (superblock v2, OHDR root group
    with a COMPACT link message, v2 dataspace, compact data layout) —
    the layout libhdf5 emits under H5F_LIBVER_LATEST. Pins the v2
    parsing paths the old-style writer never exercises."""
    import struct

    import numpy as np

    from fusets_spark.sources.hdf5 import read_hdf5

    data = np.array([7, 9], dtype="<i4")
    # dataset object header (v1) at 80
    ds_msgs = b""
    body = struct.pack("<BBBB", 2, 1, 0, 1) + struct.pack("<Q", 2)  # dataspace v2
    body += b"\x00" * (-len(body) % 8)
    ds_msgs += struct.pack("<HHBBBB", 0x0001, len(body), 0, 0, 0, 0) + body
    body = struct.pack("<BBBBIHH", 0x10, 0x08, 0, 0, 4, 0, 32)  # i4 LE signed
    body += b"\x00" * (-len(body) % 8)
    ds_msgs += struct.pack("<HHBBBB", 0x0003, len(body), 0, 0, 0, 0) + body
    body = struct.pack("<BBH", 3, 0, 8) + data.tobytes()  # compact layout
    body += b"\x00" * (-len(body) % 8)
    ds_msgs += struct.pack("<HHBBBB", 0x0008, len(body), 0, 0, 0, 0) + body
    ds_ohdr = (
        struct.pack("<BBHII", 1, 0, 3, 1, len(ds_msgs)) + b"\x00" * 4 + ds_msgs
    )

    link_body = struct.pack("<BBB", 1, 0, 3) + b"foo" + struct.pack("<Q", 80)
    msgs = struct.pack("<BHB", 0x06, len(link_body), 0) + link_body
    root = b"OHDR" + struct.pack("<BBB", 2, 0, len(msgs)) + msgs + b"\x00" * 4

    buf = bytearray(80 + len(ds_ohdr))
    buf[0:8] = b"\x89HDF\r\n\x1a\n"
    struct.pack_into("<BBBB", buf, 8, 2, 8, 8, 0)
    struct.pack_into(
        "<QQQQ", buf, 12, 0, 0xFFFFFFFFFFFFFFFF, len(buf), 48
    )
    buf[48 : 48 + len(root)] = root
    buf[80 : 80 + len(ds_ohdr)] = ds_ohdr

    out = read_hdf5(bytes(buf))
    assert list(out) == ["foo"]
    np.testing.assert_array_equal(out["foo"].data, data)


def test_load_netcdf_dir_mixed_classic_and_netcdf4(spark, tmp_path):
    """The distributed directory loader magic-dispatches per file: a
    directory holding one CLASSIC granule and one NetCDF-4 granule with
    the same cube schema parses both on executors, identical frames."""
    import numpy as np

    from fusets_spark.sources.hdf5 import write_netcdf4
    from fusets_spark.sources.loaders import load_netcdf_dir
    from fusets_spark.sources.netcdf3 import NcVar, write_netcdf3

    time = np.arange(4, dtype=np.int32)
    series = np.array([11, 22], dtype=np.int32)
    cube_a = np.arange(8, dtype=np.float64).reshape(4, 2)
    cube_b = cube_a * 10.0
    units = {"units": "days since 2024-03-01"}

    d = tmp_path / "mixed"
    d.mkdir()
    (d / "a.nc").write_bytes(
        write_netcdf3(
            {"time": None, "series": 2},
            [
                NcVar("time", ("time",), time.astype(">i4"), units),
                NcVar("series", ("series",), series.astype(">i4")),
                NcVar("value", ("time", "series"), cube_a.astype(">f8")),
            ],
        )
    )
    (d / "b.nc").write_bytes(
        write_netcdf4(
            {"time": None, "series": 2},
            [
                NcVar("time", ("time",), time, units),
                NcVar("series", ("series",), series),
                NcVar("value", ("time", "series"), cube_b),
            ],
        )
    )
    out = load_netcdf_dir(spark, str(d)).toPandas()
    assert len(out) == 16  # 4 x 2 per granule
    a = out[out["src_file"].str.endswith("a.nc")]
    b = out[out["src_file"].str.endswith("b.nc")]
    assert sorted(a["value"]) == sorted(cube_a.ravel())
    assert sorted(b["value"]) == sorted(cube_b.ravel())
    # CF time decoded identically through both parsers
    assert set(a["time"]) == set(b["time"])
    assert str(min(a["time"]))[:10] == "2024-03-01"


def test_geotiff_tiled_roundtrip():
    """TILED layout (tags 322-325): full-size zero-padded edge tiles in
    row-major order reassemble exactly — uncompressed and DEFLATE, with
    non-divisible edge tiles and multi-sample pixels."""
    import numpy as np

    from fusets_spark.sources.geotiff import read_tiff, write_tiff

    rng = np.random.default_rng(3)
    # 7x10 raster, 4x3 tiles -> 2x4 tile grid with ragged edges
    arr = (rng.integers(0, 60000, size=(7, 10))).astype(np.uint16)
    for compress in (None, "deflate"):
        p = read_tiff(write_tiff(arr, tile=(3, 4), compress=compress))[0]
        np.testing.assert_array_equal(np.asarray(p.data), arr)
    # float64 + multi-sample chunky pixels
    arr3 = rng.normal(size=(5, 6, 2))
    p = read_tiff(write_tiff(arr3, tile=(4, 2), compress="deflate"))[0]
    np.testing.assert_array_equal(np.asarray(p.data), arr3)


def test_geotiff_tiled_predictor_is_per_tile():
    """Predictor-2 differencing restarts at every TILE boundary (not per
    raster row): pinned both by a round trip and by inflating a stored
    tile directly — a reader that differenced across the assembled row
    would be self-consistent with a matching writer, so the stored
    bytes are checked against hand-computed per-tile differences."""
    import struct
    import zlib

    import numpy as np

    from fusets_spark.sources.geotiff import read_tiff, write_tiff

    arr = np.array([[10, 13, 11, 20], [7, 9, 8, 30]], dtype=np.uint8)
    buf = write_tiff(arr, tile=(2, 2), compress="deflate", predictor=2)
    p = read_tiff(buf)[0]
    np.testing.assert_array_equal(np.asarray(p.data), arr)
    # locate TileOffsets(324)/TileByteCounts(325) in the IFD
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n_tags,) = struct.unpack_from("<H", buf, ifd_off)
    tags = {}
    for i in range(n_tags):
        t, tt = struct.unpack_from("<HH", buf, ifd_off + 2 + 12 * i)
        (cnt,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * i + 4)
        tags[t] = (tt, cnt, ifd_off + 2 + 12 * i + 8)
    _, n_tiles, field = tags[324]
    assert n_tiles == 2  # 4-wide raster, 2-wide tiles, 2 rows = 1x2 grid
    (ext,) = struct.unpack_from("<I", buf, field)
    offs = struct.unpack_from("<II", buf, ext)
    _, _, cfield = tags[325]
    (cext,) = struct.unpack_from("<I", buf, cfield)
    cnts = struct.unpack_from("<II", buf, cext)
    # second tile holds cols 2-3: rows [11,20],[8,30]; per-tile
    # differencing stores [11, 9], [8, 22] — NOT a continuation of the
    # first tile's last column (13->11 would be 254-wrapped)
    tile2 = zlib.decompress(buf[offs[1] : offs[1] + cnts[1]])
    assert tile2 == bytes([11, 9, 8, 22])


def test_tiff_lzw_spec_worked_example():
    """TIFF 6.0 §13's own worked example pins the codec to the SPEC, not
    to a self-consistent encode/decode pair: input 7 7 7 8 8 7 7 6 6 must
    emit exactly the code stream Clear,7,258,8,8,258,6,6,EOI (9-bit,
    MSB-first). The expected bytes are packed here with an independent
    bit-packer."""
    from fusets_spark.sources.geotiff import lzw_decode, lzw_encode

    data = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    codes = [256, 7, 258, 8, 8, 258, 6, 6, 257]
    acc = n = 0
    expect = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        n += 9
        while n >= 8:
            expect.append((acc >> (n - 8)) & 0xFF)
            n -= 8
    if n:
        expect.append((acc << (8 - n)) & 0xFF)
    assert lzw_encode(data) == bytes(expect)
    assert lzw_decode(bytes(expect)) == data


def test_tiff_lzw_roundtrip_width_transitions():
    """Round trips across the 9->10->11->12-bit early-change boundaries
    and a table reset (>4093 entries): random-ish and repetitive data."""
    import numpy as np

    from fusets_spark.sources.geotiff import lzw_decode, lzw_encode

    rng = np.random.default_rng(11)
    cases = [
        rng.integers(0, 256, size=200_000).astype(np.uint8).tobytes(),
        (b"abcabd" * 30_000),
        bytes(range(256)) * 400,
        b"\x00" * 100_000,
        b"",
        b"\x42",
    ]
    for raw in cases:
        assert lzw_decode(lzw_encode(raw)) == raw


def test_geotiff_lzw_roundtrip():
    """Full-file LZW round trip: strips with Predictor 2 and the tiled
    layout, i16/u8 samples."""
    import numpy as np

    from fusets_spark.sources.geotiff import read_tiff, write_tiff

    rng = np.random.default_rng(5)
    arr = rng.integers(-3000, 3000, size=(11, 9)).astype(np.int16)
    p = read_tiff(
        write_tiff(arr, compress="lzw", predictor=2, rows_per_strip=4)
    )[0]
    np.testing.assert_array_equal(np.asarray(p.data), arr)
    arr8 = rng.integers(0, 255, size=(6, 8)).astype(np.uint8)
    p = read_tiff(write_tiff(arr8, compress="lzw", tile=(4, 4)))[0]
    np.testing.assert_array_equal(np.asarray(p.data), arr8)


def test_netcdf4_chunked_compressed_roundtrip():
    """CHUNKED layout with the standard netCDF-4 compression stack
    (shuffle byte-transpose + zlib per chunk, v1 chunk B-tree, full-size
    fill-padded edge chunks) — what `nc_def_var_deflate` produces, and
    what every unlimited-dimension variable uses. Value-exact through
    ragged edges, NaN gaps, shuffle on/off, and int/float dtypes."""
    import numpy as np

    from fusets_spark.sources.hdf5 import read_netcdf4, write_netcdf4
    from fusets_spark.sources.netcdf3 import NcVar

    rng = np.random.default_rng(17)
    time = np.arange(13, dtype=np.int32)
    series = np.arange(6, dtype=np.int32) + 100
    cube = rng.normal(size=(13, 6))
    cube[5, 1] = np.nan
    for spec in (
        {"chunks": (4, 4), "shuffle": True, "deflate": True},
        {"chunks": (13, 6), "deflate": True},  # single chunk
        {"chunks": (1, 6), "shuffle": True},  # shuffle only, per-row
    ):
        buf = write_netcdf4(
            {"time": None, "series": 6},
            [
                NcVar("time", ("time",), time,
                      {"units": "days since 2024-05-01"}),
                NcVar("series", ("series",), series),
                NcVar("value", ("time", "series"), cube),
            ],
            chunked={"value": dict(spec)},
        )
        parsed = read_netcdf4(buf)
        np.testing.assert_array_equal(parsed["vars"]["value"].data, cube)
        assert parsed["vars"]["time"].attrs["units"].startswith("days")
    # compression actually engages: a compressible cube shrinks the file
    flat = np.zeros((64, 64))
    small = write_netcdf4(
        {"a": 64, "b": 64},
        [NcVar("a", ("a",), np.arange(64, dtype=np.int32)),
         NcVar("b", ("b",), np.arange(64, dtype=np.int32)),
         NcVar("v", ("a", "b"), flat)],
        chunked={"v": {"chunks": (32, 32), "shuffle": True,
                       "deflate": True}},
    )
    big = write_netcdf4(
        {"a": 64, "b": 64},
        [NcVar("a", ("a",), np.arange(64, dtype=np.int32)),
         NcVar("b", ("b",), np.arange(64, dtype=np.int32)),
         NcVar("v", ("a", "b"), flat)],
    )
    assert len(small) < len(big) / 4


def test_tiff_packbits_spec_worked_example():
    """TIFF 6.0 §9's own worked example pins the codec to the SPEC:
    the 24-byte unpacked row must pack to exactly FE AA 02 80 00 2A FD
    AA 03 80 00 2A 22 F7 AA, and decode back. Also: control byte 128 is
    a no-op on decode."""
    from fusets_spark.sources.geotiff import packbits_decode, packbits_encode

    unpacked = bytes.fromhex("aaaaaa8000 2aaaaaaaaa 80002a22aa aaaaaaaaaa aaaaaaaa".replace(" ", ""))
    packed = bytes.fromhex("feaa0280002afdaa0380002a22f7aa")
    assert packbits_encode(unpacked) == packed
    assert packbits_decode(packed) == unpacked
    # 128 no-op byte interleaved anywhere decodes identically
    assert packbits_decode(b"\x80" + packed + b"\x80") == unpacked


def test_tiff_packbits_roundtrip_edge_shapes():
    """Round trips across run/literal boundaries: max-length (128) runs
    and literals, alternating bytes, empty input, single byte."""
    import numpy as np

    from fusets_spark.sources.geotiff import packbits_decode, packbits_encode

    rng = np.random.default_rng(17)
    cases = [
        b"\x07" * 300,                      # >2 max runs
        bytes(range(256)),                  # pure literal > 128
        b"ababab" * 100,                    # 2-runs stay literal
        rng.integers(0, 256, size=10_000).astype(np.uint8).tobytes(),
        b"",
        b"\x42",
        b"\x01\x01",                        # 2-run below replicate cutoff
        b"xy" + b"\x00" * 127 + b"zw",      # run bracketed by literals
    ]
    for raw in cases:
        assert packbits_decode(packbits_encode(raw)) == raw


def test_geotiff_packbits_roundtrip():
    """Full-file PackBits round trip: multi-row strips (row-scoped
    packing per spec §9), the tiled layout, and an i16 raster whose rows
    end mid-run (packing must not let runs cross row boundaries)."""
    import numpy as np

    from fusets_spark.sources.geotiff import read_tiff, write_tiff

    rng = np.random.default_rng(23)
    # long constant stretches: the shape PackBits actually compresses
    arr = np.repeat(
        rng.integers(-300, 300, size=(11, 3)), 3, axis=1
    ).astype(np.int16)
    p = read_tiff(write_tiff(arr, compress="packbits", rows_per_strip=4))[0]
    np.testing.assert_array_equal(np.asarray(p.data), arr)
    arr8 = rng.integers(0, 4, size=(6, 8)).astype(np.uint8)
    p = read_tiff(write_tiff(arr8, compress="packbits", tile=(4, 4)))[0]
    np.testing.assert_array_equal(np.asarray(p.data), arr8)
    # constant raster: every row is one full run, strips of 1 row each
    const = np.full((5, 200), 9, dtype=np.uint8)
    p = read_tiff(write_tiff(const, compress="packbits", rows_per_strip=1))[0]
    np.testing.assert_array_equal(np.asarray(p.data), const)


def test_fletcher32_matches_scalar_reference():
    """The vectorized Fletcher-32 must equal an independent per-word
    scalar transcription of HDF5's H5_checksum_fletcher32 (big-endian
    16-bit words, 360-word folding, odd-byte high-word) across fold
    boundaries and odd lengths."""
    import numpy as np

    from fusets_spark.sources.hdf5 import fletcher32

    def scalar(data: bytes) -> int:
        s1 = s2 = 0
        nw = len(data) // 2
        i = 0
        left = nw
        while left:
            t = min(left, 360)
            left -= t
            for _ in range(t):
                s1 += (data[i] << 8) | data[i + 1]
                s2 += s1
                i += 2
            s1 = (s1 & 0xFFFF) + (s1 >> 16)
            s2 = (s2 & 0xFFFF) + (s2 >> 16)
        if len(data) % 2:
            s1 += data[-1] << 8
            s2 += s1
            s1 = (s1 & 0xFFFF) + (s1 >> 16)
            s2 = (s2 & 0xFFFF) + (s2 >> 16)
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
        return (s2 << 16) | s1

    rng = np.random.default_rng(29)
    for n in (0, 1, 2, 3, 719, 720, 721, 5000):
        data = rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
        assert fletcher32(data) == scalar(data), n
    assert fletcher32(b"\xff" * 1441) == scalar(b"\xff" * 1441)


def test_netcdf4_fletcher32_roundtrip_and_corruption():
    """fletcher32-filtered chunks round trip (alone and under the full
    fletcher+shuffle+deflate stack, whose 4-byte tail makes the chunk a
    non-multiple of esize — the shuffle-remainder path), and a flipped
    payload byte raises a checksum error instead of returning garbage."""
    import numpy as np
    import pytest as _pytest

    from fusets_spark.sources.hdf5 import read_netcdf4, write_netcdf4
    from fusets_spark.sources.netcdf3 import NcVar

    time = np.arange(9, dtype=np.int32)
    cube = (np.arange(9, dtype=np.float64) * 1.5)[:, None] + np.arange(4)
    for spec in (
        {"chunks": (4, 4), "deflate": False, "fletcher32": True},
        {"chunks": (4, 4), "shuffle": True, "fletcher32": True,
         "deflate": False},
        {"chunks": (4, 4), "shuffle": True, "deflate": True,
         "fletcher32": True},
    ):
        buf = write_netcdf4(
            {"time": None, "s": 4},
            [
                NcVar("time", ("time",), time),
                NcVar("s", ("s",), np.arange(4, dtype=np.int32)),
                NcVar("value", ("time", "s"), cube),
            ],
            chunked={"value": dict(spec)},
        )
        parsed = read_netcdf4(buf)
        np.testing.assert_array_equal(parsed["vars"]["value"].data, cube)
    # corruption detection: fletcher-only file, flip one payload byte
    buf = write_netcdf4(
        {"time": None, "s": 4},
        [
            NcVar("time", ("time",), time),
            NcVar("s", ("s",), np.arange(4, dtype=np.int32)),
            NcVar("value", ("time", "s"), cube),
        ],
        chunked={"value": {"chunks": (9, 4), "deflate": False,
                           "fletcher32": True}},
    )
    needle = np.float64(1.5).tobytes()
    pos = buf.index(needle)
    bad = bytearray(buf)
    bad[pos] ^= 0xFF
    with _pytest.raises(ValueError, match="fletcher32"):
        read_netcdf4(bytes(bad))


def test_geotiff_truncated_chunks_raise_clearly():
    """A strip/tile that decodes short must raise a NAMED truncation
    error (file context included), not numpy's bare buffer ValueError."""
    import numpy as np
    import pytest as _pytest

    from fusets_spark.sources.geotiff import read_tiff, write_tiff

    arr = np.full((6, 8), 9, dtype=np.uint8)
    # constant rows pack as one replicate run each: control 0xF9
    # (257-249 = 8 bytes) + value 9. Shortening one run's count makes
    # the stream decode to fewer pixels than the raster needs — the
    # in-place corruption a real truncated/corrupt file presents.
    for kwargs in (dict(rows_per_strip=6), dict(tile=(8, 8))):
        buf = bytearray(write_tiff(arr, compress="packbits", **kwargs))
        pos = buf.index(b"\xf9\x09")
        buf[pos] = 0xFB  # run of 6, not 8
        with _pytest.raises(ValueError, match="decodes? short"):
            read_tiff(bytes(buf))


def test_hdf5_v2_filter_pipeline_predefined_layout():
    """v2 filter descriptions for predefined filters (id < 256) OMIT the
    Name Length field: flags at +2, client-value count at +4, 6-byte
    header. The old parse read the count 2 bytes too far and dropped the
    second filter of a shuffle+deflate pipeline (round-6 advisor)."""
    import struct

    from fusets_spark.sources.hdf5 import _parse_filters

    body = bytes([2, 2])  # version 2, two filters
    body += struct.pack("<HHH", 2, 0, 1) + struct.pack("<I", 8)  # shuffle
    body += struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6)  # deflate
    assert _parse_filters(body) == [(2, (8,)), (1, (6,))]

    # named (id >= 256) filters keep the Name Length field in v2
    body = bytes([2, 1])
    body += struct.pack("<HHHH", 256, 4, 0, 1) + b"myf\x00" + struct.pack("<I", 7)
    assert _parse_filters(body) == [(256, (7,))]


def test_hdf5_fill_value_message_and_sparse_canvas():
    """Fill-value messages decode, and missing chunks / unallocated
    storage read as the dataset fill value (not silent zeros)."""
    import struct

    import numpy as np

    from fusets_spark.sources.hdf5 import _Dtype, _fill_scalar, _parse_fill

    nc_fill = struct.pack("<d", 9.96920996838687e36)
    # v3, flags bit5 = fill defined
    body = bytes([3, 0x20]) + struct.pack("<I", 8) + nc_fill
    assert _parse_fill(body) == nc_fill
    # v3, no fill defined
    assert _parse_fill(bytes([3, 0x00])) is None
    # v2, defined flag + size + data
    body = bytes([2, 2, 2, 1]) + struct.pack("<I", 8) + nc_fill
    assert _parse_fill(body) == nc_fill
    # v2, defined flag clear -> no fill
    assert _parse_fill(bytes([2, 2, 2, 0])) is None
    # v1: NO defined flag — size directly at offset 3, data at 7
    body = bytes([1, 2, 2]) + struct.pack("<I", 8) + nc_fill
    assert _parse_fill(body) == nc_fill

    dt = _Dtype.__new__(_Dtype)
    dt.size = 8
    dt.np_dtype = np.dtype("<f8")
    assert _fill_scalar(nc_fill, dt) == 9.96920996838687e36
    assert _fill_scalar(None, dt) == 0.0
