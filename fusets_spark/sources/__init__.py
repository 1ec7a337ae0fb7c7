from .loaders import (  # noqa: F401
    load_netcdf_dir,
    load_points_csv,
    load_sits_geotiff,
    load_sits_netcdf,
    merge_cubes,
    wide_to_long,
)
