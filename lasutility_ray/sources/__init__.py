"""Ray-layer sources/sinks for the reference's file formats."""

from .ascii_tiles import (  # noqa: F401
    read_ascii_tiles,
    read_png_tiles,
    write_burned_tiles_ascii,
    write_burned_tiles_png,
    write_dem_tiles_ascii,
)
from .laz import read_laz_dataset, read_laz_points  # noqa: F401
from .shapefile import (  # noqa: F401
    rasterise_shapefiles,
    read_shapefile,
)
