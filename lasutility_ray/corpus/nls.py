"""NLS topographic-db class-code -> raster-value mappings.

Data tables reproduced from the reference spec
``LasUtility/Nls/TopographicDb.cs:18-104`` (public NLS Maastotieto-
kanta feature codes) plus the point-cloud classification values of
``Nls/PointCloud05p.cs``. Also the filename prefix conventions used
for deterministic burn ordering (``TopographicDb.cs:11-16``).
"""

MAP_TILE_EDGE_M = 12000  # TopographicDb.cs:9

PREFIX_TERRAIN = "m_"
PREFIX_BUILDINGS = "r_"
PREFIX_ROADS = "l_"
POSTFIX_POLYGON = "_p"
POSTFIX_LINE = "_v"

WATER_LINE = {36311: 50, 36312: 51}

ROAD_LINE = {
    12111: 70, 12112: 72, 12121: 74, 12122: 76, 12131: 78, 12132: 80,
    12141: 82, 12313: 88, 12314: 86, 12316: 84,
}

BUILDING_POLYGON = {
    42210: 100, 42211: 101, 42212: 102, 42220: 103, 42221: 104,
    42222: 105, 42230: 106, 42231: 107, 42232: 108, 42240: 109,
    42241: 110, 42242: 111, 42270: 112, 42250: 113, 42251: 114,
    42252: 115, 42260: 116, 42261: 117, 42262: 118,
}

WATER_POLYGON = {36200: 130, 36211: 131}

SWAMP_POLYGON = {35411: 135, 35412: 136, 35421: 137, 35422: 138}

FIELD_POLYGON = {32611: 140, 32612: 141, 32800: 142}

ROCK_POLYGON = {34700: 145, 34100: 146, 32500: 147, 32111: 148}

ROCK_LINE = {34400: 150, 34500: 151, 34800: 152}

SAND_POLYGON = {34300: 160, 32112: 161}

ALL_CLASS_MAPS = {}
for _m in (WATER_LINE, ROAD_LINE, BUILDING_POLYGON, WATER_POLYGON,
           SWAMP_POLYGON, FIELD_POLYGON, ROCK_POLYGON, ROCK_LINE,
           SAND_POLYGON):
    ALL_CLASS_MAPS.update(_m)

# point cloud classifications (PointCloud05p.cs); Ground = 2
POINT_CLASSES = (1, 2, 3, 4, 5, 7, 12, 15, 16, 17)


def add_rasterized_classes(base: dict | None, *maps: dict) -> dict:
    """AddRasterizedClassesWithRasterValues (Shapefile/Rasteriser.cs:
    43-49): union class->value dicts into a new registration (later
    maps win on key conflicts, dict.update semantics)."""
    out = dict(base or {})
    for m in maps:
        out.update(m)
    return out


def remove_rasterized_classes(base: dict, *maps: dict) -> dict:
    """RemoveRasterizedClasses (Rasteriser.cs:51-56): subtract the
    keys of the given dicts from a registration."""
    out = dict(base)
    for m in maps:
        for k in m:
            out.pop(k, None)
    return out
