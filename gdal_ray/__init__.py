"""gdal_ray — a from-scratch Ray-Data-native spatial-join + tiling engine.

Re-expresses the core vector/raster operator *semantics* of GDAL/OGR
(reference study in SURVEY.md) — point-in-polygon layer algebra
(``OGR_L_Intersection`` family, ogr/ogrlayer.cpp:5385-5629), kNN
nearest-feature lookup (``GDALGridNearestNeighbor``,
alg/gdalgrid.cpp:905-1022), coordinate reprojection
(``OGRCoordinateTransformation``, ogr/ogrct.cpp), and tile-pyramid
assignment (apps/gdalalg_raster_tile.cpp, gdal2tiles.py) — as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches.

Geometry lives as WKB bytes in Arrow ``binary`` columns (the convention
GDAL itself defines in ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:2725,
field metadata ``ARROW:extension:name=ogc.wkb``); all kernels are pure
numpy (no GEOS/PROJ/h3 native deps in this environment).
"""

__version__ = "0.1.0"
