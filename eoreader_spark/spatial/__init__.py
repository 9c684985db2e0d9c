from eoreader_spark.spatial.pip import (  # noqa: F401
    parse_wkt_polygon,
    points_in_polygon,
    polygon_bbox,
)
