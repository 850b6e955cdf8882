"""raster2points_spark.sources"""
