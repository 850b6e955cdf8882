"""raster2points_spark.streaming"""
