"""raster2points_spark.functions"""
