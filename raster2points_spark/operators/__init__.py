"""raster2points_spark.operators"""
