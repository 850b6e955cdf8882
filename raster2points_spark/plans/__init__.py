"""raster2points_spark.plans"""
