"""geetiles_spark.sources"""
