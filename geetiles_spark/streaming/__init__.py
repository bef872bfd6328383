"""geetiles_spark.streaming"""
