"""geetiles_spark.operators"""
