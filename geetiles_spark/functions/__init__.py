"""geetiles_spark.functions"""
