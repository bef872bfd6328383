"""geetiles_spark.plans"""
