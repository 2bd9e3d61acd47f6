"""Scalar/analysis function surface beyond pyspark.sql.functions:
text-quality heuristics, language ID, fingerprinting (SURVEY §2.11 /
driver-mandated training-data-pipeline operators).
"""
