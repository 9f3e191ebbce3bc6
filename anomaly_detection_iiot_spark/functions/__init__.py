"""Scalar/vector function surface that goes beyond builtin
pyspark.sql.functions: Arrow-batched pandas UDFs for the kernels
Catalyst cannot express (FFT — SURVEY §2.7 M7)."""
