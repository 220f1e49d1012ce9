"""Spark-side pipeline stages (DataFrame-first; UDFs only for the kernel)."""
